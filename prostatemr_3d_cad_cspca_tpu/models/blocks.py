"""Network building blocks (Flax) for the M1 family.

Parity targets (reference: tf2.5/scripts/model/unets/network_blocks.py):
  * SEResNetBottleNeck   — :23-80
  * GridAttentionBlock3D — :88-130
  * MonteCarloDropout    — :137-143
  * AxisAligned3DConvGaussian (legacy single-latent prior/posterior) — :147-191
  * Conv1x1x1withLatentDist   (legacy latent head)                   — :195-240
  * StitchingProbDecoder — :244-278

All blocks are NDHWC, static-shape, rely on XLA to place convs on the MXU,
and keep fp32 parameters (bf16 compute optional via ConvConfig.dtype).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convolution import ConvConfig, conv3d, conv3d_parts, store_act
from ..ops.normalization import InstanceNorm, ShardedStats, global_spatial_mean
from ..ops.resample import upsample_nearest


def leaky_relu01(x: jax.Array) -> jax.Array:
    """LeakyReLU(alpha=0.1) — the sole activation of the reference backbone."""
    return nn.leaky_relu(x, negative_slope=0.1)


class ConfigurableDropout(nn.Module):
    """Dropout that is train-gated ('standard') or always-on ('monte-carlo').

    Monte-Carlo dropout stays active at inference for posterior sampling
    (reference: network_blocks.py:137-143; --UNET_DROPOUT_MODE default
    'monte-carlo', train_model.py:79). Needs an explicit 'dropout' PRNG
    whenever active.
    """

    rate: float
    mode: str = "standard"  # 'standard' | 'monte-carlo'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.rate == 0.0:
            return x
        deterministic = (not train) if self.mode == "standard" else False
        return nn.Dropout(rate=self.rate, deterministic=deterministic)(x)


class MonteCarloDropout(nn.Module):
    """Always-active dropout (reference: network_blocks.py:137-143)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train
        if self.rate == 0.0:
            return x
        return nn.Dropout(rate=self.rate, deterministic=False)(x)


class SEResNetBottleNeck(nn.Module):
    """SE-ResNet bottleneck (reference: network_blocks.py:23-80).

    Structure: conv(f/4, k, s) -> IN -> LReLU -> conv(f/4, 3^3) -> IN -> LReLU
    -> conv(f, 1^3) -> IN; projection shortcut (conv(f, k, s) + IN) when the
    channel count changes; squeeze-excite gate (GAP -> 1x1x1 f/r -> LReLU ->
    1x1x1 f -> sigmoid) applied multiplicatively.

    NOTE (reference quirk, SURVEY.md §2.3-3): the gated features combine with
    the shortcut by element-wise MULTIPLY — tf.math.multiply at
    network_blocks.py:77 despite the "Residual Addition" comment — followed by
    LReLU. Reproduced exactly; do not "fix" to addition.

    The SE 1x1x1 convs are built without the shared conv_params in the
    reference (network_blocks.py:45-46): glorot-uniform kernels, zero bias, no
    L2. They are named ``se_*`` here so the loss-side regularizer skips them.
    """

    filters: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    reduction: int
    conv_cfg: ConvConfig = ConvConfig()
    # Halo-sharded SPMD: exact cross-shard statistics for the INs and the SE
    # squeeze (ops.normalization.ShardedStats). None = single-device behavior.
    sharded: Optional[ShardedStats] = None

    @nn.compact
    def __call__(self, x) -> jax.Array:
        """``x``: one tensor, or a LIST of channel parts standing for their
        concat (the decoder-stitch call sites). Parts are consumed by the
        bottleneck and projection convs without materializing the concat
        (ops.convolution.SplitInputConv) — parameters are identical either
        way."""
        cfg = self.conv_cfg
        parts = tuple(x) if isinstance(x, (list, tuple)) else (x,)
        in_ch = sum(int(p.shape[-1]) for p in parts)

        def IN(name):
            return InstanceNorm(name=name, sharded=self.sharded)

        # store_act: fp8 boundary-buffer storage when cfg.act_store is set
        # (no-op by default) — casts sit on the tensors that cross fusion
        # boundaries (conv outputs pre-IN, block outputs post-combine).
        h = conv3d_parts(cfg, self.filters // 4, self.kernel_size,
                         self.strides, name="conv1")(parts)
        h = store_act(cfg, h)
        h = IN("norm1")(h)
        h = leaky_relu01(h)
        h = conv3d(cfg, self.filters // 4, (3, 3, 3), (1, 1, 1), name="conv2")(h)
        h = store_act(cfg, h)
        h = IN("norm2")(h)
        h = leaky_relu01(h)
        h = conv3d(cfg, self.filters, (1, 1, 1), (1, 1, 1), name="conv3")(h)
        h = store_act(cfg, h)
        x_ = IN("norm3")(h)

        if in_ch != self.filters:
            residual = conv3d_parts(
                cfg, self.filters, self.kernel_size, self.strides, name="conv4"
            )(parts)
            residual = store_act(cfg, residual)
            residual = IN("norm4")(residual)
        else:
            residual = parts[0] if len(parts) == 1 \
                else jnp.concatenate(parts, axis=-1)

        # Squeeze-and-excitation gate (TF-default initialized, unregularized).
        se_kwargs = dict(
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.conv_cfg.dtype,
            param_dtype=self.conv_cfg.param_dtype,
        )
        # fp32-accumulated GAP without materializing an fp32 copy
        # (cross-shard exact under spatial sharding, like the INs above)
        s = global_spatial_mean(x_, self.sharded).astype(x_.dtype)
        s = nn.Conv(self.filters // self.reduction, (1, 1, 1), **se_kwargs, name="se_conv6")(s)
        s = leaky_relu01(s)
        s = nn.Conv(self.filters, (1, 1, 1), **se_kwargs, name="se_conv7")(s)
        s = nn.sigmoid(s)
        gated = x_ * s

        # Reference quirk: multiplicative shortcut combine (network_blocks.py:77).
        out = gated * residual
        return store_act(cfg, leaky_relu01(out))


class GridAttentionBlock3D(nn.Module):
    """Grid attention gate (reference: network_blocks.py:88-130).

    theta_x = conv(k=s=sub_samp)(x); phi_g = 1x1x1 conv(gating); phi_g is
    nearest-upsampled to theta_x's grid; psi = 1x1x1 conv -> sigmoid; the
    attention map is nearest-upsampled back to x's grid and multiplies x;
    output = IN(1x1x1 conv). Returns (gated features, attention map).
    """

    inter_channels: int
    sub_samp: Tuple[int, int, int]
    conv_cfg: ConvConfig = ConvConfig()
    sharded: Optional[ShardedStats] = None

    @nn.compact
    def __call__(
        self, conv_tensor: jax.Array, gating_tensor: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.conv_cfg
        x, g = conv_tensor, gating_tensor

        theta_x = conv3d(
            cfg, self.inter_channels, self.sub_samp, self.sub_samp, name="theta"
        )(x)
        phi_g = conv3d(cfg, self.inter_channels, (1, 1, 1), (1, 1, 1), name="phi")(g)
        up1 = tuple(theta_x.shape[i + 1] // phi_g.shape[i + 1] for i in range(3))
        phi_g = upsample_nearest(phi_g, up1)

        f = leaky_relu01(theta_x + phi_g)
        psi_f = conv3d(cfg, 1, (1, 1, 1), (1, 1, 1), name="psi")(f)
        sigm_psi_f = nn.sigmoid(psi_f)
        up2 = tuple(x.shape[i + 1] // sigm_psi_f.shape[i + 1] for i in range(3))
        sigm_psi_f = upsample_nearest(sigm_psi_f, up2)

        y = sigm_psi_f * x
        w_y = conv3d(cfg, self.inter_channels, (1, 1, 1), (1, 1, 1), name="out")(y)
        w_y = InstanceNorm(name="norm_out", sharded=self.sharded)(w_y)
        return w_y, sigm_psi_f


class StitchingProbDecoder(nn.Module):
    """Final 1x1x1 logits over stitched hierarchical decoder features
    (reference: network_blocks.py:244-278)."""

    num_classes: int
    conv_cfg: ConvConfig = ConvConfig()

    @nn.compact
    def __call__(self, decoder_features: jax.Array) -> jax.Array:
        return conv3d(
            self.conv_cfg, self.num_classes, (1, 1, 1), (1, 1, 1), name="logits"
        )(decoder_features)


class AxisAligned3DConvGaussian(nn.Module):
    """Legacy single-latent Gaussian encoder (reference: network_blocks.py:147-191).

    Defined-but-unwired in the reference's main path; kept for API parity.
    Returns the flattened mu/log-sigma vector of shape (B, 2*proba_event_shape).
    """

    filters: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 2, 2))
    kernel_sizes: Tuple[Tuple[int, int, int], ...] = (
        (1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    se_reduction: Tuple[int, ...] = (8, 8, 8, 8, 8)
    proba_event_shape: int = 256
    conv_cfg: ConvConfig = ConvConfig()

    @nn.compact
    def __call__(
        self, image: jax.Array, segmentation: Optional[jax.Array] = None
    ) -> jax.Array:
        ck = self.conv_cfg.conv_kwargs()
        x = image if segmentation is None else jnp.concatenate(
            [image, segmentation.astype(image.dtype)], axis=-1
        )
        x = nn.Conv(self.filters[0], self.kernel_sizes[0], self.strides[0], **ck)(x)
        x = InstanceNorm()(x)
        x = leaky_relu01(x)
        for lvl in range(1, 5):
            x = SEResNetBottleNeck(
                filters=self.filters[lvl],
                kernel_size=tuple(self.kernel_sizes[lvl]),
                strides=tuple(self.strides[lvl]),
                reduction=self.se_reduction[lvl],
                conv_cfg=self.conv_cfg,
            )(x)
        encoding = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        mu_log_sigma = nn.Conv(
            2 * self.proba_event_shape, (1, 1, 1), (1, 1, 1), **ck
        )(encoding)
        return jnp.squeeze(mu_log_sigma, axis=(1, 2, 3))


class Conv1x1x1withLatentDist(nn.Module):
    """Legacy latent-conditioned logits head (reference: network_blocks.py:195-240)."""

    num_classes: int = 2
    num_channels: int = 256
    conv_cfg: ConvConfig = ConvConfig()

    @nn.compact
    def __call__(self, input_tensor: jax.Array) -> jax.Array:
        ck = self.conv_cfg.conv_kwargs()
        x = nn.Conv(self.num_channels // 4, (1, 3, 3), (1, 1, 1), **ck)(input_tensor)
        x = InstanceNorm()(x)
        x = leaky_relu01(x)
        x = nn.Conv(self.num_channels // 16, (1, 3, 3), (1, 1, 1), **ck)(x)
        x = InstanceNorm()(x)
        x = leaky_relu01(x)
        return nn.Conv(self.num_classes, (1, 1, 1), (1, 1, 1), **ck)(x)
