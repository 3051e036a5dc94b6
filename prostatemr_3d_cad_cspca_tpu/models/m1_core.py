"""M1Core — the (hierarchical probabilistic) attention U-Net backbone.

Parity target: class ``M1Core`` (reference:
tf2.5/scripts/model/unets/networks.py:402-782). Topology (networks.py:411-416):

    Resol. 0  (x)------------->(att_conv0)-->(deconv2_up2)-->(deconv1_up1)-->(deconv0)-->(uconv0_)-->(uconv0)-->(y__)
    Resol. 1   |---->(conv1)-->(att_conv1)-->(deconv3_up2)-->(deconv2_up1)-->(deconv1)-->(uconv1_)-->(uconv1)
    Resol. 2            |----->(conv2)------>(att_conv2)---->(deconv3_up1)-->(deconv2)-->(uconv2_)-->(uconv2)
    Resol. 3                      |--------->(conv3)-------->(att_conv3)---->(deconv3)-->(uconv3_)-->(uconv3)
    Resol. 4                                    |----------->(convm)-------------|

JAX-first re-design vs the reference:
  * One parameter pytree, many applies — the reference shares layer objects
    across its five probabilistic invocations (networks.py:348-352); here the
    backbone is split into ``trunk`` (stem/encoder/attention/nested decoder,
    expensive) and ``ladder`` (latent hierarchy, cheap) so the wrapper can run
    the trunk ONCE per network and re-run only the ladder per latent
    configuration. ``__call__`` composes both for reference-identical
    single-pass semantics.
  * Explicit PRNG streams: 'dropout' for (MC) dropout, 'latent' for
    reparameterized sampling — no global RNG.
  * Latents are exchanged as a per-level tuple (None at levels whose latent
    dim is 0). The reference indexes its injected-latent list by absolute
    level (networks.py:645,669,693,717) which silently mis-aligns when a zero
    latent dim precedes a nonzero one (SURVEY.md §2.3); per-level alignment
    fixes that while matching behavior for all shipped configs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convolution import ConvConfig, conv3d, conv3d_transpose, store_act
from ..ops.distributions import DiagGaussian
from ..ops.normalization import InstanceNorm, ShardedStats, revacuum
from ..ops.resample import upsample_nearest
from .blocks import (
    ConfigurableDropout,
    GridAttentionBlock3D,
    SEResNetBottleNeck,
    leaky_relu01,
)

Tuple3 = Tuple[int, int, int]



# ConvTranspose in the TF Conv3DTranspose convention: transpose_kernel=True
# stores the kernel as (spatial..., out, in) and computes the exact
# gradient-of-conv operation tf.keras Conv3DTranspose performs (verified
# numerically in tests/test_tf_parity.py) — making reference-trained weights
# directly importable. Unit-depth kernels dispatch 2D-folded (ops.convolution).

class M1Core(nn.Module):
    """Backbone network. See module docstring for reference citations."""

    num_classes: int = 2
    dropout_mode: str = "standard"
    dropout_rate: float = 0.50
    filters: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[Tuple3, ...] = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 2, 2))
    kernel_sizes: Tuple[Tuple3, ...] = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    se_reduction: Tuple[int, ...] = (8, 8, 8, 8, 8)
    att_sub_samp: Tuple[Tuple3, ...] = ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1))
    conv_cfg: ConvConfig = ConvConfig()
    dense_skip: bool = False
    deep_supervision: bool = False
    probabilistic: bool = False
    prob_latent_dims: Tuple[int, ...] = (1, 1, 1, 1)
    # Rematerialize each SE block during backprop (jax.checkpoint): trades
    # ~30% extra forward FLOPs for dropping the largest activation tensors —
    # the TPU-native answer to growing batch/volume beyond HBM (SURVEY §7).
    # Measured as a TRAIN-THROUGHPUT lever 2026-08-21 and REJECTED
    # (benchmarks/r5_remat_results.json): b2 bf16 train step 310.7 ms off
    # vs 342.5 ms on (-10%). The "recompute FLOPs are free at AI<<ridge"
    # argument fails because recompute is itself HBM traffic — the SE
    # block's forward re-reads its inputs and re-writes its internals, so
    # remat trades saved-activation reads for an equal-or-larger byte
    # stream. Stays a MEMORY trade only (its original purpose).
    remat: bool = False
    # Halo-sharded SPMD: exact cross-shard IN/SE statistics (see
    # ops.normalization.ShardedStats; set by parallel.halo.spatial_infer_m1).
    sharded: Optional[ShardedStats] = None

    def setup(self):
        assert len(self.filters) == 5, "Expected 5 filter counts (one per resolution)."
        assert len(self.se_reduction) == 5
        assert all(len(a) == 3 for a in self.att_sub_samp) and len(self.att_sub_samp) == 4
        assert all(len(s) == 3 for s in self.strides) and len(self.strides) == 5
        assert all(len(k) == 3 for k in self.kernel_sizes) and len(self.kernel_sizes) == 5

        cfg = self.conv_cfg
        _Conv = lambda feats, kern, strd: conv3d(cfg, feats, kern, strd)  # noqa: E731
        _ConvT = lambda feats, kern, strd: conv3d_transpose(cfg, feats, kern, strd)  # noqa: E731
        f, s, k, r = self.filters, self.strides, self.kernel_sizes, self.se_reduction

        def drop(rate):
            return ConfigurableDropout(rate=rate, mode=self.dropout_mode)

        SersCls = nn.remat(SEResNetBottleNeck) if self.remat else SEResNetBottleNeck

        def sers(filters, kernel, stride, red):
            return SersCls(
                filters=filters, kernel_size=tuple(kernel), strides=tuple(stride),
                reduction=red, conv_cfg=self.conv_cfg, sharded=self.sharded)

        # Stem (networks.py:472-474).
        self.conve0 = _Conv(f[0], k[0], s[0])
        self.norme0 = InstanceNorm(sharded=self.sharded)

        # Encoder (networks.py:476-487).
        self.serse1 = sers(f[1], k[1], s[1], r[1])
        self.serse2 = sers(f[2], k[2], s[2], r[2])
        self.serse3 = sers(f[3], k[3], s[3], r[3])
        self.serse4 = sers(f[4], k[4], s[4], r[4])
        self.drope1 = drop(self.dropout_rate)
        self.drope2 = drop(self.dropout_rate)
        self.drope3 = drop(self.dropout_rate)
        self.drope4 = drop(self.dropout_rate)

        # Attention gates (networks.py:490-493).
        self.att0 = GridAttentionBlock3D(
            f[0], tuple(self.att_sub_samp[0]), self.conv_cfg, self.sharded)
        self.att1 = GridAttentionBlock3D(
            f[1], tuple(self.att_sub_samp[1]), self.conv_cfg, self.sharded)
        self.att2 = GridAttentionBlock3D(
            f[2], tuple(self.att_sub_samp[2]), self.conv_cfg, self.sharded)
        self.att3 = GridAttentionBlock3D(
            f[3], tuple(self.att_sub_samp[3]), self.conv_cfg, self.sharded)

        # Nested decoder stage 3 (networks.py:496-502).
        self.convtd3 = _ConvT(f[3], k[4], s[4])
        self.convtd3_up1 = _ConvT(f[2], k[3], s[3])
        self.convtd3_up2 = _ConvT(f[1], k[2], s[2])
        self.convtd3_up3 = _ConvT(f[0], k[1], s[1])
        self.sersd3 = sers(f[3], k[3], (1, 1, 1), r[3])
        self.dropd3 = drop(self.dropout_rate)

        # Stage 2 (networks.py:505-510).
        self.convtd2 = _ConvT(f[2], k[3], s[3])
        self.convtd2_up1 = _ConvT(f[1], k[2], s[2])
        self.convtd2_up2 = _ConvT(f[0], k[1], s[1])
        self.sersd2 = sers(f[2], k[2], (1, 1, 1), r[2])
        self.dropd2 = drop(self.dropout_rate)

        # Stage 1 (networks.py:513-517).
        self.convtd1 = _ConvT(f[1], k[2], s[2])
        self.convtd1_up1 = _ConvT(f[0], k[1], s[1])
        self.sersd1 = sers(f[1], k[1], (1, 1, 1), r[1])
        self.dropd1 = drop(self.dropout_rate)

        # Stage 0 (networks.py:520-523).
        self.convtd0 = _ConvT(f[0], k[1], s[1])
        self.sersd0 = sers(f[0], k[0], (1, 1, 1), r[0])
        self.dropd0 = drop(self.dropout_rate / 2)

        # Logits + deep supervision heads (networks.py:526-531).
        self.logits = _Conv(self.num_classes, (1, 1, 1), (1, 1, 1))
        self.dsy1_logits = _Conv(self.num_classes, (1, 1, 1), (1, 1, 1))
        self.dsy2_logits = _Conv(self.num_classes, (1, 1, 1), (1, 1, 1))
        self.dsy3_logits = _Conv(self.num_classes, (1, 1, 1), (1, 1, 1))

        # Probabilistic ladder (networks.py:534-565). Level order: res 3,2,1,0.
        if self.probabilistic:
            dims = self.prob_latent_dims
            assert len(dims) == 4, "prob_latent_dims must have 4 entries (res 3,2,1,0)."
            fr, sr, kr, rr = f[::-1], s[::-1], k[::-1], r[::-1]
            self.mu_logsig = [
                _Conv(2 * dims[i], (1, 1, 1), (1, 1, 1)) if dims[i] != 0 else None
                for i in range(4)
            ]
            self.dec_hi = [_ConvT(fr[i + 1], kr[i], sr[i]) for i in range(4)]
            self.sersp = [sers(fr[i + 1], kr[i + 1], (1, 1, 1), rr[i + 1]) for i in range(4)]
            self.dropp = [drop(self.dropout_rate) for _ in range(4)]

    # ------------------------------------------------------------------ trunk
    def trunk(self, inputs: jax.Array, train: bool = False) -> Dict[str, Any]:
        """Stem -> encoder -> attention -> nested decoder -> logits.

        Reference: M1Core.__call__ body up to the probabilistic ladder
        (networks.py:568-630). Returns every intermediate the ladder / deep
        supervision needs. Most values are arrays, but the ``uconv{1,2,3}_``
        keys hold TUPLES of decoder-stage parts standing for the reference's
        materialized concat (consumers split their convs over the parts —
        see _split_conv_over_parts in this file).
        """
        d: Dict[str, Any] = {}
        # Under halo sharding: keep the outside-the-volume region zero after
        # ops with additive offsets (see ops.normalization.revacuum). The INs
        # already do this internally; transposed convs need it explicitly.
        # fp8 boundary-buffer storage (no-op unless conv_cfg.act_store is
        # set): transposed-conv outputs and the stem/attention tensors are
        # the full-resolution buffers that dominate the HBM stream.
        sa = lambda t: store_act(self.conv_cfg, t)  # noqa: E731
        rv = lambda t: sa(revacuum(t, self.sharded))  # noqa: E731

        x = self.conve0(inputs)
        x = sa(x)
        x = self.norme0(x)
        x = leaky_relu01(x)
        x = sa(x)
        d["x"] = x

        conv1 = self.drope1(self.serse1(x), train)
        conv2 = self.drope2(self.serse2(conv1), train)
        conv3 = self.drope3(self.serse3(conv2), train)
        convm = self.drope4(self.serse4(conv3), train)
        d.update(conv1=conv1, conv2=conv2, conv3=conv3, convm=convm)

        att_conv0, att_0 = self.att0(x, convm)
        att_conv1, att_1 = self.att1(conv1, convm)
        att_conv2, att_2 = self.att2(conv2, convm)
        att_conv3, att_3 = self.att3(conv3, convm)
        att_conv0, att_conv1, att_conv2, att_conv3 = (
            sa(att_conv0), sa(att_conv1), sa(att_conv2), sa(att_conv3))
        d.update(att_conv0=att_conv0, att_conv1=att_conv1,
                 att_conv2=att_conv2, att_conv3=att_conv3,
                 att_map0=att_0, att_map1=att_1, att_map2=att_2, att_map3=att_3)

        # Decoder stitches: each ``uconv*_`` is the reference's channel
        # concat (networks.py:592/601/611/620), carried here as a PART TUPLE
        # — the consuming SE bottleneck splits its convs over the parts
        # instead of materializing the multi-GB concat (HBM-bound model,
        # docs/ROUND4_NOTES.md; ops.convolution.SplitInputConv). Params and
        # math are the concat's.
        # Stage 3 (networks.py:590-597).
        deconv3 = rv(self.convtd3(convm))
        if self.dense_skip:
            deconv3_up1 = rv(self.convtd3_up1(deconv3))
            deconv3_up2 = rv(self.convtd3_up2(deconv3_up1))
            deconv3_up3 = rv(self.convtd3_up3(deconv3_up2))
        uconv3_ = (deconv3, att_conv3)
        uconv3 = self.dropd3(self.sersd3(uconv3_), train)

        # Stage 2 (networks.py:599-607).
        deconv2 = rv(self.convtd2(uconv3))
        if self.dense_skip:
            deconv2_up1 = rv(self.convtd2_up1(deconv2))
            deconv2_up2 = rv(self.convtd2_up2(deconv2_up1))
            uconv2_ = (deconv2, deconv3_up1, att_conv2)
        else:
            uconv2_ = (deconv2, att_conv2)
        uconv2 = self.dropd2(self.sersd2(uconv2_), train)

        # Stage 1 (networks.py:609-616).
        deconv1 = rv(self.convtd1(uconv2))
        if self.dense_skip:
            deconv1_up1 = rv(self.convtd1_up1(deconv1))
            uconv1_ = (deconv1, deconv2_up1, deconv3_up2, att_conv1)
        else:
            uconv1_ = (deconv1, att_conv1)
        uconv1 = self.dropd1(self.sersd1(uconv1_), train)

        # Stage 0 (networks.py:618-624).
        deconv0 = rv(self.convtd0(uconv1))
        if self.dense_skip:
            uconv0_ = (deconv0, deconv1_up1, deconv2_up2, deconv3_up3, att_conv0)
        else:
            uconv0_ = (deconv0, att_conv0)
        uconv0 = self.dropd0(self.sersd0(uconv0_), train)

        d.update(uconv3_=uconv3_, uconv3=uconv3, uconv2_=uconv2_, uconv2=uconv2,
                 uconv1_=uconv1_, uconv1=uconv1, uconv0_=uconv0_, uconv0=uconv0)

        # Logits + hard prediction (networks.py:626-630).
        y__ = self.logits(uconv0)
        if self.num_classes > 1:
            y_ = jnp.argmax(y__, axis=-1)
        else:
            y_ = (y__[..., 0] >= 0.5).astype(jnp.int32)
        d.update(logits=y__, y_=y_)
        return d

    # ----------------------------------------------------------------- ladder
    def ladder(
        self,
        trunk: Dict[str, Any],
        prob_mean: bool = False,
        prob_z_q: Optional[Tuple[Optional[jax.Array], ...]] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Hierarchical latent decoder (networks.py:633-734).

        Per level (res 3,2,1,0): predict a per-voxel diag-Gaussian from the
        running decoder features; choose the conditioning latent (injected >
        mean > sample); upsample [latent, features] via transposed conv;
        stitch with the trunk's pre-SE concat features; SE block + dropout.
        """
        assert self.probabilistic, "ladder requires probabilistic=True"
        dims = self.prob_latent_dims
        skip_srcs = [trunk["uconv3_"], trunk["uconv2_"], trunk["uconv1_"], trunk["uconv0_"]]

        distributions: list = []
        used_latents: list = []
        ds_ops: list = []
        features = trunk["convm"]

        for i in range(4):
            if dims[i] != 0:
                mu_logsigma = self.mu_logsig[i](features)
                mu = mu_logsigma[..., : dims[i]]
                logsigma = mu_logsigma[..., dims[i]:]
                distrib = DiagGaussian.from_mu_logsigma(mu, logsigma)
                if prob_z_q is not None and prob_z_q[i] is not None:
                    z = prob_z_q[i]
                elif prob_mean:
                    z = distrib.mean
                else:
                    z = distrib.sample(self.make_rng("latent"))
                distributions.append(distrib)
                used_latents.append(z)
                dec_in = jnp.concatenate([z.astype(features.dtype), features], axis=-1)
            else:
                distributions.append(None)
                used_latents.append(None)
                dec_in = features
            # latents carry bias/noise in the vacuum; zero before the convT
            dec_in = revacuum(dec_in, self.sharded)
            upsampled = revacuum(self.dec_hi[i](dec_in), self.sharded)
            # skip_srcs[i] is a part tuple (the trunk's pre-SE stitch);
            # extend it rather than materializing either concat
            stitched = (upsampled, *skip_srcs[i])
            features = self.dropp[i](self.sersp[i](stitched), train)
            if i < 3:
                ds_ops.append(features)

        return dict(
            prob_distributions=tuple(distributions),
            prob_used_latents=tuple(used_latents),
            prob_decoder_features=features,
            ds_ops=tuple(ds_ops),
        )

    # ------------------------------------------------------------ deep superv
    def _deep_supervision(self, srcs: Tuple[jax.Array, jax.Array, jax.Array]):
        """Upsample three decoder stages to full res + 1x1x1 logits
        (networks.py:737-747). srcs = (stage1, stage2, stage3 features)."""
        import numpy as np

        s = [np.array(t) for t in self.strides]
        y_1 = self.dsy1_logits(upsample_nearest(srcs[0], tuple(s[1])))
        y_2 = self.dsy2_logits(upsample_nearest(srcs[1], tuple(s[1] * s[2])))
        y_3 = self.dsy3_logits(upsample_nearest(srcs[2], tuple(s[1] * s[2] * s[3])))
        return y_1, y_2, y_3

    def assemble_outputs(
        self, trunk: Dict[str, Any], ladder_out: Optional[Dict[str, Any]]
    ) -> Dict[str, Any]:
        """Final output dict (networks.py:749-759)."""
        outputs: Dict[str, Any] = {}
        y__ = trunk["logits"]
        if self.deep_supervision:
            if self.probabilistic:
                assert ladder_out is not None
                ds = ladder_out["ds_ops"]
                srcs = (ds[-1], ds[-2], ds[-3])  # networks.py:745-747
            else:
                srcs = (trunk["uconv1"], trunk["uconv2"], trunk["uconv3"])
            y_1, y_2, y_3 = self._deep_supervision(srcs)
            outputs["y_softmax"] = jnp.concatenate(
                [jax.nn.softmax(t, axis=-1) for t in (y__, y_1, y_2, y_3)], axis=-1)
            outputs["y_sigmoid"] = jnp.concatenate(
                [jax.nn.sigmoid(t) for t in (y__, y_1, y_2, y_3)], axis=-1)
        else:
            outputs["y_softmax"] = jax.nn.softmax(y__, axis=-1)
            outputs["y_sigmoid"] = jax.nn.sigmoid(y__)
        outputs["logits"] = y__
        outputs["y_"] = trunk["y_"]
        if ladder_out is not None:
            outputs["prob_distributions"] = ladder_out["prob_distributions"]
            outputs["prob_used_latents"] = ladder_out["prob_used_latents"]
            outputs["prob_decoder_features"] = ladder_out["prob_decoder_features"]
        return outputs

    # ------------------------------------------------------------------ call
    def __call__(
        self,
        inputs: jax.Array,
        prob_mean: bool = False,
        prob_z_q: Optional[Tuple[Optional[jax.Array], ...]] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        """Reference-identical single pass (networks.py:568-759)."""
        trunk = self.trunk(inputs, train)
        ladder_out = (
            self.ladder(trunk, prob_mean=prob_mean, prob_z_q=prob_z_q, train=train)
            if self.probabilistic
            else None
        )
        return self.assemble_outputs(trunk, ladder_out)
