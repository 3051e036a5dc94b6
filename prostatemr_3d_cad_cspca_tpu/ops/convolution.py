"""Convolution configuration shared by all network blocks.

The reference threads a single ``conv_params`` dict (padding='same',
orthogonal kernel init, truncated-normal bias init, L2 regularizers) through
every Conv3D/Conv3DTranspose (reference: tf2.5/scripts/model/unets/networks.py:456-460).
Here the same contract is a small dataclass:

  * initializers map 1:1 — ``jax.nn.initializers.orthogonal`` flattens all
    leading kernel dims exactly like ``tf.keras.initializers.Orthogonal``;
    ``truncated_normal`` truncates at +/-2 sigma in both frameworks.
  * L2 regularization is NOT baked into layers (a TF-ism); instead the
    coefficients live here and ``l2_penalty`` below folds the term into the
    training loss over the param pytree — same math
    (``l2 * sum(w**2)``), XLA-fusable, and zero cost at inference.
  * padding is always 'SAME' (XLA's SAME == TF's SAME for forward conv; for
    transposed conv both frameworks produce ``out = in * stride``).

TPU notes: all convs run in NDHWC; under mixed precision the params stay
fp32 and are cast at apply time (handled by the blocks, not here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


Initializer = Callable[..., Any]


@dataclasses.dataclass(frozen=True)
class ConvConfig:
    """Shared convolution hyperparameters (reference conv_params dict)."""

    kernel_init: Initializer = nn.initializers.orthogonal(scale=1.0)
    bias_init: Initializer = nn.initializers.truncated_normal(stddev=0.001)
    kernel_l2: float = 1e-4
    bias_l2: float = 1e-4
    use_bias: bool = True
    # Compute dtype for conv outputs. None => infer from inputs (fp32 default).
    dtype: Any = None
    # Param storage dtype (keep fp32 even when computing in bf16).
    param_dtype: Any = jnp.float32
    # Dispatch (1,kh,kw)-kernel 3D convs as 2D convs with depth folded into
    # batch. True folds forward + transposed convs; "forward" folds forward
    # convs only; False disables. Exact either way: same params, same math.
    # DEFAULT OFF: the standalone stem conv measured 1.66x folded
    # (docs/ROUND2_NOTES.md) but the full-model composition LOST on the
    # measured toolchain — back-to-back b64 in one process: folded 204.8 ms
    # vs unfolded 196.9 ms, and folded b120 ~340 ms vs unfolded 213.8 ms
    # (docs/ROUND3_NOTES.md post-mortem). Kept as a tested option for
    # toolchains where the 2D emitter wins.
    fold2d: Any = False
    # Decoder-stitch convs consume their skip/upsample inputs as a PART LIST
    # instead of materializing the channel concat: conv(concat(a, b), W) ==
    # conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :]), exactly in real
    # arithmetic (channel split never touches spatial padding). The model is
    # HBM-bound (docs/ROUND4_NOTES.md) and each stitch concat at stage 0 is
    # a multi-GB tensor written + re-read per consumer; splitting removes
    # that traffic. Params (one full-width 'kernel') are identical either
    # way — checkpoints, TF imports and sharding specs are unaffected.
    split_stitch: bool = True
    # Compute SAME transposed convs in subpixel form (low-res conv producing
    # prod(stride)*C_out channels + depth-to-space) instead of XLA's
    # lhs-dilated lowering. Parameter-identical either way (see
    # SubpixelConvTranspose). REJECTED as the default, 2026-08-20
    # (benchmarks/r4_subpixel_results.json): at the real convtd0 context
    # (b64 [20,80,80]x32 -> 16ch at [20,160,160] + IN) the subpixel form
    # measures 51.05 ms vs 37.07 ms for XLA's lowering — 0.73x. The
    # depth-to-space interleave (an 8-D transpose XLA materializes at full
    # resolution) costs more HBM traffic than the full-lane low-res conv
    # saves; the hypothesized C=4 half-empty-tile win does not survive the
    # extra pass. Exactness holds (bf16 maxdiff 9.5e-07 post-IN), so the
    # module remains available for layouts where the follow-on op can
    # consume phase-blocked channels without the interleave.
    subpixel: bool = False
    # Store activations crossing block boundaries in a NARROW dtype
    # (float8_e4m3fn / float8_e5m2). The value is converted straight back to
    # the compute dtype, so params, shapes and the graph are unchanged.
    # Measured per-op on this chip (benchmarks/r5_quant_results.json):
    # fp8 storage 1.45-1.53x on the traffic-bound stem conv; int8
    # (s8xs8->s32 requant) only helps compute-bound shapes (1.19x).
    # REJECTED as a headline lever, 2026-08-20 (whole-model A/B,
    # benchmarks/r5_fp8act_results.json): cfg1 b120 baseline 604.5 vol/s,
    # fp8 casts 614.3 (+1.6%, within tunnel noise), fp8 pinned-materialized
    # via optimization_barrier 580.1 (-4%). The per-op win does not compose
    # because XLA's fusion already keeps most boundary traffic INSIDE
    # fusions — the same structural verdict as the subpixel and packing
    # campaigns. Kept as a tested opt-in deployment mode (None = exact
    # bf16/fp32 behavior; fp8 rounds activations ~6% relative at e4m3 —
    # tests/test_fp8_act.py).
    act_store: Any = None

    def conv_kwargs(self):
        return dict(
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            padding="SAME",
        )


def default_conv_config(**overrides) -> ConvConfig:
    return dataclasses.replace(ConvConfig(), **overrides)


class Fold2DConv(nn.Module):
    """3D conv with a unit-depth kernel, dispatched as a 2D conv.

    XLA's TPU conv emitter tiles a Conv3D with a degenerate depth tap
    noticeably worse than the equivalent Conv2D: the round-2 probe measured
    8.5 ms vs 14.1 ms (1.66x) on the M1 stem's (1,3,3) conv at b64
    (docs/ROUND2_NOTES.md, benchmarks/r2_probe_conv.py). Folding D into the
    batch dim is mathematically identical — the depth tap is 1 and the depth
    stride is 1, so no tap ever crosses a D boundary.

    Drop-in for ``nn.Conv``: the parameter names ('kernel'/'bias'), shapes
    (the full 3D ``(1,kh,kw,Cin,Cout)`` kernel) and initializer calls are
    bit-identical to ``nn.Conv``, so checkpoints, TF imports
    (utils/tf_import.py) and sharding specs are unaffected.
    """

    features: int
    kernel_size: Any  # (1, kh, kw)
    strides: Any = (1, 1, 1)  # (1, sh, sw)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks, st = tuple(self.kernel_size), tuple(self.strides)
        assert ks[0] == 1 and st[0] == 1, (ks, st)
        B, D, H, W, C = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, ks + (C, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,), self.param_dtype)
                if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x.reshape(B * D, H, W, C), kernel[0],
            window_strides=st[1:], padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias
        return y.reshape(B, D, *y.shape[1:])


class Fold2DConvTranspose(nn.Module):
    """3D transposed conv with a unit-depth kernel, dispatched in 2D.

    Mirror of ``Fold2DConv`` for the decoder's (1,3,3)/(1,2,2) upsampling
    convs. Matches ``nn.ConvTranspose(transpose_kernel=True)`` exactly: the
    kernel is stored as ``(1,kh,kw,out,in)`` (TF Conv3DTranspose convention,
    reference-weight importable) and the op is ``lax.conv_transpose`` with
    ``transpose_kernel=True`` on the D-folded view.
    """

    features: int
    kernel_size: Any  # (1, kh, kw)
    strides: Any  # (1, sh, sw)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks, st = tuple(self.kernel_size), tuple(self.strides)
        assert ks[0] == 1 and st[0] == 1, (ks, st)
        B, D, H, W, C = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, ks + (self.features, C), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,), self.param_dtype)
                if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_transpose(
            x.reshape(B * D, H, W, C), kernel[0], st[1:], self.padding,
            transpose_kernel=True,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias
        return y.reshape(B, D, *y.shape[1:])


def _subpixel_plan(kernel_size, strides):
    """Static plan for the subpixel rewrite of a SAME transposed conv.

    ``lax.conv_transpose(SAME, transpose_kernel=True)`` correlates the
    stride-dilated input with the spatially flipped kernel at lo-padding
    ``pad_a`` (k-1 if s > k-1 else ceil((k+s-2)/2)). Output position
    p = s*q + r reads dilated position t = p - pad_a + j, which is nonzero
    only when s | t, giving input offset d = (j + r - pad_a)/s — so each
    output PHASE r is a small stride-1 conv over the low-res grid, and all
    prod(s) phases embed into ONE conv producing prod(s)*C_out channels
    followed by a depth-to-space interleave. Returns (span, pads, idx):
    ``idx[span_pos + (phase,)]`` indexes the flattened flipped kernel (or
    the all-zeros slot ``kd*kh*kw``) for a gather-built phase kernel.
    """
    import numpy as np

    ks, st = tuple(kernel_size), tuple(strides)

    def _pad_a(k, s):
        return k - 1 if s > k - 1 else -((k + s - 2) // -2)

    per_axis = []
    for k, s in zip(ks, st):
        plo = _pad_a(k, s)
        phases = []
        for r in range(s):
            taps = [((r - plo + j) // s, j) for j in range(k)
                    if (r - plo + j) % s == 0]
            phases.append(taps)
        dmin = min(d for taps in phases for d, _ in taps)
        dmax = max(d for taps in phases for d, _ in taps)
        per_axis.append((phases, dmin, dmax))
    span = tuple(dmax - dmin + 1 for _, dmin, dmax in per_axis)
    pads = tuple((-dmin, (sp - 1) + dmin)
                 for (_, dmin, _), sp in zip(per_axis, span))
    kd, kh, kw = ks
    zero_slot = kd * kh * kw
    idx = np.full(span + (st[0] * st[1] * st[2],), zero_slot, np.int32)
    (pd, dmin_d, _), (ph, dmin_h, _), (pw, dmin_w, _) = per_axis
    for rd in range(st[0]):
        for rh in range(st[1]):
            for rw in range(st[2]):
                phase = (rd * st[1] + rh) * st[2] + rw
                for dd, jd in pd[rd]:
                    for dh, jh in ph[rh]:
                        for dw, jw in pw[rw]:
                            idx[dd - dmin_d, dh - dmin_h, dw - dmin_w,
                                phase] = (jd * kh + jh) * kw + jw
    return span, pads, idx


class SubpixelConvTranspose(nn.Module):
    """SAME transposed conv computed as a low-res conv + depth-to-space.

    Exactly equal to ``nn.ConvTranspose(transpose_kernel=True)`` (tested at
    1e-5 fp32), with identical parameters — kernel stored as
    ``(kd,kh,kw,out,in)`` in the TF Conv3DTranspose convention, so
    checkpoints, TF imports and sharding specs are unaffected; the phase
    kernel is a cheap static gather of the stored kernel at apply time.

    Why: XLA lowers the decoder's stride-(1,2,2) transposed convs through
    full-resolution LOW-CHANNEL intermediates (the cfg1 trace's C=4
    bf16[120,20,160,160,4] tensors at 4x their HBM roofline — half-empty
    T(4,128) sublane tiles, docs/ATTRIBUTION.md). The subpixel form keeps
    every tensor at >=4x the channels on 4x fewer pixels: full lanes on an
    HBM-bound program (docs/ROUND4_NOTES.md).
    """

    features: int
    kernel_size: Any
    strides: Any
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks, st = tuple(self.kernel_size), tuple(self.strides)
        assert self.padding == "SAME", self.padding
        kernel = self.param(
            "kernel", self.kernel_init, ks + (self.features, x.shape[-1]),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        span, pads, idx = _subpixel_plan(ks, st)
        kd, kh, kw = ks
        c_out, c_in = kernel.shape[3:]
        wf = kernel[::-1, ::-1, ::-1].reshape(kd * kh * kw, c_out, c_in)
        wf = jnp.concatenate([wf, jnp.zeros_like(wf[:1])], axis=0)
        # (span..., s_prod, C_out, C_in) -> (span..., C_in, s_prod*C_out)
        w_sub = wf[idx].transpose(0, 1, 2, 5, 3, 4).reshape(
            span + (c_in, idx.shape[-1] * c_out))
        y = jax.lax.conv_general_dilated(
            x, w_sub, window_strides=(1, 1, 1), padding=pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        b, d, h, w = y.shape[:4]
        y = y.reshape(b, d, h, w, *st, c_out)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, d * st[0], h * st[1], w * st[2], c_out)
        if bias is not None:
            y = y + bias
        return y


class SplitInputConv(nn.Module):
    """3D conv over a LIST of channel parts, without materializing their
    concat.

    Parameter-identical to ``nn.Conv`` over the concatenated input: one
    ``kernel`` of shape ``(kd,kh,kw, sum(c_i), features)`` (same name, same
    initializer draw — the init RNG folds in only the module path and param
    name) and one ``bias``. The op is the channel-split identity
    ``conv(concat(parts), W) = sum_i conv(part_i, W[..., off_i:off_i+c_i, :])``
    — exact in real arithmetic; under fp32/bf16 accumulation the summation
    order differs from the fused conv by ~1 ulp (tested at 1e-5).

    Why: the stitch concats are the largest live tensors in the network
    (stage 0 at b120: 3.9 GB written + re-read by BOTH the bottleneck conv
    and the projection-shortcut conv) and the model is HBM-bound
    (docs/ROUND4_NOTES.md) — skipping the materialization removes that
    traffic entirely.
    """

    features: int
    kernel_size: Any
    strides: Any = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, parts) -> jax.Array:
        if not isinstance(parts, (list, tuple)):
            parts = (parts,)
        ks, st = tuple(self.kernel_size), tuple(self.strides)
        cin = sum(int(p.shape[-1]) for p in parts)
        kernel = self.param(
            "kernel", self.kernel_init, ks + (cin, self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        y = None
        off = 0
        for p in parts:
            ci = int(p.shape[-1])
            k_i = jax.lax.slice_in_dim(kernel, off, off + ci, axis=-2)
            off += ci
            p_, k_, b_ = promote_dtype(p, k_i, bias, dtype=self.dtype)
            y_i = jax.lax.conv_general_dilated(
                p_, k_, window_strides=st, padding=self.padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            y = y_i if y is None else y + y_i
        if bias is not None:
            y = y + b_
        return y


def store_act(cfg: ConvConfig, x: jax.Array) -> jax.Array:
    """Round ``x`` through ``cfg.act_store`` (fp8) so the buffer XLA
    materializes at the next fusion boundary is the narrow dtype.

    No-op when ``act_store`` is None. The back-conversion keeps every
    consumer's compute dtype unchanged; XLA fuses both converts into the
    neighbouring fusions, so the only effect is the boundary buffer's
    width (and the fp8 rounding of the value)."""
    if cfg.act_store is None:
        return x
    dt = cfg.act_store
    if isinstance(dt, str):  # checkpoint configs carry the dtype as a name
        dt = getattr(jnp, dt)
    # No optimization_barrier: pinning the fp8 value as the materialized
    # buffer was measured WORSE (580.1 vol/s vs 604.5 baseline,
    # r5_fp8act_results.json) — the barriers inhibit more fusion than the
    # narrow buffers save. The plain convert pair lets XLA choose; it
    # measured 614.3 vol/s (+1.6%, within tunnel noise).
    return x.astype(dt).astype(x.dtype)


def conv3d_parts(cfg: ConvConfig, features, kernel_size, strides=(1, 1, 1),
                 name=None):
    """Build a conv consuming a channel-part list (see SplitInputConv).

    Falls back to concat + :func:`conv3d` when ``cfg.split_stitch`` is off or
    the 2D-folded dispatch is active (the folded emitter wants one tensor);
    both paths put the parameters at the same ``name`` with the same shapes.
    """
    ks, st = tuple(kernel_size), tuple(strides)
    folded = cfg.fold2d in (True, "forward") and len(ks) == 3 \
        and ks[0] == 1 and st[0] == 1
    if cfg.split_stitch and not folded:
        return SplitInputConv(features=features, kernel_size=ks, strides=st,
                              name=name, **cfg.conv_kwargs())
    inner = conv3d(cfg, features, ks, st, name=name)

    def apply(parts):
        if isinstance(parts, (list, tuple)):
            parts = jnp.concatenate(parts, axis=-1)
        return inner(parts)

    return apply


def conv3d(cfg: ConvConfig, features, kernel_size, strides=(1, 1, 1), name=None):
    """Build a 3D conv, routing unit-depth kernels through the 2D-folded
    dispatch when ``cfg.fold2d`` is True or "forward" (see Fold2DConv)."""
    ks, st = tuple(kernel_size), tuple(strides)
    if cfg.fold2d in (True, "forward") and len(ks) == 3 \
            and ks[0] == 1 and st[0] == 1:
        return Fold2DConv(features=features, kernel_size=ks, strides=st,
                          name=name, **cfg.conv_kwargs())
    return nn.Conv(features, ks, st, name=name, **cfg.conv_kwargs())


def conv3d_transpose(cfg: ConvConfig, features, kernel_size, strides, name=None):
    """Build a 3D transposed conv in the TF Conv3DTranspose convention,
    2D-folded when the depth kernel/stride are unit and ``cfg.fold2d`` is
    True (see Fold2DConvTranspose; "forward" keeps transposed convs 3D)."""
    ks, st = tuple(kernel_size), tuple(strides)
    if cfg.fold2d is True and len(ks) == 3 and ks[0] == 1 and st[0] == 1:
        return Fold2DConvTranspose(features=features, kernel_size=ks, strides=st,
                                   name=name, **cfg.conv_kwargs())
    if cfg.subpixel:
        return SubpixelConvTranspose(features=features, kernel_size=ks,
                                     strides=st, name=name,
                                     **cfg.conv_kwargs())
    return nn.ConvTranspose(features, ks, st, transpose_kernel=True,
                            name=name, **cfg.conv_kwargs())


def l2_penalty(params, kernel_l2: float, bias_l2: float) -> jax.Array:
    """L2 regularization term over a param pytree.

    Mirrors ``tf.keras.regularizers.l2`` attached to every conv kernel/bias in
    the reference (networks.py:47-48): ``l2 * sum(w ** 2)``. Instance-norm
    scale/bias params carry no regularizer in the reference (tfa default) and
    are excluded here by name.
    """
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
        # The reference regularizes every conv EXCEPT the squeeze-excite 1x1x1
        # convs, which are built without conv_params (network_blocks.py:45-46);
        # instance-norm scale/bias are likewise unregularized (tfa defaults).
        if parent.startswith("norm") or parent.startswith("se_"):
            continue
        if name == "kernel":
            total = total + kernel_l2 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        elif name == "bias":
            total = total + bias_l2 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total
