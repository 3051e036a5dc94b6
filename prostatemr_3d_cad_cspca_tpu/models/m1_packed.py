"""Packed-width fast-path forward for the deterministic M1 trunk.

WHY: M1's full-resolution stages carry 2-32 channels; on TPU (128 lanes)
the standard NDHWC execution leaves lanes idle and runs 4-7x below the HBM
roofline (measured: benchmarks/r2_probe_conv.py — lrelu on C=16 163 GB/s vs
568 GB/s packed). This module re-expresses the ENTIRE deterministic trunk
(reference semantics: networks.py:568-630) on packed tensors
(ops/packing.py): (B,D,H,W,C) -> (B,D,H,W/p,p*C) with p*C ~ 128.

It is a PURE FUNCTION over the same parameter pytree as
``models.m1_core.M1Core`` — numerically equivalent at fp32 (golden-tested in
tests/test_m1_packed.py), so reference-parity guarantees carry over. Use for
inference and any compute where exact dropout-draw reproducibility vs the
unpacked path is not required (dropout is a no-op here: inference path,
``train=False`` semantics with standard dropout).

The planner (``PackedM1``) precomputes every PackedConvSpec / pack factor
from the static geometry; ``__call__(params, x)`` is fully jittable. Conv
implementations are swappable: the default is the packed XLA conv; hot
(1,3,3) stages dispatch to the Pallas fused kernel when available (see
ops/pallas/packed_conv.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packing import (
    PackedConvSpec,
    broadcast_channel_gate,
    broadcast_width_map,
    pack_width,
    packed_instance_norm,
    packed_spatial_mean,
    repack,
    unpack_width,
    upsample_width_packed,
)

Tuple3 = Tuple[int, int, int]
LANES = 128


def _pick_pack(channels: int, width: int, min_wp: int = 16) -> int:
    """Largest p with p*channels <= LANES, p | width, width/p >= min_wp
    (second-minor tile padding guard); relaxes min_wp if nothing fits."""
    for floor in (min_wp, 8, 1):
        best = 1
        p = 1
        while p * channels <= LANES:
            if width % p == 0 and width // p >= floor and p > best:
                best = p
            p += 1
        if best > 1 or floor == 1:
            return best
    return 1


def _lrelu(x):
    return jnp.where(x >= 0, x, jnp.asarray(0.1, x.dtype) * x)


def concat_packed(parts: Sequence[jax.Array], p: int,
                  channels: Sequence[int]) -> jax.Array:
    """Channel-concat packed tensors (same p, same spatial): reshape each to
    (..., p, c), concat on c, reshape back — all fused by XLA."""
    if p == 1:
        return jnp.concatenate(parts, axis=-1)
    outs = []
    for x, c in zip(parts, channels):
        b, d, h, wp, pc = x.shape
        assert pc == p * c, (pc, p, c)
        outs.append(x.reshape(b, d, h, wp, p, c))
    y = jnp.concatenate(outs, axis=-1)
    b, d, h, wp, _, ctot = y.shape
    return y.reshape(b, d, h, wp, p * ctot)


@dataclasses.dataclass
class _ConvPlan:
    spec: PackedConvSpec
    p_in: int


class PackedM1:
    """Planner + forward for the deterministic M1 trunk on packed tensors.

    Args mirror M1Core's architecture fields (models/m1_core.py); the
    parameter pytree is M1Core's (same names: conve0, serse1..4, att0..3,
    convtd*, sersd*, logits, dsy*_logits).
    """

    def __init__(
        self,
        input_spatial_dims: Tuple3,
        input_channels: int = 3,
        num_classes: int = 2,
        filters: Tuple[int, ...] = (16, 32, 64, 128, 256),
        strides: Tuple[Tuple3, ...] = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes: Tuple[Tuple3, ...] = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction: Tuple[int, ...] = (8, 8, 8, 8, 8),
        att_sub_samp: Tuple[Tuple3, ...] = ((1, 1, 1),) * 4,
        dense_skip: bool = False,
        deep_supervision: bool = False,
        dtype: Any = None,
    ):
        assert all(tuple(a) == (1, 1, 1) for a in att_sub_samp), (
            "packed fast path supports the default att_sub_samp=(1,1,1)")
        self.num_classes = num_classes
        self.filters = tuple(filters)
        self.strides = tuple(tuple(s) for s in strides)
        self.kernels = tuple(tuple(k) for k in kernel_sizes)
        self.se_reduction = tuple(se_reduction)
        self.dense_skip = dense_skip
        self.deep_supervision = deep_supervision
        self.dtype = dtype
        self.input_channels = input_channels
        self._prepacked = None  # set per-call by __call__(packed=...)

        # per-level spatial dims (level 0..4); level l is AFTER stride l.
        dims: List[Tuple3] = []
        cur = tuple(input_spatial_dims)
        for s in self.strides:
            cur = tuple(-(-c // st) for c, st in zip(cur, s))
            dims.append(cur)
        self.level_dims = dims  # dims[l] = spatial at resolution level l

        f = self.filters
        # pack factor per (level, channels) tensor
        self._packs: Dict[Tuple[int, int], int] = {}
        self.plans: Dict[str, _ConvPlan] = {}

        # ---- stem -----------------------------------------------------------
        in_dims = tuple(input_spatial_dims)
        p_img = self.pack_of(in_dims[2], input_channels)
        self._plan("conve0", self.kernels[0], self.strides[0], in_dims,
                   input_channels, f[0], p_img)

        # ---- encoder SE blocks ----------------------------------------------
        for lvl in range(1, 5):
            self._plan_se(f"serse{lvl}", self.level_dims[lvl - 1],
                          f[lvl - 1], f[lvl], self.kernels[lvl],
                          self.strides[lvl])

        # ---- attention gates (theta/phi/psi/out; all 1x1, sub_samp 1) -------
        for i in range(4):
            d_i = self.level_dims[i]
            ci = f[i]
            p = self.pack_of(d_i[2], ci)
            self._plan(f"att{i}.theta", (1, 1, 1), (1, 1, 1), d_i, ci, ci, p)
            self._plan(f"att{i}.psi", (1, 1, 1), (1, 1, 1), d_i, ci, 1, p,
                       p_out=p)
            self._plan(f"att{i}.out", (1, 1, 1), (1, 1, 1), d_i, ci, ci, p)
            # phi runs unpacked on the tiny gating tensor (level 4)

        # ---- decoder --------------------------------------------------------
        # stage l: convtd{l} from level l+1 -> level l (transposed), then
        # sers on concat(channels).
        for l in range(3, -1, -1):
            src = self.level_dims[l + 1] if l + 1 < 5 else None
            ci = f[l + 1]
            co = f[l]
            p_in = self.pack_of(src[2], ci)
            self._plan(f"convtd{l}", self.kernels[l + 1], self.strides[l + 1],
                       src, ci, co, p_in, transposed=True)
        if dense_skip:
            for name, lsrc, ci, co, k, s in (
                ("convtd3_up1", 3, f[3], f[2], self.kernels[3], self.strides[3]),
                ("convtd3_up2", 2, f[2], f[1], self.kernels[2], self.strides[2]),
                ("convtd3_up3", 1, f[1], f[0], self.kernels[1], self.strides[1]),
                ("convtd2_up1", 2, f[2], f[1], self.kernels[2], self.strides[2]),
                ("convtd2_up2", 1, f[1], f[0], self.kernels[1], self.strides[1]),
                ("convtd1_up1", 1, f[1], f[0], self.kernels[1], self.strides[1]),
            ):
                d_i = self.level_dims[lsrc]
                self._plan(name, k, s, d_i, ci, co,
                           self.pack_of(d_i[2], ci), transposed=True)

        # decoder sers blocks (stride 1) on concatenated skips
        dec_in = {
            3: f[3] + f[3],
            2: f[2] + f[2] + (f[2] if dense_skip else 0),
            1: f[1] + f[1] + (2 * f[1] if dense_skip else 0),
            0: f[0] + f[0] + (3 * f[0] if dense_skip else 0),
        }
        for l in range(3, -1, -1):
            self._plan_se(f"sersd{l}", self.level_dims[l], dec_in[l], f[l],
                          self.kernels[l], (1, 1, 1))

        # ---- heads ----------------------------------------------------------
        d0 = self.level_dims[0]
        p0 = self.pack_of(d0[2], f[0])
        self._plan("logits", (1, 1, 1), (1, 1, 1), d0, f[0], num_classes, p0,
                   p_out=p0)
        if deep_supervision:
            for i, l in ((1, 1), (2, 2), (3, 3)):
                d_l = self.level_dims[l]
                p_l = self.pack_of(d_l[2], f[l])
                self._plan(f"dsy{i}_logits", (1, 1, 1), (1, 1, 1), d_l,
                           f[l], num_classes, p_l, p_out=p_l)

    # ------------------------------------------------------------- planning
    def pack_of(self, width: int, channels: int) -> int:
        key = (width, channels)
        if key not in self._packs:
            self._packs[key] = _pick_pack(channels, width)
        return self._packs[key]

    def _plan(self, name, kernel, strides, in_dims, ci, co, p_in,
              transposed=False, p_out=None):
        spec = PackedConvSpec(tuple(kernel), tuple(strides), tuple(in_dims),
                              ci, co, p_in, transposed=transposed, p_out=p_out)
        self.plans[name] = _ConvPlan(spec, p_in)
        return spec

    def _plan_se(self, name, in_dims, ci, co, kernel, strides):
        w_in = in_dims[2]
        p_in = self.pack_of(w_in, ci)
        s1 = self._plan(f"{name}.conv1", kernel, strides, in_dims, ci, co // 4,
                        p_in)
        mid_dims = s1.out_spatial
        p_mid = self.pack_of(mid_dims[2], co // 4)
        self._plan(f"{name}.conv2", (3, 3, 3), (1, 1, 1), mid_dims, co // 4,
                   co // 4, p_mid)
        self._plan(f"{name}.conv3", (1, 1, 1), (1, 1, 1), mid_dims, co // 4,
                   co, p_mid)
        if ci != co:
            self._plan(f"{name}.conv4", kernel, strides, in_dims, ci, co, p_in)

    # ------------------------------------------------------------- applying
    def prepare(self, params) -> Dict[str, jax.Array]:
        """Pack every planned conv's weights ONCE, outside the jitted forward.

        ``pack_weights`` is a chain of scatter (.at[].set) ops; with raw
        params as traced jit arguments that chain re-executes on device on
        every forward call (ADVICE r2). Run this eagerly (or in its own small
        jit) per parameter set and pass the result as
        ``__call__(params, x, packed=...)`` — the packed kernels then enter
        the forward as plain device arrays.
        """
        packed = {}
        for name, plan in self.plans.items():
            node = params
            for part in name.split(".")[:-1]:
                node = node[part]
            w = node[name.split(".")[-1]]["kernel"]
            if self.dtype is not None:
                w = w.astype(self.dtype)
            packed[name] = plan.spec.pack_weights(w)
        return packed

    def _conv(self, params, name, x, p_in_have, ci, normalize=True):
        """Apply planned conv ``name``; repacks input if needed. Returns
        (y_packed, p): p is the CANONICAL pack of the output tensor (repacks
        are free reshapes), unless ``normalize=False`` (heads planned with an
        explicit p_out — psi / logits / dsy)."""
        plan = self.plans[name]
        if p_in_have != plan.p_in:
            x = repack(x, p_in_have, plan.p_in, ci)
        pname = name.split(".")[-1]
        node = params
        for part in name.split(".")[:-1]:
            node = node[part]
        b = node[pname].get("bias")
        if self._prepacked is not None:
            wp = self._prepacked[name]
        else:
            w = node[pname]["kernel"]
            if self.dtype is not None:
                w = w.astype(self.dtype)
            wp = plan.spec.pack_weights(w)
        y = plan.spec(x, wp, b)
        p_out = plan.spec.p_out
        if normalize:
            co = plan.spec.co
            p_c = self.pack_of(plan.spec.out_spatial[2], co)
            if p_c != p_out:
                y = repack(y, p_out, p_c, co)
            return y, p_c
        return y, p_out

    def _in_params(self, params, name):
        node = params
        for part in name.split("."):
            node = node[part]
        return node["scale"], node["bias"]

    def _se_block(self, params, name, x, p_in, ci, co, red):
        """SEResNetBottleNeck on packed tensors (models/blocks.py:66-134
        semantics, incl. the multiplicative shortcut combine)."""
        blk = params[name]
        residual, p_res = x, p_in

        h, p = self._conv(params, f"{name}.conv1", x, p_in, ci)
        s, b = self._in_params(params, f"{name}.norm1")
        h = packed_instance_norm(h, s, b, p, co // 4, negative_slope=0.1)
        h, p = self._conv(params, f"{name}.conv2", h, p, co // 4)
        s, b = self._in_params(params, f"{name}.norm2")
        h = packed_instance_norm(h, s, b, p, co // 4, negative_slope=0.1)
        h, p = self._conv(params, f"{name}.conv3", h, p, co // 4)
        s, b = self._in_params(params, f"{name}.norm3")
        x_ = packed_instance_norm(h, s, b, p, co)

        if ci != co:
            residual, p_res = self._conv(params, f"{name}.conv4", residual,
                                         p_in, ci)
            s, b = self._in_params(params, f"{name}.norm4")
            residual = packed_instance_norm(residual, s, b, p_res, co)
        if p_res != p:
            residual = repack(residual, p_res, p, co)

        # SE gate: tiny per-(B,C) compute, done unpacked.
        g = packed_spatial_mean(x_, p, co).astype(x_.dtype)  # (B,1,1,1,C)
        w6, b6 = blk["se_conv6"]["kernel"], blk["se_conv6"]["bias"]
        w7, b7 = blk["se_conv7"]["kernel"], blk["se_conv7"]["bias"]
        if self.dtype is not None:
            w6, w7 = w6.astype(self.dtype), w7.astype(self.dtype)
        g = _lrelu(jnp.einsum("bdhwc,co->bdhwo", g, w6[0, 0, 0]) +
                   b6.astype(g.dtype))
        g = jax.nn.sigmoid(jnp.einsum("bdhwc,co->bdhwo", g, w7[0, 0, 0]) +
                           b7.astype(g.dtype))
        gated = x_ * broadcast_channel_gate(g, p)

        return _lrelu(gated * residual), p

    def _att_gate(self, params, name, x, p, ci, gating):
        """GridAttentionBlock3D (models/blocks.py:137-174) with sub_samp 1:
        theta/psi/out packed; phi on the tiny gating tensor unpacked, then
        broadcast-upsampled directly into packed layout."""
        att = params[name]
        theta, p_t = self._conv(params, f"{name}.theta", x, p, ci)
        assert p_t == p, (p_t, p)

        wp_, bp_ = att["phi"]["kernel"], att["phi"]["bias"]
        if self.dtype is not None:
            wp_ = wp_.astype(self.dtype)
        phi = jnp.einsum("bdhwc,co->bdhwo", gating, wp_[0, 0, 0]) + \
            bp_.astype(gating.dtype)
        # nearest-upsample phi to x's grid, emitted directly packed at p
        bsz, gd, gh, gw, cc = phi.shape
        xd, xh, xwp = theta.shape[1], theta.shape[2], theta.shape[3]
        fd, fh = xd // gd, xh // gh
        w_full = xwp * p
        fw = w_full // gw
        phi = jnp.repeat(jnp.repeat(phi, fd, axis=1), fh, axis=2)
        phi = jnp.broadcast_to(phi[:, :, :, :, None, :],
                               (bsz, xd, xh, gw, fw, cc))
        phi = phi.reshape(bsz, xd, xh, gw, fw * cc)   # packed at p=fw
        phi = repack(phi, fw, p, cc)

        f_ = _lrelu(theta + phi)
        psi, p_psi = self._conv(params, f"{name}.psi", f_, p, ci,
                                normalize=False)
        assert p_psi == p, (p_psi, p)
        sig = jax.nn.sigmoid(psi)                      # (B,D,H,Wp,p) 1-channel
        y = x * broadcast_width_map(sig, p, ci)
        wy, p_o = self._conv(params, f"{name}.out", y, p, ci)
        s, b = self._in_params(params, f"{name}.norm_out")
        return packed_instance_norm(wy, s, b, p_o, ci), p_o

    # ---------------------------------------------------------------- forward
    def __call__(self, params: Dict[str, Any], inputs: jax.Array,
                 packed: Optional[Dict[str, jax.Array]] = None) -> jax.Array:
        """Deterministic trunk forward -> y_softmax (B,D,H,W,nc[*4 if ds]).

        ``packed``: optional pre-packed kernels from ``prepare(params)`` —
        pass them as a jit argument so the pack scatters don't re-run per
        call."""
        self._prepacked = packed
        f = self.filters
        nc = self.num_classes
        if self.dtype is not None and inputs.dtype != self.dtype:
            inputs = inputs.astype(self.dtype)

        p_img = self.pack_of(inputs.shape[3], self.input_channels)
        xp = pack_width(inputs, p_img)

        # stem
        x, p0 = self._conv(params, "conve0", xp, p_img, self.input_channels)
        s, b = self._in_params(params, "norme0")
        x = packed_instance_norm(x, s, b, p0, f[0], negative_slope=0.1)

        # encoder
        conv1, p1 = self._se_block(params, "serse1", x, p0, f[0], f[1],
                                   self.se_reduction[1])
        conv2, p2 = self._se_block(params, "serse2", conv1, p1, f[1], f[2],
                                   self.se_reduction[2])
        conv3, p3 = self._se_block(params, "serse3", conv2, p2, f[2], f[3],
                                   self.se_reduction[3])
        convm, p4 = self._se_block(params, "serse4", conv3, p3, f[3], f[4],
                                   self.se_reduction[4])

        gating = unpack_width(convm, p4, f[4])  # level-4 tensor, tiny

        att0, pa0 = self._att_gate(params, "att0", x, p0, f[0], gating)
        att1, pa1 = self._att_gate(params, "att1", conv1, p1, f[1], gating)
        att2, pa2 = self._att_gate(params, "att2", conv2, p2, f[2], gating)
        att3, pa3 = self._att_gate(params, "att3", conv3, p3, f[3], gating)
        atts = {0: (att0, pa0), 1: (att1, pa1), 2: (att2, pa2), 3: (att3, pa3)}

        # decoder
        def dec_stage(l, below, p_below, extra):
            """convtd{l}(below) ++ extra ++ att{l} -> sersd{l}."""
            d, p_d = self._conv(params, f"convtd{l}", below, p_below, f[l + 1])
            a, p_a = atts[l]
            parts, chans = [d], [f[l]]
            for t, p_t, c_t in extra:
                parts.append(repack(t, p_t, p_d, c_t))
                chans.append(c_t)
            parts.append(repack(a, p_a, p_d, f[l]))
            chans.append(f[l])
            cat = concat_packed(parts, p_d, chans)
            ci_tot = sum(chans)
            # concat changes lane width; sers plan knows its own p_in
            return self._se_block(params, f"sersd{l}", cat, p_d, ci_tot,
                                  f[l], self.se_reduction[l]) + (d, p_d)

        ds = {}
        if self.dense_skip:
            d3, pd3 = self._conv(params, "convtd3", convm, p4, f[4])
            d3u1, pu1 = self._conv(params, "convtd3_up1", d3, pd3, f[3])
            d3u2, pu2 = self._conv(params, "convtd3_up2", d3u1, pu1, f[2])
            d3u3, pu3 = self._conv(params, "convtd3_up3", d3u2, pu2, f[1])
            a3, pa = atts[3]
            cat3 = concat_packed([d3, repack(a3, pa, pd3, f[3])], pd3,
                                 [f[3], f[3]])
            u3, p_u3 = self._se_block(params, "sersd3", cat3, pd3, 2 * f[3],
                                      f[3], self.se_reduction[3])
            d2, pd2 = self._conv(params, "convtd2", u3, p_u3, f[3])
            d2u1, pv1 = self._conv(params, "convtd2_up1", d2, pd2, f[2])
            d2u2, pv2 = self._conv(params, "convtd2_up2", d2u1, pv1, f[1])
            a2, pa = atts[2]
            cat2 = concat_packed(
                [d2, repack(d3u1, pu1, pd2, f[2]), repack(a2, pa, pd2, f[2])],
                pd2, [f[2], f[2], f[2]])
            u2, p_u2 = self._se_block(params, "sersd2", cat2, pd2, 3 * f[2],
                                      f[2], self.se_reduction[2])
            d1, pd1 = self._conv(params, "convtd1", u2, p_u2, f[2])
            d1u1, pw1 = self._conv(params, "convtd1_up1", d1, pd1, f[1])
            a1, pa = atts[1]
            cat1 = concat_packed(
                [d1, repack(d2u1, pv1, pd1, f[1]), repack(d3u2, pu2, pd1, f[1]),
                 repack(a1, pa, pd1, f[1])],
                pd1, [f[1]] * 4)
            u1, p_u1 = self._se_block(params, "sersd1", cat1, pd1, 4 * f[1],
                                      f[1], self.se_reduction[1])
            d0, pd0 = self._conv(params, "convtd0", u1, p_u1, f[1])
            a0, pa = atts[0]
            cat0 = concat_packed(
                [d0, repack(d1u1, pw1, pd0, f[0]), repack(d2u2, pv2, pd0, f[0]),
                 repack(d3u3, pu3, pd0, f[0]), repack(a0, pa, pd0, f[0])],
                pd0, [f[0]] * 5)
            u0, p_u0 = self._se_block(params, "sersd0", cat0, pd0, 5 * f[0],
                                      f[0], self.se_reduction[0])
        else:
            u3, p_u3, _, _ = dec_stage(3, convm, p4, [])
            u2, p_u2, _, _ = dec_stage(2, u3, p_u3, [])
            u1, p_u1, _, _ = dec_stage(1, u2, p_u2, [])
            u0, p_u0, _, _ = dec_stage(0, u1, p_u1, [])

        y, p_y = self._conv(params, "logits", u0, p_u0, f[0], normalize=False)

        def packed_softmax(t, p_t):
            b_, d_, h_, wp_, pc = t.shape
            t = t.reshape(b_, d_, h_, wp_, p_t, nc)
            t = jax.nn.softmax(t, axis=-1)
            return t.reshape(b_, d_, h_, wp_, p_t * nc)

        y_soft = packed_softmax(y, p_y)
        if not self.deep_supervision:
            return unpack_width(y_soft, p_y, nc)

        # deep supervision: dsy heads at levels 1-3, nearest-upsampled to
        # level 0 (m1_core.py:316-325), softmaxed, channel-concatenated.
        s_np = [np.array(s) for s in self.strides]
        ups = {1: tuple(s_np[1]), 2: tuple(s_np[1] * s_np[2]),
               3: tuple(s_np[1] * s_np[2] * s_np[3])}
        outs = [unpack_width(y_soft, p_y, nc)]
        srcs = {1: (u1, p_u1), 2: (u2, p_u2), 3: (u3, p_u3)}
        for i in (1, 2, 3):
            t, p_t = srcs[i]
            h, p_h = self._conv(params, f"dsy{i}_logits", t, p_t, f[i],
                                normalize=False)
            h = packed_softmax(h, p_h)
            fd, fh, fw = ups[i]
            h = jnp.repeat(jnp.repeat(h, fd, axis=1), fh, axis=2)
            h = upsample_width_packed(h, p_h, nc, fw)
            outs.append(unpack_width(h, p_h, nc))
        return jnp.concatenate(outs, axis=-1)
