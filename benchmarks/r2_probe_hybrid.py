"""Round-2 probe #7: packed vs unpacked for the REAL hot blocks (att gate,
SE block) at res0 geometry, slope-timed (k-chained in one dispatch) so the
~50 ms tunnel round-trip cancels.

Decides the hybrid composition: pack only stages whose shapes are clean
(lanes ~128, Wp >= 16) and keep XLA-preferred layouts elsewhere.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models.blocks import (
    GridAttentionBlock3D, SEResNetBottleNeck)
from prostatemr_3d_cad_cspca_tpu.models.m1_packed import PackedM1
from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.ops.convolution import ConvConfig
from prostatemr_3d_cad_cspca_tpu.ops.packing import pack_width

B = 64
DT = jnp.bfloat16
CFG = ConvConfig(dtype=DT)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(apply_fn, x0, extra, k1=2, k2=8):
    """apply_fn(x, *extra) -> same-shaped tensor; chained k times."""
    def make(k):
        def g(x, *extra):
            return jax.lax.fori_loop(
                0, k, lambda i, s: apply_fn(s, *extra) * DT(0.999), x)
        return g

    t1 = timed(jax.jit(make(k1)), x0, *extra)
    t2 = timed(jax.jit(make(k2)), x0, *extra)
    return (t2 - t1) / (k2 - k1)


def report(name, per):
    print(f"{name:44s} {per*1e3:8.2f} ms  ({per/B*1e3:6.3f} ms/vol)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    m = M1(input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
           filters=(16, 32, 64, 128, 256),
           strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
           kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
           se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
           dropout_rate=0.0, summary=False, dtype=DT)
    fast = PackedM1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), dtype=DT)
    params = m.params["core"]

    x = jnp.asarray(rng.normal(size=(B, 20, 160, 160, 16)), DT)
    g = jnp.asarray(rng.normal(size=(B, 5, 10, 10, 256)), DT)
    p0 = fast.pack_of(160, 16)
    xp = pack_width(x, p0)

    which = set(sys.argv[1:]) or {"att", "se", "stem"}

    if "att" in which:
        # unpacked att0 (x -> w_y, same shape)
        blk = GridAttentionBlock3D(inter_channels=16, sub_samp=(1, 1, 1),
                                   conv_cfg=CFG)
        bp = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x, g))()["params"]
        report("att0 unpacked XLA", slope(
            lambda v, bp, g: blk.apply({"params": bp}, v, g)[0], x, (bp, g)))

        gating = jnp.asarray(rng.normal(size=(B, 5, 10, 10, 256)), DT)
        report("att0 packed", slope(
            lambda v, p, gg: fast._att_gate(p, "att0", v, p0, 16, gg)[0],
            xp, (params, gating)))

    if "se" in which:
        # sersd0-geometry SE block made square: ci=co=16, stride 1, res0
        blk = SEResNetBottleNeck(filters=16, kernel_size=(1, 3, 3),
                                 strides=(1, 1, 1), reduction=8, conv_cfg=CFG)
        bp = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x))()["params"]
        report("SE16 res0 unpacked XLA", slope(
            lambda v, bp: blk.apply({"params": bp}, v), x, (bp,)))

        # packed equivalent using sersd0 weights is not square; measure the
        # packed SE path with a square ad-hoc planner entry instead
        fast._plan_se("se16sq", (20, 160, 160), 16, 16, (1, 3, 3), (1, 1, 1))
        sq = jax.jit(lambda: SEResNetBottleNeck(
            filters=16, kernel_size=(1, 3, 3), strides=(1, 1, 1), reduction=8,
            conv_cfg=CFG).init(jax.random.PRNGKey(0), x))()["params"]
        pp = {"se16sq": sq}
        report("SE16 res0 packed", slope(
            lambda v, pp: fast._se_block(pp, "se16sq", v, p0, 16, 16, 8)[0],
            xp, (pp,)))

    if "stem" in which:
        # (1,3,3) conv 16->16 as 2D (D folded) + IN + lrelu, unpacked
        from flax import linen as nn
        from prostatemr_3d_cad_cspca_tpu.ops.normalization import InstanceNorm

        class Stem2D(nn.Module):
            @nn.compact
            def __call__(self, v):
                b, d, h, w, c = v.shape
                t = v.reshape(b * d, h, w, c)
                t = nn.Conv(16, (3, 3), (1, 1), **CFG.conv_kwargs())(t)
                t = t.reshape(b, d, h, w, 16)
                t = InstanceNorm()(t)
                return nn.leaky_relu(t, 0.1)

        s2 = Stem2D()
        sp = jax.jit(lambda: s2.init(jax.random.PRNGKey(0), x))()["params"]
        report("conv133+IN+lrelu 2Dfold unpacked", slope(
            lambda v, sp: s2.apply({"params": sp}, v), x, (sp,)))


if __name__ == "__main__":
    main()
