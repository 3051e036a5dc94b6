"""Round-2 probe #5: per-stage timing of the PACKED M1 forward on TPU.

The packed full model measured 267 ms vs 197 ms standard (b64 bf16) despite
packed microbenchmarks winning — this probe localizes the regression by
timing each packed stage standalone (same planner/params the model uses).

Run: PYTHONPATH includes /root/.axon_site (axon plugin) + repo.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.models.m1_packed import PackedM1
from prostatemr_3d_cad_cspca_tpu.ops.packing import pack_width

B = 64
DT = jnp.bfloat16


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


def report(name, dt):
    print(f"{name:32s} {dt*1e3:8.2f} ms  ({dt/B*1e3:6.3f} ms/vol)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
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
    f = fast.filters
    rng = np.random.default_rng(0)

    def mk(shape, p):
        return pack_width(jnp.asarray(rng.normal(size=shape), DT), p)

    lv = [(20, 160, 160), (20, 80, 80), (20, 40, 40), (10, 20, 20), (5, 10, 10)]
    packs = [fast.pack_of(lv[i][2], f[i]) for i in range(5)]
    print("packs per level:", packs, flush=True)
    for name, plan in sorted(fast.plans.items()):
        s = plan.spec
        print(f"  plan {name:18s} p_in={s.p_in:2d} p_out={s.p_out:2d} "
              f"sp={s.sp} wp={s.wp_in}->{s.wp_out} padw={s.pad_w_packed}",
              flush=True)

    # stem
    x_in = mk((B, 20, 160, 160, 3), fast.pack_of(160, 3))
    def stem(p, v):
        h, pp = fast._conv(p, "conve0", v, fast.pack_of(160, 3), 3)
        from prostatemr_3d_cad_cspca_tpu.ops.packing import packed_instance_norm
        s_, b_ = fast._in_params(p, "norme0")
        return packed_instance_norm(h, s_, b_, pp, f[0], negative_slope=0.1)
    report("stem", timed(jax.jit(stem), params, x_in))

    # encoder blocks
    for lvl in range(1, 5):
        xin = mk((B, *lv[lvl - 1], f[lvl - 1]), packs[lvl - 1])
        fn = jax.jit(lambda p, v, lvl=lvl: fast._se_block(
            p, f"serse{lvl}", v, packs[lvl - 1], f[lvl - 1], f[lvl],
            fast.se_reduction[lvl])[0])
        report(f"serse{lvl}", timed(fn, params, xin))

    # attention gates
    gating = jnp.asarray(rng.normal(size=(B, *lv[4], f[4])), DT)
    for i in range(4):
        xin = mk((B, *lv[i], f[i]), packs[i])
        fn = jax.jit(lambda p, v, g, i=i: fast._att_gate(
            p, f"att{i}", v, packs[i], f[i], g)[0])
        report(f"att{i}", timed(fn, params, xin, gating))

    # decoder stages (convtd + concat + sers)
    for l in range(3, -1, -1):
        below = mk((B, *lv[l + 1], f[l + 1]), packs[l + 1])
        att = mk((B, *lv[l], f[l]), packs[l])

        def dec(p, v, a, l=l):
            from prostatemr_3d_cad_cspca_tpu.ops.packing import repack
            from prostatemr_3d_cad_cspca_tpu.models.m1_packed import concat_packed
            d, p_d = fast._conv(p, f"convtd{l}", v, packs[l + 1], f[l + 1])
            cat = concat_packed([d, repack(a, packs[l], p_d, f[l])], p_d,
                                [f[l], f[l]])
            return fast._se_block(p, f"sersd{l}", cat, p_d, 2 * f[l], f[l],
                                  fast.se_reduction[l])[0]
        report(f"dec{l}", timed(jax.jit(dec), params, below, att))

    # logits head
    x0 = mk((B, *lv[0], f[0]), packs[0])
    def head(p, v):
        y, p_y = fast._conv(p, "logits", v, packs[0], f[0], normalize=False)
        b_, d_, h_, wp_, pc = y.shape
        t = jax.nn.softmax(y.reshape(b_, d_, h_, wp_, p_y, 2), axis=-1)
        return t.reshape(b_, d_, h_, wp_, p_y * 2)
    report("logits+softmax", timed(jax.jit(head), params, x0))


if __name__ == "__main__":
    main()
