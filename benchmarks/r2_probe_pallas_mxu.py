"""Round-2 probe #6: what MXU rate can a Pallas kernel sustain at the packed
M1 conv shapes — (M=Th*Wp, K=taps*128, N=128) per tile, streamed over a
(rows, 2560) bf16 tensor — including the in-VMEM im2col build?

Decides whether the fused Pallas packed-conv engine can beat XLA's measured
~109 TFLOP/s on the packed conv (see r2_probe_conv.py).

Variants:
  mm        — pure matmul throughput at (640, 1152) x (1152, 128), data
              resident (upper bound, no DMA)
  conv      — full streaming kernel: DMA tile in (+halo), im2col via static
              slices + wp-boundary masks, matmul, bias, store (the real
              kernel shape)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, H, Wp, LN = 64, 20, 160, 20, 128   # packed res0 geometry, lanes=128
DT = jnp.bfloat16
TAPS = 9                                  # kh=3 x kwp=3


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


def report(name, per, gbytes=None, gflops=None):
    line = f"{name:40s} {per*1e3:8.3f} ms"
    if gbytes:
        line += f"  {gbytes/per:7.1f} GB/s"
    if gflops:
        line += f"  {gflops/per/1000:7.2f} TFLOP/s"
    print(line, flush=True)


def mm_probe(key):
    M, K, N = 640, TAPS * LN, LN
    a = jax.random.normal(key, (M, K), DT)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), DT) * 0.05

    def kern(a_ref, w_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[...], w_ref[...],
                                 preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, 200, body, jnp.zeros((M, N), jnp.float32))
        o_ref[...] = acc.astype(o_ref.dtype)

    f = jax.jit(lambda a, w: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), DT),
    )(a, w))
    per = timed(f, a, w)
    report("pallas matmul 640x1152x128 (resident)", per / 200,
           gflops=2 * M * K * N / 1e9)


def conv_probe(key, th=32):
    """Streaming fused conv: x (B*D, H, Wp*LN) -> same, kernel (1,3,3)-packed.

    Mosaic requires Element block sizes divisible by 8; th dividing H=160
    with th+2 divisible by 8 has no solution, so the window reads
    win = th+8 rows (th+2 needed; ~17% extra input traffic at th=32).
    """
    N_ = B * D
    win = th + 8
    x = jax.random.normal(key, (N_, H, Wp * LN), DT)
    w = jax.random.normal(jax.random.fold_in(key, 2),
                          (TAPS * LN, LN), DT) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 3), (LN,), jnp.float32)
    n_h = H // th
    M = th * Wp

    def kern(x_ref, w_ref, b_ref, o_ref, xcol_ref):
        # x_ref: (1, win, Wp*LN); local row dy_i in {1,2,3} is orig h+dy_i-2
        # (the array is top-padded by 2 rows, so flat starts stay >= 0).
        t = x_ref[0]                                    # (win, Wp*LN)
        # W-taps as lane-aligned shifts: concat with a zero block gives the
        # wp+-1 neighbor AND the SAME zero padding at the W edges for free.
        zcol = jnp.zeros((win, LN), DT)
        t_m = jnp.concatenate([zcol, t[:, : (Wp - 1) * LN]], axis=1)
        t_p = jnp.concatenate([t[:, LN:], zcol], axis=1)
        # im2col into an aligned VMEM scratch -> ONE deep (M,1152)x(1152,LN)
        # MXU pass instead of 9 half-depth ones.
        idx = 0
        for dy_i in range(1, 4):                        # input local h offset
            for tt in (t_m, t, t_p):                    # wp-1, wp, wp+1
                sl = jax.lax.slice_in_dim(tt, dy_i, dy_i + th, axis=0)
                xcol_ref[:, idx * LN : (idx + 1) * LN] = sl.reshape(M, LN)
                idx += 1
        y = jnp.dot(xcol_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + b_ref[...]
        o_ref[0] = y.reshape(th, Wp * LN).astype(o_ref.dtype)

    # H halo: zero-pad 2 rows on top (keeps flat tap starts >= 0) + slack
    xp = jnp.pad(x, ((0, 0), (2, win - th - 2), (0, 0)))

    def run(xp, w, bias):
        return pl.pallas_call(
            kern,
            grid=(N_, n_h),
            in_specs=[
                pl.BlockSpec((pl.Element(1), pl.Element(win), pl.Element(Wp * LN)),
                             lambda n, h: (n, h * th, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, Wp * LN),
                                   lambda n, h: (n, h, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_, H, Wp * LN), DT),
            scratch_shapes=[pltpu.VMEM((M, TAPS * LN), DT)],
        )(xp, w, bias)

    f = jax.jit(run)
    # correctness vs XLA conv (same dense packed weights), on a small slice
    got = np.asarray(f(xp, w, bias)[:4], np.float32)
    ref = jax.lax.conv_general_dilated(
        x[:4].reshape(4, H, Wp, LN), w.reshape(3, 3, LN, LN),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bias
    ref = np.asarray(ref.reshape(4, H, Wp * LN).astype(DT), np.float32)
    err = np.abs(got - ref).max()
    print(f"  correctness vs XLA conv (th={th}): maxdiff {err:.2e}",
          flush=True)

    # timing: chain k calls in-device (output feeds input; both (N,H+2,L))
    def run_pad(v, w, bias):
        return pl.pallas_call(
            kern,
            grid=(N_, n_h),
            in_specs=[
                pl.BlockSpec((pl.Element(1), pl.Element(win), pl.Element(Wp * LN)),
                             lambda n, h: (n, h * th, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, Wp * LN),
                                   lambda n, h: (n, h, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xp_shape, DT),
            scratch_shapes=[pltpu.VMEM((M, TAPS * LN), DT)],
        )(v, w, bias)

    xp_shape = None  # set below

    def make_loop(k):
        def g(v, w, bias):
            return jax.lax.fori_loop(
                0, k, lambda i, s: run_pad(s, w, bias) * DT(0.999), v)
        return g

    xp_shape = xp.shape

    f1 = jax.jit(make_loop(2))
    f2 = jax.jit(make_loop(10))
    t1 = timed(f1, xp, w, bias)
    t2 = timed(f2, xp, w, bias)
    per = (t2 - t1) / 8
    gb = 2 * N_ * H * Wp * LN * 2 / 1e9
    gf = 2 * N_ * H * Wp * TAPS * LN * LN / 1e9
    report(f"pallas fused conv133 stream (th={th})", per, gbytes=gb, gflops=gf)


def main():
    which = set(sys.argv[1:]) or {"mm", "conv"}
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    if "mm" in which:
        mm_probe(key)
    if "conv" in which:
        for th in (16, 32):
            conv_probe(key, th)


if __name__ == "__main__":
    main()
