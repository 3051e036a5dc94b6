"""Round-2 probe #4: isolate the XLA 3D-conv cost at M1's small channel
counts and test layout/dispatch variants, all at the stem geometry
(B=64, 20x160x160, C=16, bf16).

Questions:
  1. How much of the conv133+IN+lrelu chain (12.65 ms, probe #3) is the BARE
     conv vs the IN?
  2. Does folding D into batch (2D dispatch) or C-as-sublane layouts help?
  3. Does space-to-depth (2x2 pack -> C=64 at 80x80) pay for its 4x FLOPs
     with lane efficiency?
  4. What does a Pallas flat-lane (W*C=2560) streaming pass achieve for the
     elementwise/stats side (the fusion roofline)?

Uses the slope method (k-in-loop) to cancel the ~9 ms dispatch floor.
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

B, D, H, W, C = 64, 20, 160, 160, 16
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


def slope(make_loop, x, k1=1, k2=5):
    f1 = jax.jit(partial(make_loop, k1))
    f2 = jax.jit(partial(make_loop, k2))
    t1, t2 = timed(f1, x), timed(f2, x)
    return (t2 - t1) / (k2 - k1)


def report(name, per, gbytes=None, gflops=None):
    line = f"{name:44s} {per*1e3:8.3f} ms/iter"
    if gbytes:
        line += f"  {gbytes/per:7.1f} GB/s"
    if gflops:
        line += f"  {gflops/per/1000:7.2f} TFLOP/s"
    print(line, flush=True)


def main():
    which = set(sys.argv[1:]) or {"bare", "layout", "s2d", "packed", "pallas"}
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    gb_io = B * D * H * W * (C + C) * 2 / 1e9          # read + write, bf16
    gf = 2 * B * D * H * W * 9 * C * C / 1e9

    x = jax.random.normal(key, (B, D, H, W, C), DT)
    wk = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 3, C, C), DT) * 0.1

    if "bare" in which:
        def bare(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wk, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                return jnp.tanh(h)  # prevent collapse; elementwise, fusable
            return jax.lax.fori_loop(0, k, body, v)

        report("bare conv133 16ch NDHWC (+tanh)", slope(bare, x), gb_io, gf)

        x2 = x.reshape(B * D, H, W, C)
        wk2 = wk[0]

        def bare2d(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wk2, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, k, body, v)

        report("bare conv33 16ch 2D (D folded)", slope(bare2d, x2), gb_io, gf)

    if "layout" in which:
        # C as sublanes, W minor (NCHW-ish 2D)
        x3 = jnp.transpose(x.reshape(B * D, H, W, C), (0, 3, 1, 2))
        wk3 = wk[0]

        def bare_nchw(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wk3, (1, 1), "SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, k, body, v)

        report("bare conv33 16ch 2D NCHW", slope(bare_nchw, x3), gb_io, gf)

    if "s2d" in which:
        # space-to-depth 2x2: same voxels as C=64 @ 80x80; 3x3 conv there has
        # 4x the FLOPs of the original per voxel (kernel support widens) but
        # full(er) lanes. Measures the packed op, not an equivalence.
        xs = x.reshape(B * D, H // 2, 2, W // 2, 2, C)
        xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(B * D, H // 2, W // 2, 4 * C)
        wks = jax.random.normal(jax.random.fold_in(key, 2),
                                (3, 3, 4 * C, 4 * C), DT) * 0.05

        def s2d(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wks, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, k, body, v)

        gf_s2d = 2 * B * D * (H // 2) * (W // 2) * 9 * (4 * C) ** 2 / 1e9
        report("conv33 64ch@80x80 (s2d packed)", slope(s2d, xs), gb_io, gf_s2d)

    if "packed" in which:
        # packed-W representation: (B,D,H,W,C) -> (B,D,H,W/8,128), a pure
        # row-major reshape. The (1,3,3) conv becomes a (1,3,3) conv over
        # packed-W with block-structured 128x128 weights (8x FLOPs, but full
        # lanes). Measures the packed op at stem geometry.
        p = 128 // C
        xp = x.reshape(B, D, H, W // p, p * C)
        wkp = jax.random.normal(jax.random.fold_in(key, 3),
                                (1, 3, 3, 128, 128), DT) * 0.05

        def packed(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wkp, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, k, body, v)

        gf_p = 2 * B * D * H * (W // p) * 9 * 128 * 128 / 1e9
        report("packed conv133 (20x128 lanes)", slope(packed, xp), gb_io, gf_p)

        xp2 = xp.reshape(B * D, H, W // p, p * C)
        wkp2 = wkp[0]

        def packed2d(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wkp2, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(h)
            return jax.lax.fori_loop(0, k, body, v)

        report("packed conv33 2D (D folded)", slope(packed2d, xp2), gb_io, gf_p)

        def packed_lrelu(k, v):
            return jax.lax.fori_loop(
                0, k, lambda i, a: jax.nn.leaky_relu(a, 0.1) * DT(0.999), v)

        report("packed lrelu (20x128 lanes)", slope(packed_lrelu, xp), gb_io)

        # packed + IN chain: conv -> stats -> affine+lrelu (the real cadence)
        def packed_chain(k, v):
            def body(i, a):
                h = jax.lax.conv_general_dilated(
                    a, wkp, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                m = jnp.mean(h, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
                q = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2, 3),
                             keepdims=True)
                inv = jax.lax.rsqrt(jnp.maximum(q - m * m, 0.0) + 1e-3)
                return jax.nn.leaky_relu(
                    (h.astype(jnp.float32) * inv + (-m * inv)).astype(DT), 0.1)
            return jax.lax.fori_loop(0, k, body, v)

        report("packed conv133+IN+lrelu chain", slope(packed_chain, xp),
               gb_io, gf_p)

    if "pallas" in which:
        # flat-lane streaming: rows=(B*D*H), lanes=(W*C)=2560; one read ->
        # affine+lrelu -> one write + per-lane stats. The fusion roofline for
        # every IN/gate/elementwise op in the model.
        rows = B * D * H
        xf = x.reshape(rows, W * C)
        TS = 256
        n_s = rows // TS

        def kern(x_ref, o_ref, s_ref, q_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            blk = x_ref[...].astype(jnp.float32)
            y = jnp.where(blk >= 0, blk, 0.1 * blk)
            o_ref[...] = y.astype(o_ref.dtype)
            acc[0, :] += jnp.sum(blk, axis=0)
            acc[1, :] += jnp.sum(blk * blk, axis=0)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                s_ref[...] = acc[0:1, :]
                q_ref[...] = acc[1:2, :]

        def flat(k, v):
            def body(i, a):
                o, s, q = pl.pallas_call(
                    kern,
                    grid=(n_s,),
                    in_specs=[pl.BlockSpec((TS, W * C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=[
                        pl.BlockSpec((TS, W * C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((rows, W * C), DT),
                        jax.ShapeDtypeStruct((1, W * C), jnp.float32),
                        jax.ShapeDtypeStruct((1, W * C), jnp.float32),
                    ],
                    scratch_shapes=[pltpu.VMEM((8, W * C), jnp.float32)],
                )(a)
                return o + DT(0.0) * s[0, :1].astype(DT)
            return jax.lax.fori_loop(0, k, body, v)

        report("pallas flat-lane lrelu+stats stream", slope(flat, xf), gb_io)


if __name__ == "__main__":
    main()
