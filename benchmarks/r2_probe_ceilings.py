"""Round-2 probe #3: TRUE device ceilings + per-chain costs, measured with
K-fold repetition INSIDE one dispatch (the remote-tunnel dispatch floor is
~9 ms, so single-shot sub-10 ms timings are meaningless).

Slope method: run a chain K1 and K2 times inside lax.fori_loop; the per-iter
time is (T2-T1)/(K2-K1), dispatch overhead cancels.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, D, H, W = 64, 20, 160, 160
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


def slope(make_loop, x, k1=2, k2=10):
    f1 = jax.jit(partial(make_loop, k1))
    f2 = jax.jit(partial(make_loop, k2))
    t1, t2 = timed(f1, x), timed(f2, x)
    return (t2 - t1) / (k2 - k1)


def report(name, per_iter, gbytes=None, gflops=None):
    line = f"{name:40s} {per_iter*1e3:8.3f} ms/iter"
    if gbytes:
        line += f"  {gbytes/per_iter:7.1f} GB/s"
    if gflops:
        line += f"  {gflops/per_iter/1000:7.2f} TFLOP/s"
    print(line, flush=True)


def main():
    which = set(sys.argv[1:]) or {"bw", "mxu", "chains"}
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    if "bw" in which:
        # pure HBM streaming ceiling: acc = acc*c + 1 on a 1.05 GB tensor
        x = jax.random.normal(key, (512, 1024, 1024), DT)  # 1.07e9 B

        def loop(k, v):
            return jax.lax.fori_loop(
                0, k, lambda i, a: a * DT(0.999) + DT(1.0), v)

        per = slope(loop, x)
        report("HBM stream (r+w 2.1GB/iter)", per, gbytes=2 * x.size * 2 / 1e9)

    if "mxu" in which:
        a = jax.random.normal(key, (4096, 4096), DT)

        def loop(k, v):
            def body(i, m):
                return jnp.tanh(m @ a)  # tanh prevents algebraic collapse
            return jax.lax.fori_loop(0, k, body, v)

        per = slope(loop, a)
        report("MXU 4096^3 matmul", per, gflops=2 * 4096**3 / 1e9)

    if "chains" in which:
        # --- att0-style chain: all-1x1 attention gate at res0, C=16 --------
        k1, k2, k3 = (jax.random.normal(jax.random.fold_in(key, i),
                                        (16, 16), DT) * 0.2 for i in range(3))
        psi_w = jax.random.normal(jax.random.fold_in(key, 9), (16, 1), DT)
        phi = jax.random.normal(jax.random.fold_in(key, 3),
                                (B, D, H, W, 1), DT) * 0.1  # pre-upsampled psi bias proxy

        x0 = jax.random.normal(jax.random.fold_in(key, 4), (B, D, H, W, 16), DT)

        def att_chain(v):
            theta = v @ k1
            f = jax.nn.leaky_relu(theta + phi, 0.1)
            psi = jax.nn.sigmoid(f @ psi_w)
            y = psi * v
            wy = y @ k2
            m = jnp.mean(wy, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            vv = jnp.mean(jnp.square(wy.astype(jnp.float32)), axis=(1, 2, 3),
                          keepdims=True) - jnp.square(m)
            a_ = jax.lax.rsqrt(vv + 1e-3)
            return ((wy.astype(jnp.float32) - m) * a_).astype(DT)

        def loop(k, v):
            return jax.lax.fori_loop(0, k, lambda i, s: att_chain(s), v)

        per = slope(loop, x0, k1=1, k2=5)
        gb = B * D * H * W * (16 + 16) * 2 / 1e9  # ideal: read x, write out
        report("att0 chain XLA (ideal 2.1GB)", per, gbytes=gb)

        # --- stem-style chain: 1x3x3 conv 16->16 + IN + lrelu ---------------
        wk = jax.random.normal(jax.random.fold_in(key, 5),
                               (1, 3, 3, 16, 16), DT) * 0.1

        def stem_chain(v):
            h = jax.lax.conv_general_dilated(
                v, wk, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            m = jnp.mean(h, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            vv = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2, 3),
                          keepdims=True) - jnp.square(m)
            hn = (h.astype(jnp.float32) - m) * jax.lax.rsqrt(vv + 1e-3)
            return jax.nn.leaky_relu(hn, 0.1).astype(DT)

        def loop2(k, v):
            return jax.lax.fori_loop(0, k, lambda i, s: stem_chain(s), v)

        per = slope(loop2, x0, k1=1, k2=5)
        gb = B * D * H * W * (16 + 16) * 2 / 1e9
        gf = 2 * B * D * H * W * 9 * 16 * 16 / 1e9
        report("conv133+IN+lrelu chain XLA", per, gbytes=gb, gflops=gf)

        # --- f/4 bottleneck conv 4ch 333 -----------------------------------
        x4 = jax.random.normal(jax.random.fold_in(key, 6), (B, D, H, W, 4), DT)
        w4 = jax.random.normal(jax.random.fold_in(key, 7),
                               (3, 3, 3, 4, 4), DT) * 0.2

        def mid_chain(v):
            h = jax.lax.conv_general_dilated(
                v, w4, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return jnp.tanh(h)

        def loop3(k, v):
            return jax.lax.fori_loop(0, k, lambda i, s: mid_chain(s), v)

        per = slope(loop3, x4, k1=1, k2=5)
        gb = B * D * H * W * (4 + 4) * 2 / 1e9
        report("f/4 conv333 4ch chain XLA", per, gbytes=gb)


if __name__ == "__main__":
    main()
