"""Pallas matmul speed forensics: why did (640,1152)x(1152,128) measure
0.77 TFLOP/s? Variants isolate dtype, shape alignment, ref-read hoisting,
grid style, and compare against an XLA matmul of identical shape.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def report(name, per, gflops):
    print(f"{name:44s} {per*1e6:9.1f} us  {gflops/per/1000:8.2f} TFLOP/s",
          flush=True)


def _slope(make_f, a, w, k1=100, k2=800):
    """Per-iteration time with the ~50 ms tunnel round-trip cancelled."""
    f1, f2 = jax.jit(make_f(k1)), jax.jit(make_f(k2))
    t1, t2 = timed(f1, a, w), timed(f2, a, w)
    return (t2 - t1) / (k2 - k1)


def pallas_loop_mm(M, K, N, dt):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (M, K), dt)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), dt) * 0.05

    def make_f(iters):
        def kern(a_ref, w_ref, o_ref):
            av, wv = a_ref[...], w_ref[...]

            def body(i, acc):
                return acc + jnp.dot(av, wv, preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(0, iters, body,
                                    jnp.zeros((M, N), jnp.float32))
            o_ref[...] = acc.astype(o_ref.dtype)

        return lambda a, w: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), dt),
        )(a, w)

    per = _slope(make_f, a, w)
    report(f"pallas loop mm {M}x{K}x{N} {dt.__name__}",
           per, 2 * M * K * N / 1e9)


def xla_loop_mm(M, K, N, dt):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (M, K), dt)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), dt) * 0.05

    def make_f(iters):
        def f(a, w):
            def body(i, acc):
                return acc + jnp.dot(a, w, preferred_element_type=jnp.float32)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((M, N), jnp.float32))
        return f

    per = _slope(make_f, a, w)
    report(f"xla   loop mm {M}x{K}x{N} {dt.__name__}", per,
           2 * M * K * N / 1e9)


def main():
    for M, K, N in ((640, 1152, 128), (1280, 1152, 128), (2560, 1152, 128),
                    (5120, 1152, 128), (2560, 1152, 256), (640, 144, 128),
                    (2560, 144, 128)):
        xla_loop_mm(M, K, N, jnp.bfloat16)
        pallas_loop_mm(M, K, N, jnp.bfloat16)


if __name__ == "__main__":
    main()
