"""Round-2 probe #2b: layout hypothesis, split into individually-timed pieces
(each prints immediately; safe under timeouts). Select pieces via argv."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, D, H, W = 64, 20, 160, 160
DT = jnp.bfloat16


def measure(fn, *args, iters=10):
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, compile_s


def report(name, fn, *args, gbytes=None):
    dt, cs = measure(fn, *args)
    line = f"{name:44s} {dt*1e3:8.2f} ms (compile {cs:.0f}s)"
    if gbytes:
        line += f"  {gbytes/dt:7.1f} GB/s(logical)"
    print(line, flush=True)


def main():
    which = set(sys.argv[1:]) or {"ew", "stem", "logits"}
    print(f"devices: {jax.devices()}", flush=True)

    class DeviceRng:  # on-device RNG: host->device transfers over the tunnel
        def __init__(self):  # are minutes-slow for GB tensors
            self.key = jax.random.PRNGKey(0)

        def normal(self, size):
            self.key, k = jax.random.split(self.key)
            return jax.random.normal(k, size, DT)

    rng = DeviceRng()

    if "ew" in which:
        for b, c in ((B, 16), (B // 8, 128)):
            x = rng.normal((b, D, H, W, c))
            report(f"lrelu NDHWC b{b} C={c}",
                   lambda v: jax.nn.leaky_relu(v, 0.1), x,
                   gbytes=2 * x.size * 2 / 1e9)
            del x
        x = rng.normal((B, D, H, 16, W))
        report("lrelu NDHCW (W minor) C=16",
               lambda v: jax.nn.leaky_relu(v, 0.1), x,
               gbytes=2 * x.size * 2 / 1e9)
        del x

    if "stem" in which:
        wk = rng.normal((1, 3, 3, 3, 16)) * 0.1
        bk = jnp.zeros((16,), DT)
        xin = rng.normal((B, D, H, W, 3))
        gb = (B * D * H * W * (3 + 16 + 16 + 16) * 2) / 1e9

        def stem_ndhwc(x, w, b):
            h = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            h = h + b
            m = jnp.mean(h, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
            v = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2, 3),
                         keepdims=True) - jnp.square(m)
            hn = (h.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-3)
            return jax.nn.leaky_relu(hn.astype(DT), 0.1)

        report("stem conv+IN+lrelu NDHWC", stem_ndhwc, xin, wk, bk, gbytes=gb)

        xin_t = jnp.transpose(xin, (0, 1, 2, 4, 3))
        wk_t = jnp.transpose(wk, (0, 1, 2, 4, 3))

        def stem_cw(x, w, b):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (1, 1)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.slice(
                        xp, (0, 0, dy, 0, dx), (B, D, dy + H, 3, dx + W))
                    part = jnp.einsum("oi,bdhiw->bdhow", w[0, dy, dx], sl,
                                      preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            h = acc + b[:, None]
            m = jnp.mean(h, axis=(1, 2, 4), keepdims=True)
            v = jnp.mean(jnp.square(h), axis=(1, 2, 4), keepdims=True) - jnp.square(m)
            hn = (h - m) * jax.lax.rsqrt(v + 1e-3)
            return jax.nn.leaky_relu(hn.astype(DT), 0.1)

        report("stem conv+IN+lrelu (C,W) shifted-matmul",
               stem_cw, xin_t, wk_t, bk, gbytes=gb)

    if "logits" in which:
        x16 = rng.normal((B, D, H, W, 16))
        wl = rng.normal((16, 2)) * 0.1
        gb = (B * D * H * W * (16 + 2) * 2) / 1e9

        def logits_ndhwc(x, w):
            y = jnp.einsum("bdhwi,io->bdhwo", x, w,
                           preferred_element_type=jnp.float32)
            return jax.nn.softmax(y, axis=-1).astype(DT)

        report("logits+softmax NDHWC", logits_ndhwc, x16, wl, gbytes=gb)

        x16_t = jnp.transpose(x16, (0, 1, 2, 4, 3))

        def logits_cw(x, w):
            y = jnp.einsum("io,bdhiw->bdhow", wl, x,
                           preferred_element_type=jnp.float32)
            return jax.nn.softmax(y, axis=-2).astype(DT)

        report("logits+softmax (C,W)", logits_cw, x16_t, wl, gbytes=gb)

    if "f4" in which:
        x4 = rng.normal((B, D, H, W, 4))
        w4 = rng.normal((3, 3, 3, 4, 4)) * 0.1
        gb = (B * D * H * W * (4 + 4) * 2) / 1e9

        def mid_ndhwc(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        report("f/4 conv 4->4 (3,3,3) NDHWC", mid_ndhwc, x4, w4, gbytes=gb)

        x4_t = jnp.transpose(x4, (0, 1, 2, 4, 3))
        w4_t = jnp.transpose(w4, (0, 1, 2, 4, 3))

        def mid_cw(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)))
            acc = None
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        sl = jax.lax.slice(
                            xp, (0, dz, dy, 0, dx),
                            (B, dz + D, dy + H, 4, dx + W))
                        part = jnp.einsum("oi,bdhiw->bdhow", w[dz, dy, dx], sl,
                                          preferred_element_type=jnp.float32)
                        acc = part if acc is None else acc + part
            return acc.astype(DT)

        report("f/4 conv 4->4 (3,3,3) (C,W)", mid_cw, x4_t, w4_t, gbytes=gb)


if __name__ == "__main__":
    main()
