"""Round-2 probe #2: does XLA's channels-minor layout inflate HBM traffic for
the M1's small channel counts (C=2..16 at full res)?

Hypothesis: NDHWC tensors with C << 128 get lane-padded, so every res0 tensor
pays a large physical-traffic multiplier. If true, a (B,D,H,C,W) layout with W
on lanes and C on sublanes should run the same math several times faster.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B, D, H, W = 64, 20, 160, 160
DT = jnp.bfloat16


def measure(fn, *args, iters=10):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def report(name, dt, gbytes):
    print(f"{name:44s} {dt*1e3:8.2f} ms  {gbytes/dt:7.1f} GB/s(logical)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- elementwise: same logical bytes, three layouts --------------------
    for c, name in ((16, "lrelu NDHWC C=16"), (128, "lrelu NDHWC C=128")):
        x = jnp.asarray(rng.normal(size=(B, D, H, W, c)), DT)
        gb = 2 * x.size * 2 / 1e9
        report(name, measure(lambda v: jax.nn.leaky_relu(v, 0.1), x), gb)

    x = jnp.asarray(rng.normal(size=(B, D, H, 16, W)), DT)  # W minor
    gb = 2 * x.size * 2 / 1e9
    report("lrelu NDHCW (W minor) C=16", measure(
        lambda v: jax.nn.leaky_relu(v, 0.1), x), gb)

    # ---- stem conv 3->16 (1,3,3) + IN + lrelu -------------------------------
    wk = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 16)) * 0.1, DT)
    bk = jnp.zeros((16,), DT)
    xin = jnp.asarray(rng.normal(size=(B, D, H, W, 3)), DT)
    gb = (B * D * H * W * (3 + 16 + 16 + 16) * 2) / 1e9  # r x, w h, r h, w y

    def stem_ndhwc(x, w, b):
        h = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        h = h + b
        m = jnp.mean(h, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
        v = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(1, 2, 3),
                     keepdims=True) - jnp.square(m)
        h = (h.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-3)
        return jax.nn.leaky_relu(h.astype(DT), 0.1)

    report("stem conv+IN+lrelu NDHWC", measure(stem_ndhwc, xin, wk, bk), gb)

    # same math, (B,D,H,C,W) layout, conv as 9 shifted (co,ci)x(ci,W) matmuls
    xin_t = jnp.transpose(xin, (0, 1, 2, 4, 3))  # (B,D,H,C,W)
    wk_t = jnp.transpose(wk, (0, 1, 2, 4, 3))    # (1,3,3,O,I)

    def stem_cw(x, w, b):
        # pad H and W (SAME)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (1, 1)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(
                    xp, (0, 0, dy, 0, dx), (B, D, H, 3, W))
                part = jnp.einsum("oi,bdhiw->bdhow", w[0, dy, dx], sl,
                                  preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        h = acc + b[:, None]
        m = jnp.mean(h, axis=(1, 2, 4), keepdims=True)
        v = jnp.mean(jnp.square(h), axis=(1, 2, 4), keepdims=True) - jnp.square(m)
        h = (h - m) * jax.lax.rsqrt(v + 1e-3)
        return jax.nn.leaky_relu(h.astype(DT), 0.1)

    report("stem conv+IN+lrelu (C,W) shifted-matmul",
           measure(stem_cw, xin_t, wk_t, bk), gb)

    # ---- logits 16->2 + softmax --------------------------------------------
    x16 = jnp.asarray(rng.normal(size=(B, D, H, W, 16)), DT)
    wl = jnp.asarray(rng.normal(size=(16, 2)) * 0.1, DT)
    gb = (B * D * H * W * (16 + 2) * 2) / 1e9

    def logits_ndhwc(x, w):
        y = jnp.einsum("bdhwi,io->bdhwo", x, w, preferred_element_type=jnp.float32)
        return jax.nn.softmax(y, axis=-1).astype(DT)

    report("logits+softmax NDHWC", measure(logits_ndhwc, x16, wl), gb)

    x16_t = jnp.transpose(x16, (0, 1, 2, 4, 3))

    def logits_cw(x, w):
        y = jnp.einsum("io,bdhiw->bdhow", x=w, **{}) if False else jnp.einsum(
            "io,bdhiw->bdhow", w, x, preferred_element_type=jnp.float32)
        return jax.nn.softmax(y, axis=-2).astype(DT)

    report("logits+softmax (C,W)", measure(logits_cw, x16_t, wl), gb)

    # ---- SE-bottleneck mid conv: 4ch 3x3x3 at res0 (the f/4 squeeze) -------
    x4 = jnp.asarray(rng.normal(size=(B, D, H, W, 4)), DT)
    w4 = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 4)) * 0.1, DT)
    gb = (B * D * H * W * (4 + 4) * 2) / 1e9

    def mid_ndhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    report("f/4 conv 4->4 (3,3,3) NDHWC", measure(mid_ndhwc, x4, w4), gb)

    x4_t = jnp.transpose(x4, (0, 1, 2, 4, 3))
    w4_t = jnp.transpose(w4, (0, 1, 2, 4, 3))

    def mid_cw(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)))
        acc = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.dynamic_slice(
                        xp, (0, dz, dy, 0, dx), (B, D, H, 4, W))
                    part = jnp.einsum("oi,bdhiw->bdhow", w[dz, dy, dx], sl,
                                      preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
        return acc.astype(DT)

    report("f/4 conv 4->4 (3,3,3) (C,W) shifted-matmul",
           measure(mid_cw, x4_t, w4_t), gb)


if __name__ == "__main__":
    main()
