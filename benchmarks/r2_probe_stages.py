"""Round-2 perf probe: per-stage timing of the M1 det forward on the real TPU.

Times each architectural piece standalone (jitted, params passed as args),
alongside the full forward, and reports achieved HBM bandwidth + MXU FLOP/s
per piece from analytic byte/FLOP counts. Drives the decision of where to
spend Pallas/fusion effort (VERDICT.md round-2 item 2).

Run on the real chip (no JAX_PLATFORMS=cpu). One process at a time.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models.blocks import (
    GridAttentionBlock3D, SEResNetBottleNeck, leaky_relu01)
from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
from prostatemr_3d_cad_cspca_tpu.ops.convolution import ConvConfig
from prostatemr_3d_cad_cspca_tpu.ops.normalization import InstanceNorm
from flax import linen as nn

B = 64
DTYPE = jnp.bfloat16
CFG = ConvConfig(dtype=DTYPE)


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


def init_block(block, *shapes):
    xs = [jnp.zeros(s, DTYPE) for s in shapes]
    params = jax.jit(lambda: block.init(jax.random.PRNGKey(0), *xs))()["params"]
    return params, xs


def report(name, dt, gbytes=None, gflops=None):
    per_vol = dt / B * 1e3
    line = f"{name:28s} {dt*1e3:8.2f} ms  ({per_vol:6.3f} ms/vol)"
    if gbytes:
        line += f"  {gbytes/dt:7.1f} GB/s"
    if gflops:
        line += f"  {gflops/dt/1000:6.2f} TFLOP/s"
    print(line, flush=True)
    return dt


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(16, (1, 3, 3), (1, 1, 1), **CFG.conv_kwargs())(x)
        h = InstanceNorm()(h)
        return leaky_relu01(h)


class Stem2D(nn.Module):
    """Stem dispatched as a 2D conv (D folded into batch)."""

    @nn.compact
    def __call__(self, x):
        b, d, hh, ww, c = x.shape
        h = x.reshape(b * d, hh, ww, c)
        h = nn.Conv(16, (3, 3), (1, 1), **CFG.conv_kwargs())(h)
        h = h.reshape(b, d, hh, ww, 16)
        h = InstanceNorm()(h)
        return leaky_relu01(h)


class LogitsSoftmax(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(2, (1, 1, 1), (1, 1, 1), **CFG.conv_kwargs())(x)
        return jax.nn.softmax(y, axis=-1)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    meg = B * 20 * 160 * 160 / 1e9  # "giga-voxels" at res0 per batch

    # ---- full model -------------------------------------------------------
    model = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False, dtype=DTYPE)
    params = model.params
    net = model.net

    x = jnp.zeros((B, 20, 160, 160, 3), DTYPE)

    def full(params, x):
        return net.apply({"params": params}, x, train=False)["y_softmax"][..., :2]

    t_full = report("FULL det forward", measure(full, params, x))

    # ---- stem -------------------------------------------------------------
    stem = Stem()
    p, (xs,) = init_block(stem, (B, 20, 160, 160, 3))
    gb = meg * (3 + 16 + 16) * 2  # read x, write h, re-read for norm-ish
    t = report("stem conv+IN+lrelu (3D)", measure(lambda p, x: stem.apply({"params": p}, x), p, xs), gbytes=gb)

    stem2d = Stem2D()
    p2, _ = init_block(stem2d, (B, 20, 160, 160, 3))
    report("stem conv+IN+lrelu (2D)", measure(lambda p, x: stem2d.apply({"params": p}, x), p2, xs), gbytes=gb)

    # ---- encoder SE blocks --------------------------------------------------
    enc_shapes = [
        ("serse1", (B, 20, 160, 160, 16), 32, (1, 3, 3), (1, 2, 2)),
        ("serse2", (B, 20, 80, 80, 32), 64, (1, 3, 3), (1, 2, 2)),
        ("serse3", (B, 20, 40, 40, 64), 128, (3, 3, 3), (2, 2, 2)),
        ("serse4", (B, 10, 20, 20, 128), 256, (3, 3, 3), (2, 2, 2)),
    ]
    for name, shp, f, k, s in enc_shapes:
        blk = SEResNetBottleNeck(filters=f, kernel_size=k, strides=s,
                                 reduction=8, conv_cfg=CFG)
        p, (xb,) = init_block(blk, shp)
        report(name, measure(lambda p, x, blk=blk: blk.apply({"params": p}, x), p, xb))

    # ---- attention gates ----------------------------------------------------
    g = jnp.zeros((B, 5, 10, 10, 256), DTYPE)
    att_shapes = [
        ("att0", (B, 20, 160, 160, 16), 16),
        ("att1", (B, 20, 80, 80, 32), 32),
        ("att2", (B, 20, 40, 40, 64), 64),
        ("att3", (B, 10, 20, 20, 128), 128),
    ]
    for name, shp, ic in att_shapes:
        blk = GridAttentionBlock3D(inter_channels=ic, sub_samp=(1, 1, 1), conv_cfg=CFG)
        p, xs2 = init_block(blk, shp, g.shape)
        report(name, measure(
            lambda p, x, g, blk=blk: blk.apply({"params": p}, x, g), p, xs2[0], xs2[1]))

    # ---- decoder ------------------------------------------------------------
    dec_shapes = [
        # (name, convT out_f, k, s, in_shape, sers f, sers k, skip channels)
        ("dec3", 128, (3, 3, 3), (2, 2, 2), (B, 5, 10, 10, 256), 128, (3, 3, 3), 128),
        ("dec2", 64, (3, 3, 3), (2, 2, 2), (B, 10, 20, 20, 128), 64, (3, 3, 3), 64),
        ("dec1", 32, (1, 3, 3), (1, 2, 2), (B, 20, 40, 40, 64), 32, (1, 3, 3), 32),
        ("dec0", 16, (1, 3, 3), (1, 2, 2), (B, 20, 80, 80, 32), 16, (1, 3, 3), 16),
    ]
    for name, f, k, s, shp, sf, sk, skipc in dec_shapes:

        class DecStage(nn.Module):
            @nn.compact
            def __call__(self, x, skip):
                h = nn.ConvTranspose(f, k, s, transpose_kernel=True,
                                     **CFG.conv_kwargs())(x)
                h = jnp.concatenate([h, skip], axis=-1)
                return SEResNetBottleNeck(filters=sf, kernel_size=sk,
                                          strides=(1, 1, 1), reduction=8,
                                          conv_cfg=CFG)(h)

        blk = DecStage()
        out_sp = tuple(shp[1 + i] * s[i] for i in range(3))
        skip_shape = (B, *out_sp, skipc)
        p, xs2 = init_block(blk, shp, skip_shape)
        report(name, measure(
            lambda p, a, b, blk=blk: blk.apply({"params": p}, a, b), p, xs2[0], xs2[1]))

    # ---- head ---------------------------------------------------------------
    head = LogitsSoftmax()
    p, (xh,) = init_block(head, (B, 20, 160, 160, 16))
    report("logits+softmax", measure(lambda p, x: head.apply({"params": p}, x), p, xh),
           gbytes=meg * (16 + 2 + 2) * 2)

    print(f"\nfull = {t_full*1e3:.1f} ms -> {B/t_full:.1f} vol/s", flush=True)


if __name__ == "__main__":
    main()
