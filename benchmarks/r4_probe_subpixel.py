"""Round-4 probe: subpixel rewrite of the decoder's transposed convs.

The per-op roofline table (r4_roofline_infer.json) shows the cfg1 wall's
worst speed-of-light outliers cluster around the stride-(1,2,2)
TRANSPOSED convs: XLA lowers them into full-resolution C=4 tensors with
half-empty T(4,128) tiles (e.g. `fusion.360` bf16[120,20,160,160,4] at
x1.25 and its IN-stats companion `fusion.31` at x4.02 roofline).

Rewrite under test ("subpixel"): a transposed conv with stride s and
kernel k is EXACTLY a regular conv producing prod(s)*C_out channels on
the LOW-res grid — one phase block of C_out channels per output subpixel
position, each phase's taps being the stride-s decimation of the flipped
kernel — followed by a depth-to-space interleave. All tensors then carry
>=4x more channels on 4x fewer pixels: full lanes, no C=4 layouts.

Exactness is asserted against flax nn.ConvTranspose(transpose_kernel=
True, SAME) — the decoder's op (ops/convolution.py:264) — on CPU-style
small shapes BEFORE timing; the TPU section times the real convtd0
context (b120 [20,80,80]x32 -> 16ch at [20,160,160] + InstanceNorm).

Writes benchmarks/r4_subpixel_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def subpixel_kernel(w, strides):
    """Map a TF-convention transposed-conv kernel to the equivalent
    regular-conv kernel for the subpixel rewrite.

    ``w``: (kd, kh, kw, C_out, C_in) — nn.ConvTranspose(transpose_kernel=
    True) layout. Returns (w_sub, pads) where ``w_sub`` has shape
    (kd', kh', kw', C_in, prod(s)*C_out) for a stride-1
    conv_general_dilated NDHWC call with explicit ``pads``, whose output's
    depth-to-space interleave equals the transposed conv.

    Derivation: the transposed conv is a stride-1 correlation of the
    zero-stuffed input (lhs_dilation=s) with the SPATIALLY FLIPPED kernel
    at padding lo = hi = k-1 cropped to SAME; output position p = s*q + r
    only sees dilated taps t with (p - t) divisible by s, i.e. per output
    phase r the taps form the decimation flip(w)[(r + off) :: s]. Each
    phase is then a small stride-1 conv over the original grid; embedding
    every phase's taps into one kernel of span ceil((k + s - 1)/s) with a
    shared input window makes it ONE conv.
    """
    kd, kh, kw, c_out, c_in = w.shape
    sd, sh, sw = strides
    wf = w[::-1, ::-1, ::-1]  # spatial flip
    # lax.conv_transpose(SAME) correlates the s-dilated input with the
    # flipped kernel at lo-padding pad_a per _conv_transpose_padding:
    #   pad_len = k + s - 2; pad_a = k-1 if s > k-1 else ceil(pad_len/2).
    # Output p = s*q + r then reads dilated position t = p - pad_a + j,
    # nonzero only when s | t, giving input offset d = (j + r - pad_a)/s.

    def _pad_a(k, s):
        if s > k - 1:
            return k - 1
        return int(np.ceil((k + s - 2) / 2))

    pad_lo = _pad_a(kd, sd), _pad_a(kh, sh), _pad_a(kw, sw)

    def axis_taps(k, s, r, plo):
        """[(input offset d, kernel index j)] for output phase r."""
        taps = []
        for j in range(k):
            t = r - plo + j  # correlation reads z[p - plo + j]
            if t % s:
                continue
            taps.append((t // s, j))
        return taps

    # collect per-axis input-offset ranges to size the unified window
    ax = []
    for k, s, plo in zip((kd, kh, kw), (sd, sh, sw), pad_lo):
        per_phase = [axis_taps(k, s, r, plo) for r in range(s)]
        dmin = min(d for taps in per_phase for d, _ in taps)
        dmax = max(d for taps in per_phase for d, _ in taps)
        ax.append((per_phase, dmin, dmax))
    (pd, dmin_d, dmax_d), (ph, dmin_h, dmax_h), (pw, dmin_w, dmax_w) = ax

    span = (dmax_d - dmin_d + 1, dmax_h - dmin_h + 1, dmax_w - dmin_w + 1)
    w_sub = np.zeros(span + (c_in, sd * sh * sw * c_out), w.dtype)
    for rd in range(sd):
        for rh_ in range(sh):
            for rw_ in range(sw):
                phase = (rd * sh + rh_) * sw + rw_
                for dd, jd in pd[rd]:
                    for dh, jh in ph[rh_]:
                        for dw, jw in pw[rw_]:
                            w_sub[dd - dmin_d, dh - dmin_h, dw - dmin_w, :,
                                  phase * c_out:(phase + 1) * c_out] += \
                                wf[jd, jh, jw].T  # (C_out,C_in) -> (C_in,C_out)
    # conv pads: input window for q starts at q + dmin -> pad lo = -dmin
    pads = tuple((-dmin, (span_i - 1) + dmin)
                 for dmin, span_i in zip((dmin_d, dmin_h, dmin_w), span))
    return w_sub, pads


def subpixel_apply(x, w_sub, pads, strides, c_out):
    import jax.lax as lax
    import jax.numpy as jnp

    sd, sh, sw = strides
    y = lax.conv_general_dilated(
        x, jnp.asarray(w_sub), window_strides=(1, 1, 1), padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    b, d, h, wdim, _ = y.shape
    y = y.reshape(b, d, h, wdim, sd, sh, sw, c_out)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # interleave phases
    return y.reshape(b, d * sd, h * sh, wdim * sw, c_out)


RESULTS_PATH = os.path.join(HERE, "r4_subpixel_results.json")


def _persist(results):
    merged = {}
    try:
        with open(RESULTS_PATH) as f:
            merged = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    merged.update(results)
    tmp = RESULTS_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=2)
    os.replace(tmp, RESULTS_PATH)
    print(json.dumps(merged), flush=True)


def main(section=None):
    """One section per process (``--section ctrl|sub|maxdiff``): compiling a
    second large program while another's state is resident wedges the
    tunnel (the round-4 runs of this probe died exactly that way), and the
    maxdiff program's two-model diff OOMs at b120 (an HLO-temp copy pads
    C=16 to 128 lanes, 8x) — it runs at b24 instead; exactness at b-scale
    is batch-independent."""
    sys.path.insert(0, HERE)
    sys.path.insert(0, os.path.dirname(HERE))
    from bench_core import enable_compile_cache

    enable_compile_cache()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    results = {}

    # Liveness probe FIRST (wedge diagnosis: a tunnel-wedged process hangs
    # before this line; tests/test_subpixel.py carries the full exactness
    # matrix on CPU, so the on-device section below keeps only two cases).
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # Exactness matrix lives in tests/test_subpixel.py (6 kernel/stride
    # cases, gradients, bf16, cross-apply) — the on-device section keeps
    # only the bf16 maxdiff at the real shape to minimize tunnel exposure
    # (two wedges at ~50%/launch ate this probe's first two runs).
    rng = np.random.default_rng(0)

    # ---- TPU timing at the real convtd0 context ----
    from prostatemr_3d_cad_cspca_tpu.ops.convolution import (
        SubpixelConvTranspose)

    # b64 (not the headline's b120): the ISOLATED convT+IN program at b120
    # OOMs — 16.6G of 15.75G hbm; in the full net XLA fuses the IN into the
    # conv epilogue, standalone it materializes the fp32 intermediate. The
    # ctrl-vs-subpixel comparison is per-volume and batch-proportional.
    B, D, H, W = 64, 20, 80, 80
    c_in, c_out = 32, 16
    ks, st = (1, 3, 3), (1, 2, 2)
    xb = jnp.asarray(rng.normal(size=(B, D, H, W, c_in)), jnp.bfloat16)
    mod = nn.ConvTranspose(c_out, ks, st, transpose_kernel=True,
                           dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, D, H, W, c_in), jnp.bfloat16))
    # the real integrated module, cross-applied with the SAME params
    # (param trees are identical — tests/test_subpixel.py)
    smod = SubpixelConvTranspose(features=c_out, kernel_size=ks, strides=st,
                                 dtype=jnp.bfloat16)

    def in_lrelu(y):
        # the IN+LReLU that follows convtd0 in the decoder (SE block norm)
        mu = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
        var = jnp.var(y.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
        yn = (y.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(yn > 0, yn, 0.1 * yn).astype(jnp.bfloat16)

    ctrl = jax.jit(lambda p, v: in_lrelu(mod.apply(p, v)))
    sub = jax.jit(lambda p, v: in_lrelu(smod.apply(p, v)))

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out.ravel()[0])
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(6):
                out = fn(*args)
            jax.block_until_ready(out)
            np.asarray(out.ravel()[0])
            best = min(best, (time.perf_counter() - t) / 6)
        return best

    if section in (None, "maxdiff"):
        # exactness at the real channel/stride config (bf16 tolerance) at
        # b24 — the two-model diff program at b120 OOMs in an HLO-temp copy
        # that pads C=16 to 128 lanes (8x, attempt-1 log)
        xsmall = xb[:24]
        maxdiff = jax.jit(lambda p, v: jnp.max(jnp.abs(
            in_lrelu(mod.apply(p, v)).astype(jnp.float32) -
            in_lrelu(smod.apply(p, v)).astype(jnp.float32))))
        err = float(maxdiff(params, xsmall))
        results["tpu_maxdiff_bf16"] = err
        print(f"# tpu maxdiff (bf16, post-IN, b24): {err:.2e}",
              file=sys.stderr, flush=True)
        _persist(results)

    if section in (None, "ctrl"):
        dt_c = timed(ctrl, params, xb)
        results["convT_in_ms"] = round(dt_c * 1e3, 3)
        print(f"# convT+IN {dt_c*1e3:.2f} ms", file=sys.stderr, flush=True)
        _persist(results)

    if section in (None, "sub"):
        dt_s = timed(sub, params, xb)
        results["subpixel_in_ms"] = round(dt_s * 1e3, 3)
        print(f"# subpixel+IN {dt_s*1e3:.2f} ms", file=sys.stderr, flush=True)
        _persist(results)

    try:
        with open(RESULTS_PATH) as f:
            merged = json.load(f)
        if "convT_in_ms" in merged and "subpixel_in_ms" in merged:
            merged["speedup"] = round(
                merged["convT_in_ms"] / merged["subpixel_in_ms"], 3)
            _persist(merged)
            print(f"# speedup {merged['speedup']}x", file=sys.stderr,
                  flush=True)
    except (OSError, json.JSONDecodeError):
        pass


if __name__ == "__main__":
    sec = None
    if "--section" in sys.argv:
        sec = sys.argv[sys.argv.index("--section") + 1]
    main(section=sec)
