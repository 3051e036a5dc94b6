"""Round-5 probe: reduced-precision (int8 / fp8) conv feasibility on the chip.

The cfg1 inference program is HBM-bound (AI ~109 FLOP/byte < the ~271
ridge; docs/ATTRIBUTION.md), so the remaining headline lever after the
round-4/5 layout campaign is the BYTE STREAM itself: int8 (or fp8)
activations+weights halve every tensor's HBM traffic vs bf16, and this
chip class (measured 711 GB/s stream, 192.6 TFLOP/s bf16 matmul ≈ v5e)
advertises 2x MXU rate for int8. IN-standardized activations are
quantization-friendly (post-IN ranges ~[-6, 6]).

Questions this probe answers BEFORE any framework work:
  q1  does XLA-on-this-TPU compile+run s8xs8->s32 conv_general_dilated at
      the model's 3-D shapes at all?
  q2  measured speed vs the identical bf16 conv (same shapes, same layout)
      — both for a FLOP-heavy conv (C=64) and a traffic-heavy low-channel
      stem conv (C=16)
  q3  same for fp8 (e4m3 / e5m2) if the platform takes it
  q4  a quantize->conv->dequant->IN-ish chain: does the conversion pair
      fuse into neighbours (traffic halved) or materialize extra passes?

Run on the chip:  python benchmarks/r5_probe_quant.py
Writes benchmarks/r5_quant_results.json (merge-on-write).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
from bench_core import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_quant_results.json")


def _sync(out):
    # block_until_ready alone does NOT force execution through the axon
    # tunnel (async enqueue resolves early for small outputs): fetch a
    # scalar reduction of the output.
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def _best_of(f, *args, n=3, iters=5):
    out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def _flush(results):
    prev = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
    prev.update(results)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


DN = ("NDHWC", "DHWIO", "NDHWC")


def conv(x, k, acc):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=DN, preferred_element_type=acc)


def main():
    results = {}
    dev = jax.devices()[0]
    results["device"] = str(dev.device_kind)
    print(f"# device: {dev.device_kind}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    # (name, batch, spatial, cin, cout, ksize) — cfg1's two traffic regimes
    cases = [
        ("enc64", 32, (20, 40, 40), 64, 64, (3, 3, 3)),    # FLOP-heavy
        ("stem16", 32, (20, 160, 160), 16, 16, (1, 3, 3)),  # traffic-heavy
    ]
    for name, b, sp, cin, cout, ks in cases:
        xs = rng.normal(size=(b, *sp, cin)).astype(np.float32)
        ws = (rng.normal(size=(*ks, cin, cout)) / np.sqrt(
            cin * np.prod(ks))).astype(np.float32)
        # conservative per-tensor symmetric scales
        sx, sw = np.abs(xs).max() / 127.0, np.abs(ws).max() / 127.0
        gb_bf16 = 2 * (xs.size + ws.size + b * np.prod(sp) * cout) / 1e9
        flops = 2 * b * np.prod(sp) * np.prod(ks) * cin * cout

        x16 = jnp.asarray(xs, jnp.bfloat16)
        w16 = jnp.asarray(ws, jnp.bfloat16)
        _sync(x16)
        print(f"# {name}: inputs staged", file=sys.stderr, flush=True)
        f16 = jax.jit(lambda x, w: conv(x, w, jnp.float32))
        try:
            dt, _ = _best_of(f16, x16, w16)
            results[f"{name}_bf16_ms"] = round(dt * 1e3, 3)
            results[f"{name}_bf16_gbps"] = round(gb_bf16 / dt, 1)
            results[f"{name}_bf16_tflops"] = round(flops / dt / 1e12, 2)
            print(f"# {name} bf16 {dt*1e3:.2f} ms "
                  f"({gb_bf16/dt:.0f} GB/s, {flops/dt/1e12:.1f} TF/s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_bf16_error"] = repr(e)[:300]
        _flush(results)

        # ---- q1/q2: int8 conv, s32 accum, requant in-graph --------------
        xq = jnp.asarray(np.clip(np.round(xs / sx), -127, 127), jnp.int8)
        wq = jnp.asarray(np.clip(np.round(ws / sw), -127, 127), jnp.int8)

        def fq(x, w):
            y = conv(x, w, jnp.int32)
            return (y.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)

        try:
            dt, _ = _best_of(jax.jit(fq), xq, wq)
            gb = gb_bf16 / 2 + b * np.prod(sp) * cout * 1 / 1e9  # int8 in, bf16 out
            results[f"{name}_int8_ms"] = round(dt * 1e3, 3)
            results[f"{name}_int8_tflops"] = round(flops / dt / 1e12, 2)
            results[f"{name}_int8_speedup_vs_bf16"] = round(
                results[f"{name}_bf16_ms"] / results[f"{name}_int8_ms"], 3)
            print(f"# {name} int8 {dt*1e3:.2f} ms "
                  f"({flops/dt/1e12:.1f} TF/s, "
                  f"x{results[f'{name}_int8_speedup_vs_bf16']})",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_int8_error"] = repr(e)[:300]
            print(f"# {name} int8 REJECTED: {repr(e)[:160]}",
                  file=sys.stderr, flush=True)
        _flush(results)

        # ---- q3: fp8 variants ------------------------------------------
        for fpname, fpdt in (("e4m3", jnp.float8_e4m3fn),
                             ("e5m2", jnp.float8_e5m2)):
            try:
                x8 = x16.astype(fpdt)
                w8 = w16.astype(fpdt)
                f8 = jax.jit(lambda x, w: conv(x, w, jnp.float32)
                             .astype(jnp.bfloat16))
                dt, _ = _best_of(f8, x8, w8)
                results[f"{name}_{fpname}_ms"] = round(dt * 1e3, 3)
                results[f"{name}_{fpname}_speedup_vs_bf16"] = round(
                    results[f"{name}_bf16_ms"]
                    / results[f"{name}_{fpname}_ms"], 3)
                print(f"# {name} {fpname} {dt*1e3:.2f} ms "
                      f"(x{results[f'{name}_{fpname}_speedup_vs_bf16']})",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                results[f"{name}_{fpname}_error"] = repr(e)[:300]
                print(f"# {name} {fpname} REJECTED: {repr(e)[:160]}",
                      file=sys.stderr, flush=True)
            _flush(results)

    # ---- q4: fused chain — does quantize/dequant fuse or materialize? ---
    # conv -> IN-normalize -> relu -> REQUANTIZE to int8 storage, reading
    # int8 input. If XLA fuses the converts, the chain's HBM bytes are
    # ~half the bf16 chain's and time should track.
    name, b, sp, cin, cout, ks = cases[1]
    xs = rng.normal(size=(b, *sp, cin)).astype(np.float32)
    ws = (rng.normal(size=(*ks, cin, cout)) / np.sqrt(
        cin * np.prod(ks))).astype(np.float32)
    sx = np.abs(xs).max() / 127.0
    sw = np.abs(ws).max() / 127.0

    def chain16(x, w):
        y = conv(x, w, jnp.float32)
        m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        v = jnp.mean(jnp.square(y), axis=(1, 2, 3), keepdims=True) - m * m
        y = (y - m) * jax.lax.rsqrt(v + 1e-5)
        return jnp.maximum(y, 0).astype(jnp.bfloat16)

    def chain8(x, w):
        y = conv(x, w, jnp.int32).astype(jnp.float32) * (sx * sw)
        m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        v = jnp.mean(jnp.square(y), axis=(1, 2, 3), keepdims=True) - m * m
        y = (y - m) * jax.lax.rsqrt(v + 1e-5)
        y = jnp.maximum(y, 0)
        # post-IN+relu range is [0, ~6): fixed requant scale 6/127
        return jnp.clip(jnp.round(y * (127.0 / 6.0)), -127, 127
                        ).astype(jnp.int8)

    x16 = jnp.asarray(xs, jnp.bfloat16)
    w16 = jnp.asarray(ws, jnp.bfloat16)
    xq = jnp.asarray(np.clip(np.round(xs / sx), -127, 127), jnp.int8)
    wq = jnp.asarray(np.clip(np.round(ws / sw), -127, 127), jnp.int8)
    try:
        dt16, _ = _best_of(jax.jit(chain16), x16, w16)
        results["chain_bf16_ms"] = round(dt16 * 1e3, 3)
        dt8, _ = _best_of(jax.jit(chain8), xq, wq)
        results["chain_int8_ms"] = round(dt8 * 1e3, 3)
        results["chain_int8_speedup"] = round(dt16 / dt8, 3)
        print(f"# chain bf16 {dt16*1e3:.2f} ms vs int8 {dt8*1e3:.2f} ms "
              f"(x{dt16/dt8:.2f})", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        results["chain_error"] = repr(e)[:300]
        print(f"# chain REJECTED: {repr(e)[:160]}", file=sys.stderr,
              flush=True)
    _flush(results)
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
