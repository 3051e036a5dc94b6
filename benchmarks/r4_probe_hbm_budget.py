"""Round-4 HBM budget for the cfg1 batch knee (VERDICT r3 item 4).

"Measured knee >b144, or a written HBM budget showing b128 is the true
ceiling." This probe asks the XLA compiler itself: lower + compile the
fgout inference program (bf16, foreground-channel-only output — the
round-3 headline configuration) at b128 / b136 / b144 and record each
executable's `memory_analysis()` (argument + output + temp + generated
code bytes against the chip's HBM). A size that exceeds the device
capacity surfaces as a compile-time RESOURCE_EXHAUSTED, which is
recorded verbatim — that IS the budget statement.

Compile-only (no execution) except b128, which validates the analysis
against the known-good headline point. b128 is compile-cache-warm from
bench runs; larger points pay one cold compile each (~200-475 s on this
tunnel), so the probe prints incremental JSON after every point.

Emits benchmarks/r4_hbm_budget_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    sys.path.insert(0, HERE)
    sys.path.insert(0, os.path.dirname(HERE))
    from bench_core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    results = {"device": str(dev.device_kind)}
    try:
        stats = dev.memory_stats() or {}
        results["hbm_capacity_gb"] = round(
            stats.get("bytes_limit", 0) / 1e9, 2)
    except Exception:  # noqa: BLE001 — memory_stats is platform-optional
        pass
    print(json.dumps(results), flush=True)

    m1 = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, dtype=jnp.bfloat16)
    net, params = m1.net, m1.params

    def detect(p, v):
        # foreground channel only — the fgout headline program
        return net.apply({"params": p}, v, train=False)["y_softmax"][..., 1:2]

    for B in (128, 136, 144):
        tag = f"b{B}"
        spec_v = jax.ShapeDtypeStruct((B, 20, 160, 160, 3), jnp.bfloat16)
        t0 = time.perf_counter()
        try:
            compiled = jax.jit(detect).lower(params, spec_v).compile()
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED expected
            msg = str(e)
            results[f"{tag}_compile_error"] = msg[:400]
            print(f"# {tag}: compile FAILED after "
                  f"{time.perf_counter()-t0:.0f}s: {msg[:200]}",
                  file=sys.stderr, flush=True)
            print(json.dumps(results), flush=True)
            continue
        dt = time.perf_counter() - t0
        try:
            ma = compiled.memory_analysis()
            results[f"{tag}_mem_gb"] = {
                "argument": round(ma.argument_size_in_bytes / 1e9, 3),
                "output": round(ma.output_size_in_bytes / 1e9, 3),
                "temp": round(ma.temp_size_in_bytes / 1e9, 3),
                "code": round(ma.generated_code_size_in_bytes / 1e9, 3),
                "alias": round(ma.alias_size_in_bytes / 1e9, 3),
                "total": round(
                    (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes
                     + ma.generated_code_size_in_bytes
                     - ma.alias_size_in_bytes) / 1e9, 3),
            }
        except Exception as e:  # noqa: BLE001
            results[f"{tag}_mem_error"] = str(e)[:200]
        print(f"# {tag}: compiled in {dt:.0f}s -> "
              f"{results.get(f'{tag}_mem_gb')}", file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)
        if B == 128:
            # validate against the known-good headline point
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.normal(size=(B, 20, 160, 160, 3)),
                            jnp.bfloat16)
            jax.block_until_ready(compiled(params, x))
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                out = compiled(params, x)
                jax.block_until_ready(out)
                # fetch one value: on this platform block_until_ready can
                # return before the dispatch completes (docs/ROUND4_NOTES.md)
                np.asarray(out.ravel()[0])
                best = min(best, time.perf_counter() - t)
            results["b128_vols_per_sec"] = round(B / best, 1)
            print(f"# b128 executes: {B/best:.1f} vol/s",
                  file=sys.stderr, flush=True)
            print(json.dumps(results), flush=True)

    with open(os.path.join(HERE, "r4_hbm_budget_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
