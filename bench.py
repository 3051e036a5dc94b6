"""Headline benchmark orchestrator. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Covers the full BASELINE.json config list (VERDICT.md round-2 item 5):
  1. plain attention U-Net inference (headline: volumes/sec/chip) + MFU
  2. dense-skip + deep-supervision inference (b4 per BASELINE wording)
  3. hierarchical probabilistic MC posterior sampling
  4. full training step (focal+KL, fused on-device augmentation, CALR)
  5. sliding-window whole-gland full-resolution inference

Each config family runs in its OWN subprocess: the experimental device
tunnel wedges when a new large program compiles while another config's
state is resident (observed round 1), and only one process may hold the
chip. Runs on the real TPU — do NOT set JAX_PLATFORMS=cpu.

vs_baseline compares against the measured TF-CPU reference throughput
(benchmarks/baseline_tf_cpu.json, produced by benchmarks/tf_cpu_baseline.py
— the reference publishes no numbers of its own, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _run_worker(argv, timeout=2400):
    """Run a bench worker; return its last parseable JSON line (or {})."""
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, *argv], capture_output=True, text=True,
                timeout=timeout, cwd=HERE, env=env)
        except subprocess.TimeoutExpired:
            print(f"# worker {argv} timed out", file=sys.stderr, flush=True)
            continue
        sys.stderr.write(proc.stderr[-3000:])
        for line in proc.stdout.strip().splitlines()[::-1]:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
        print(f"# worker {argv} produced no JSON (rc={proc.returncode})",
              file=sys.stderr, flush=True)
        time.sleep(15)  # let the device settle before a retry
    return {}


def main():
    detail = {}

    detail.update(_run_worker([os.path.join(HERE, "benchmarks", "bench_core.py")]))
    ext = os.path.join(HERE, "benchmarks", "extended_bench.py")
    for cfg in ("config3", "config4", "config4b", "config5", "config5b"):
        time.sleep(10)
        detail.update(_run_worker([ext, "--only", cfg], timeout=1500))

    headline = max(
        (v for k, v in detail.items()
         if k.startswith("cfg1_") and isinstance(v, (int, float))
         and ("_b" in k)), default=0.0)

    vs_baseline = None
    baseline_path = os.path.join(HERE, "benchmarks", "baseline_tf_cpu.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("volumes_per_sec"):
            vs_baseline = headline / float(base["volumes_per_sec"])

    print(json.dumps({
        "metric": "bpMRI volumes/sec/chip (M1 20x160x160x3 inference)",
        "value": round(headline, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
