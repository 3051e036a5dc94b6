"""Pallas TPU kernels.

Round-2 finding (VERDICT.md item 6, measurements in docs/ROUND2_NOTES.md
and benchmarks/r2_probe_pallas_mxu.py): on this stack — Mosaic targeting
the advertised v5e ISA over a remote-compile tunnel — hand-written kernels
for the M1 hot chains could not beat XLA's own fusion:

  * the fused IN+LReLU kernel measured slower than XLA's stats+apply
    fusion at every M1 shape (round 1: 11.2 ms vs 4.5 ms at the stem) and
    was deleted rather than kept as dead weight;
  * a streaming im2col packed-conv kernel (pl.Element halo windows,
    lane-aligned W-taps, single deep-K MXU pass) reached 62 TFLOP/s,
    bit-exact vs the XLA conv, but XLA's packed conv runs at 109 TFLOP/s.

The TPU-native perf path therefore lives in XLA-level restructurings
(ops/packing.py, models/m1_packed.py, batch scaling) — see
docs/ROUND2_NOTES.md for the full measurement log. The probe kernels are
kept under benchmarks/ as the qualification harness for future Mosaic
toolchains.

Re-qualified 2026-08-19 (round 4, VERDICT r3 item 8): on the current
toolchain the streaming packed-conv kernel (r2_probe_pallas_mxu.py)
sustains 46.4/47.6 TFLOP/s at th=16/32 (was 62 in round 2), still bit-
consistent with the XLA conv but under half of XLA's ~109 TFLOP/s packed
conv — the rejection stands. Note the round-4 attribution finding
(docs/ATTRIBUTION.md): the model is HBM-bound, so a Pallas win would have
to come from cross-op traffic reduction, and the measured conv+IN block
already runs at 1.24x its own HBM roofline — bounding any fused-kernel
upside for that chain to ~24%.
"""
