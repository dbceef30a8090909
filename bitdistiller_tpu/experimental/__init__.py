"""Measured-but-losing alternatives, kept OUT of the default import graph.

Each module here is parity-tested and was benchmarked on real v5e hardware
against the shipping path — and lost (numbers in NOTES_NEXT_ROUND.md /
PARITY.md). They stay importable for re-testing on new hardware or Mosaic
releases, behind explicit opt-ins:

- flash_decode: first-generation per-layer Pallas online-softmax decode
  attention. Whole-model 23.7 ms vs 14.8 ms for XLA's two-piece attention at
  7B cache-2048 on v5e; superseded by the stacked kernel
  (ops/decode_attention.py), which owns the hot path. RETIRED to tests-only
  (tests/test_pallas_kernels.py) — no model wiring remains.
- fused_mlp: single-launch gate/up/down Pallas MLP. The 4-launch XLA path
  measured faster at decode shapes. Opt-in: direct import (no model hook).

The W2A8 int8-MXU matmul variant (quant_matmul.py, BITDISTILLER_QMM_A8=1)
and the speculative round pipelining (Engine(pipeline_rounds=True)) are the
other two measured alternatives; they live with their shipping counterparts
because they share >90% of their code paths.
"""
