"""NON-PRODUCTION kernels: real, tested, documented-negative-result
implementations that measurably LOSE their A/B against the production
tiers and are wired to no default plan (round-2 verdict weak #5 /
next-round task 9 — quarantined so the default import graph carries no
dead kernel).

- ``pallas_stage0``: the v1/v2 fused stems. Superseded by the one-kernel
  ``ops.pallas_conv.stem_fused_k2`` (plan kind ``stem_rs``); the 's0'
  plan kind still runs it for A/B (recorded verdict: runtime/plan.py
  ``_YOLOV2_STRATEGY`` round-2b notes — stem_rs 0.67-0.73 ms vs s0's
  formulation losing at every other shape).
- ``pallas_tail``: batched shift-GEMM tail conv (``conv2d_w8a8_bt``).
  Recorded verdict: loses to XLA's int8 conv emitter at the 13x13/26x26
  tail shapes (runtime/plan.py strategy notes: XLA 76-95% MFU in-graph);
  not a plan kind.

Executable A/B records: tests/test_plan.py::test_stage_times-driven
sweeps now live in the plan-sweep tool (``cli plan-sweep``), which
re-measures these verdicts on demand rather than trusting prose.
"""
