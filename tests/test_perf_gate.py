"""Performance regression gate (SURVEY.md section 4.5 / N4): the bench
harness must FAIL LOUDLY when a kernel or plan regression lands.

TPU-only (the numbers are meaningless on the CPU-interpret lane). The
floor is ~20% under the steady headline (14.7-15.0k img/s as of round
2) so relay-pool variance (+-15% across processes) cannot trip it,
while a real regression — e.g. losing the fused stem (would drop to
~12.3k) or the fold strategy (~8k) — still fails.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="perf floors are only meaningful on real TPU hardware")


def test_headline_throughput_floor():
    import jax.numpy as jnp
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
    from dnn_inference_engine_tpu.runtime.engine import Engine

    batch = 32
    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", batch=batch)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 416, 416, 3)), jnp.uint8)
    fwd = lambda xx: eng._fwd(eng.exec_params, xx)
    t = per_iter_time(fwd, (x,), iters_hi=60, iters_lo=10, reps=3,
                      stat="min")
    imgs_per_s = batch / t
    # round-5 ratchet (round-4 verdict weak #3): floor 12k was set at a
    # 14.7k steady state in round 2; driver now captures 15.7k. 13.3k
    # holds the same ~15% relay-variance margin against today's numbers
    # while a regression eating the round-3+4 gains (~8%) now fails.
    assert imgs_per_s > 13_300, (
        f"headline W8A8 batch-32 forward regressed: {imgs_per_s:.0f} "
        f"img/s < 13.3k floor ({t*1e3:.3f} ms/batch)")


def test_batch1_detect_latency_ceiling():
    """Batch-1 FULL detect (forward + decode + fixpoint NMS) device
    ceiling — the round-5 headline latency win and the per-batch
    strategy pins behind it (round-4 verdict task 1 + weak #3: a lost
    _BATCH_STRATEGIES entry previously failed no perf test).

    Measured 0.237 ms min (nms_topk=256; tools/ab_nms.py). 0.32 ms
    keeps ~35% relay-variance margin while the round-4 formulation
    (0.459 ms) and an unswept b1 plan (forward alone ~0.69 ms) both
    demonstrably fail."""
    import jax.numpy as jnp
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
    from dnn_inference_engine_tpu.runtime.engine import Engine

    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", batch=1)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, 416, 416, 3)), jnp.uint8)
    detect = eng.detect_fn()
    t = per_iter_time(lambda xx: detect(eng.exec_params, xx), (x,),
                      stat="min")
    assert t * 1e3 < 0.32, (
        f"batch-1 full detect regressed: {t*1e3:.3f} ms (> 0.32 ceiling; "
        "round-5 steady state is ~0.24 ms)")


def test_stage_roofline_floor():
    """The executed-stage report must keep the GEMM-bound tail (conv7 =
    L12, conv8 = L13) at roofline-grade efficiency, now asserted against
    each stage's BINDING roofline (max of its MXU floor and HBM-traffic
    floor — round-3 verdict weak #6: plain MFU is only auditable for
    MXU-bound stages). Ceiling 105% (beyond-peak numbers mean the TIMING
    regressed — the round-2 failure this gate catches); no vacuous None
    branch; whole plan under a total-ms ceiling.

    Floors: conv7 >= 95 (measures 97.4); conv8 >= 92 — its measured
    plateau is 93.8% of the MXU bound, the im2col+GEMM tier loses
    (sweep rows L13: 2.83 vs 2.01 ms whole-net), and in production it
    fuses with conv9 (one XLA fusion, trace-verified 276.6 us vs a
    261.9 us combined floor = 94.7%) — the remaining ~5-6% is the
    emitter's epilogue/edge cost, recorded here rather than chased."""
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine

    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", batch=32)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    rep = eng.stage_times(batch=32)     # auto-scaled iteration counts
    total = sum(r["ms"] for r in rep)
    # round-5 ratchet: measured 1.66 ms; the old 2.6 ceiling predated
    # the round-3/4 wins (round-4 verdict weak #3)
    assert total < 2.2, f"executed stages total {total:.2f} ms (> 2.2)"
    for r in rep:
        resolved_s = r["ms"] * (r["iters"][0] - r["iters"][1]) / 1e3
        if not r["sub_resolution"] and resolved_s >= 0.1:
            # timing sanity: only stages that resolved >= 100 ms of
            # device work order tightly enough for a hard >peak check
            # (the auto-scaler caps at 2000 iters, so ~30 us stages
            # resolve less and can read a few % above peak in noise)
            assert r["pct_of_binding"] <= 105, r
    for lname, floor in (("L12", 95.0), ("L13", 92.0)):
        r = next(s for s in rep if s["name"].startswith(lname))
        assert not r["sub_resolution"], (
            f"{lname} must resolve at auto-scaled iters, got {r}")
        assert r["binding"] == "mxu", r    # tail convs are compute-bound
        assert r["pct_of_binding"] is not None \
            and floor < r["pct_of_binding"] <= 105, r
        assert r["mfu_pct"] is not None and 70 < r["mfu_pct"] <= 105, r
        assert not r["suspect"], r


def test_in_context_trace_floors():
    """IN-CONTEXT gate from the xplane trace (round-4 verdict weak #2 /
    task 3: the isolated stage gates missed in-context-only cost like
    the conv2 boundary seam, 598 us in-context vs 141 isolated).
    Device-side timestamps make these numbers immune to relay noise
    AND to other processes on the shared pool (op durations measure
    execution, not queueing). Round-4 reference points
    (docs/TRACE_ATTRIB_r04.json, batch 32):

    - module 2.237 ms; front end (L0+L2+L4 scopes + every unattributed
      bucket, dominated by boundary copies) 1.643 ms — ceiling 1.80
      fails if a toolchain/layout change silently reopens the seam;
    - conv7 (L12) 139.5 us vs its 129.3 us MXU floor (2*797.4M MACs *
      32 / 394.7 TOPS) = 92.7% -> floor 88%;
    - conv8+conv9 fuse into one op (276.6 us vs a 261.9 us combined
      floor = 94.7%) -> floor 90% on the combined scopes.
    """
    import jax.numpy as jnp
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.profiling import (
        trace_attribution)

    batch = 32
    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", batch=batch)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    x = eng._bench_input(batch)
    art = trace_attribution(jax.jit(eng._fwd), eng.exec_params, x, runs=30)
    scopes = art["by_scope_us"]

    import re

    def us_of(*layers):
        # match the stage scope's _L<li> tag exactly (suffix or
        # followed by a non-digit, so L1 never matches L12)
        pats = [re.compile(rf"_L{li}(?:\D|$)") for li in layers]
        return sum(v for k, v in scopes.items()
                   if any(p.search(k) for p in pats))

    module_ms = art["module_device_us_per_run"] / 1e3
    assert module_ms < 2.55, (
        f"whole-forward module device time {module_ms:.3f} ms (> 2.55; "
        f"round-4/5 steady state ~2.24) — scopes: {scopes}")
    front_us = (us_of(0, 2, 4)
                + sum(v for k, v in scopes.items()
                      if k.startswith("unattributed/")))
    assert front_us < 1800, (
        f"front end (L0+L2+L4 + unattributed) {front_us:.0f} us in "
        f"context (> 1800): the boundary seam reopened — scopes: {scopes}")

    v5e_tops = 394.7e12
    conv7_floor_us = 2 * 797.4e6 * batch / v5e_tops * 1e6
    conv7_us = us_of(12)
    assert conv7_us > 0 and conv7_floor_us / conv7_us >= 0.88, (
        f"conv7 in-context {conv7_us:.1f} us vs {conv7_floor_us:.1f} "
        f"floor ({100*conv7_floor_us/max(conv7_us,1e-9):.1f}% < 88%)")
    tail_floor_us = 2 * (1594.9e6 + 21.6e6) * batch / v5e_tops * 1e6
    tail_us = us_of(13, 14)
    assert tail_us > 0 and tail_floor_us / tail_us >= 0.90, (
        f"conv8+conv9 in-context {tail_us:.1f} us vs {tail_floor_us:.1f} "
        f"floor ({100*tail_floor_us/max(tail_us,1e-9):.1f}% < 90%)")
