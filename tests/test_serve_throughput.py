"""Serve-throughput regression gate (round-3 verdict weak #4 / task 4):
a revert of the batcher's depth-1 pipelining must fail CI, and
steady-state throughput must clear an absolute floor (a uint8-wire or
dispatch regression shows up there).

TPU-lane only. The first version raced a pipelined batcher against a
serialized control and asserted a 1.1x win — through the sandbox relay
that margin flips run-to-run (89.8 vs 97.2 one run, 112 vs 64 the
next): the relay's RTT variance is larger than the pipelining win at
gate-friendly image sizes. The pipelining property is therefore
asserted STRUCTURALLY instead: with a saturated queue, the depth-1
pipeline dispatches batch n+1 BEFORE resolving batch n — the event
order contains two consecutive dispatches — which is impossible for a
serialized loop (strictly alternating dispatch/resolve). Deterministic,
noise-free, and exactly what a revert changes.
"""

import time

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="serve throughput floors are only meaningful on real hardware")


def test_batcher_pipelines_dispatch_ahead_and_clears_floor():
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher

    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", input_size=64,
                              serve_max_batch=8)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
              for _ in range(160)]

    events = []                    # appended only by the loop thread
    orig_detect = eng.detect_device
    eng.detect_device = lambda x: (events.append("d"),
                                   orig_detect(x))[1]
    b = ContinuousBatcher(eng, max_batch=8, timeout_ms=0.5)
    orig_resolve = b._resolve
    b._resolve = lambda p: (events.append("r"), orig_resolve(p))[1]
    b.start()
    try:
        b.infer(images[0], timeout=300.0)          # warm/compile
        t0 = time.perf_counter()
        futs = [b.submit(img) for img in images]
        for f in futs:
            f.result(timeout=300.0)
        dt = time.perf_counter() - t0
    finally:
        b.stop()
    throughput = len(images) / dt

    # (a) STRUCTURAL pipelining: some batch was dispatched before the
    # previous batch's results were resolved. A serialized loop emits
    # strictly alternating d r d r ... and can never produce "dd".
    trace = "".join(events)
    assert "dd" in trace, (
        f"depth-1 pipelining is gone: dispatch/resolve order {trace!r} "
        "is strictly serialized")
    # (b) absolute floor, generous to relay-pool variance: well over one
    # 8-image batch per two ~25 ms round trips
    assert throughput > 40, (
        f"steady-state serve throughput collapsed: {throughput:.1f} "
        "img/s at 64 px (floor 40)")
