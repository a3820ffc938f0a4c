"""Serve-throughput regression gate (round-3 verdict weak #4 / task 4):
the continuous batcher's depth-1 pipelining must demonstrably beat a
serialized dispatch loop, and steady-state throughput must clear an
absolute floor — so a pipelining revert (or a uint8-wire regression
inflating transfers) fails CI instead of passing silently.

TPU-lane only. Runs at 64 px so the measurement is dominated by what the
pipeline actually hides — per-step dispatch/sync round trips (~25 ms
each through the sandbox relay; PCIe latencies in production) — rather
than by the relay's pathological bulk-transfer bandwidth
(docs/RELAY.md), which would drown both variants in noise at 416 px.
"""

import time

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="serve throughput floors are only meaningful on real hardware")


def _drive(eng, images, serialized=False):
    from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher

    if serialized:
        # the no-pipelining control: same collect/assemble code path,
        # but every batch is dispatched AND resolved before the next is
        # collected (what reverting the depth-1 pipeline would do)
        class NoPipe(ContinuousBatcher):
            def _loop(self):
                size = self.engine.config.input_size
                while not self._stop.is_set():
                    batch = self._collect()
                    if not batch:
                        continue
                    x = np.zeros((self.max_batch, size, size, 3), np.uint8)
                    for i, (img, _f, _t) in enumerate(batch):
                        x[i] = img
                    try:
                        res = self.engine.detect_device(x)
                    except Exception as e:      # noqa: BLE001
                        for _img, fut, _t in batch:
                            fut.set_exception(e)
                        continue
                    self._resolve((batch, res))  # sync HERE: no overlap
        cls = NoPipe
    else:
        cls = ContinuousBatcher
    b = cls(eng, max_batch=8, timeout_ms=0.5).start()
    try:
        b.infer(images[0], timeout=300.0)          # warm/compile
        t0 = time.perf_counter()
        futs = [b.submit(img) for img in images]
        for f in futs:
            f.result(timeout=300.0)
        dt = time.perf_counter() - t0
    finally:
        b.stop()
    return len(images) / dt


def test_batcher_pipelining_beats_serialized_and_clears_floor():
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine

    eng = Engine(EngineConfig(model="yolov2-tiny", mode="w8a8",
                              kernel="auto", input_size=64,
                              serve_max_batch=8)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
              for _ in range(160)]

    pipelined = _drive(eng, images)
    serialized = _drive(eng, images, serialized=True)

    # (a) pipelining must win: the depth-1 dispatch overlaps the next
    # batch's assembly+H2D with the previous batch's execution+D2H sync
    assert pipelined > serialized * 1.1, (
        f"depth-1 pipelining no longer beats serialized dispatch: "
        f"{pipelined:.1f} vs {serialized:.1f} img/s — the pipeline or "
        f"the uint8 wire path regressed")
    # (b) absolute floor, generous to relay-pool variance: the batcher
    # must sustain well over one 8-image batch per two round trips
    assert pipelined > 60, (
        f"steady-state serve throughput collapsed: {pipelined:.1f} "
        "img/s at 64 px (floor 60)")
