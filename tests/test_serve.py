"""Continuous-batching serving loop tests (SURVEY.md N1)."""

import threading
import time

import numpy as np
import pytest

from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher


class FakeEngine:
    """Deterministic stand-in: returns the per-image mean as 'score'."""

    def __init__(self, max_batch=4, delay=0.0):
        self.config = EngineConfig(serve_max_batch=max_batch,
                                   serve_timeout_ms=20.0, input_size=8)
        self.delay = delay
        self.batch_sizes = []

    def detect(self, x):
        self.batch_sizes.append(x.shape[0])
        assert x.dtype == np.uint8          # batcher ships uint8
        if self.delay:
            time.sleep(self.delay)
        n = x.shape[0]
        xf = x.astype(np.float32) / 255.0
        boxes = np.zeros((n, 4, 4), np.float32)
        scores = xf.reshape(n, -1).mean(axis=1, keepdims=True).repeat(4, 1)
        classes = np.zeros((n, 4), np.int32)
        return boxes, scores, classes

    def detect_device(self, x):
        # same contract as Engine.detect_device: results the batcher may
        # np.asarray later (numpy results pass through unchanged)
        return self.detect(x)


def test_single_request_roundtrip():
    eng = FakeEngine()
    b = ContinuousBatcher(eng).start()
    try:
        img = np.full((8, 8, 3), 0.5, np.float32)
        boxes, scores, classes = b.infer(img, timeout=5)
        np.testing.assert_allclose(scores, 0.5, atol=1.0 / 255.0)
    finally:
        b.stop()


def test_batch_assembly_and_routing():
    """Concurrent requests get batched; each future resolves to ITS image's
    result (routing correctness)."""
    eng = FakeEngine(max_batch=4, delay=0.01)
    b = ContinuousBatcher(eng).start()
    try:
        vals = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
        futs = [b.submit(np.full((8, 8, 3), v, np.float32)) for v in vals]
        results = [f.result(timeout=10) for f in futs]
        for v, (_bx, sc, _cl) in zip(vals, results):
            np.testing.assert_allclose(sc, v, atol=1.0 / 255.0)
        # device batches are padded to the compiled max_batch (static shape)
        assert all(s == 4 for s in eng.batch_sizes)
        st = b.stats()
        assert st["images"] == len(vals)
        assert st["batches"] >= 2          # 6 requests / max_batch 4
    finally:
        b.stop()


def test_stats_and_error_propagation():
    eng = FakeEngine()
    b = ContinuousBatcher(eng).start()
    try:
        b.infer(np.zeros((8, 8, 3), np.float32), timeout=5)
        st = b.stats()
        assert st["images"] == 1
        assert st["p50_ms"] is not None and st["p50_ms"] >= 0

        def boom(x):
            raise RuntimeError("device fell over")
        eng.detect = boom
        fut = b.submit(np.zeros((8, 8, 3), np.float32))
        with pytest.raises(RuntimeError, match="device fell over"):
            fut.result(timeout=5)
    finally:
        b.stop()


def test_real_engine_serving(rng):
    """End-to-end: real small engine behind the batcher."""
    from dnn_inference_engine_tpu.runtime.engine import Engine
    eng = Engine(EngineConfig(model="yolov2-tiny", mode="fp32", input_size=64,
                              serve_max_batch=2)).load_weights().prepare()
    b = ContinuousBatcher(eng).start()
    try:
        futs = [b.submit(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
                for _ in range(3)]
        for f in futs:
            boxes, scores, classes = f.result(timeout=120)
            assert boxes.shape == (128, 4)
    finally:
        b.stop()


def test_http_stats_endpoint():
    import json
    import urllib.request
    eng = FakeEngine()
    b = ContinuousBatcher(eng).start()
    srv = b.serve_http(port=18473)
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:18473/stats", timeout=5) as r:
            st = json.loads(r.read())
        assert "images_per_s" in st
        with urllib.request.urlopen(
                "http://127.0.0.1:18473/healthz", timeout=5) as r:
            assert json.loads(r.read())["ok"]
    finally:
        srv.shutdown()
        b.stop()


def test_uint8_roundtrip_tolerance():
    """f32 [0,1] images survive the uint8 wire format within 1/255."""
    rng = np.random.default_rng(5)
    eng = FakeEngine()
    b = ContinuousBatcher(eng).start()
    try:
        img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        _bx, sc, _cl = b.infer(img, timeout=5)
        np.testing.assert_allclose(sc, img.mean(), atol=1.0 / 255.0)
    finally:
        b.stop()
