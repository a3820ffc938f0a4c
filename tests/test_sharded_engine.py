"""End-to-end sharded Engine tests (SURVEY.md N1/N2; BASELINE config 5):
Engine honors mesh_shape/sharding, the serve loop drives the sharded
detect program, and the HTTP ingestion endpoint round-trips detections."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime.engine import Engine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _engine(mesh_shape=(1, 1), sharding="replicated", mode="w8a8", **kw):
    cfg = EngineConfig(model="yolov2-tiny", mode=mode, kernel="auto",
                       batch=8, input_size=64, mesh_shape=mesh_shape,
                       sharding=sharding, **kw)
    return Engine(cfg).load_weights(key=jax.random.PRNGKey(0)).prepare()


@pytest.fixture(scope="module")
def images():
    return np.random.default_rng(0).uniform(
        0, 1, (8, 64, 64, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def single_results(images):
    eng = _engine()
    return eng.detect(images)


@pytest.mark.parametrize("mesh_shape,sharding", [
    ((4, 2), "channel"),
    ((8, 1), "replicated"),
])
def test_sharded_detect_matches_single_device(images, single_results,
                                              mesh_shape, sharding):
    """The whole pipeline (fused plan + decode + NMS) under one shard_map
    reproduces the single-device Engine's detections."""
    eng = _engine(mesh_shape, sharding)
    assert eng.mesh is not None
    b, s, c = eng.detect(images)
    b0, s0, c0 = single_results
    assert b.shape == b0.shape
    agree = np.mean(np.isclose(s, s0, rtol=1e-3, atol=1e-5))
    assert agree > 0.99, agree
    assert np.mean(c == c0) > 0.99


def test_sharded_plan_params_specs():
    """The fused plan's channel-pair conv stages carry the Cout/Cin
    shardings; folded stages stay replicated."""
    from dnn_inference_engine_tpu.parallel.sharded_engine import (
        plan_param_specs)
    from dnn_inference_engine_tpu.parallel.sharding import channel_shard_pair
    eng = _engine((4, 2), "channel")
    pair = channel_shard_pair(eng.model)
    specs = plan_param_specs(eng.model, eng._plan, "channel")
    by_li = {st.conv_li: sp for st, sp in zip(eng._plan, specs)}
    assert by_li[pair[0]]["wq"] == P(None, None, None, "model")
    assert by_li[pair[1]]["wq"] == P(None, None, "model", None)
    assert by_li[0] == {}                     # folded stem: replicated
    # and the live plan params are actually placed with those shardings
    wq = eng._plan_params[[st.conv_li for st in eng._plan].index(pair[0])]["wq"]
    assert "model" in str(wq.sharding.spec)


def test_channel_sharding_rejects_non_w8a8():
    with pytest.raises(ValueError, match="w8a8"):
        _engine((4, 2), "channel", mode="fp32").detect(
            np.zeros((8, 64, 64, 3), np.float32))


def test_batch_not_divisible_raises(images):
    eng = _engine((4, 2), "channel")
    with pytest.raises(ValueError, match="divisible"):
        eng.detect(images[:6])


def test_serve_drives_sharded_engine(images, single_results):
    """ContinuousBatcher + channel-sharded engine: per-request results
    match the single-device engine (BASELINE config 5 shape, minus the
    second host)."""
    from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher
    eng = _engine((4, 2), "channel", serve_max_batch=8)
    batcher = ContinuousBatcher(eng, timeout_ms=50).start()
    try:
        futs = [batcher.submit(images[i]) for i in range(8)]
        results = [f.result(timeout=300) for f in futs]
    finally:
        batcher.stop()
    b0, s0, c0 = single_results
    for i, (b, s, c) in enumerate(results):
        # serving ships uint8 (quantized wire format): scores shift
        # slightly vs the f32-input reference; detections must agree
        agree = np.mean(np.isclose(s, s0[i], rtol=0.05, atol=1e-3))
        assert agree > 0.95, (i, agree)
    stats = batcher.stats()
    assert stats["images"] == 8


def test_http_detect_endpoint(images):
    """POST /detect with an encoded image returns detections as JSON."""
    from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher
    eng = _engine(serve_max_batch=4)
    batcher = ContinuousBatcher(eng, timeout_ms=10).start()
    srv = batcher.serve_http(port=0)          # ephemeral port
    port = srv.server_address[1]
    try:
        # npy payload (lossless)
        import io
        buf = io.BytesIO()
        np.save(buf, (images[0] * 255).astype(np.uint8))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert set(out) == {"boxes", "scores", "classes", "names"}
        assert len(out["boxes"]) == len(out["scores"]) == len(out["names"])
        for bx in out["boxes"]:
            assert len(bx) == 4
        # bad payload -> 400 with an error message
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"not an image",
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()
        batcher.stop()
