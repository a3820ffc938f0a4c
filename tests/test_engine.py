"""Engine runtime tests (reference L5 driver behavior; SURVEY.md 2.4)."""

import jax
import numpy as np
import pytest

from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime.engine import Engine


def _small_cfg(**kw):
    kw.setdefault("model", "yolov2-tiny")
    kw.setdefault("input_size", 64)
    return EngineConfig(**kw)


def test_engine_fp32_detect(rng):
    eng = Engine(_small_cfg(mode="fp32")).load_weights().prepare()
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    boxes, scores, classes = eng.detect(x)
    assert boxes.shape == (1, 128, 4)
    assert scores.shape == (1, 128)
    assert classes.shape == (1, 128)


def test_engine_w8a8_close_to_fp32(rng):
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    ef = Engine(_small_cfg(mode="fp32")).load_weights(key=key).prepare()
    eq = Engine(_small_cfg(mode="w8a8")).load_weights(key=key).prepare(
        calib_images=x)
    hf = ef.forward_fn()(ef.exec_params, x)
    hq = eq.forward_fn()(eq.exec_params, x)
    rel = np.abs(np.asarray(hq) - np.asarray(hf)).max() / (
        np.abs(np.asarray(hf)).max() + 1e-9)
    assert rel < 0.1, rel


def test_engine_checkpoint_roundtrip(tmp_path, rng):
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    eng = Engine(_small_cfg(mode="w8a8")).load_weights().prepare(calib_images=x)
    path = str(tmp_path / "eng.npz")
    eng.save(path)

    eng2 = Engine(_small_cfg(mode="w8a8", weights=path)).load_weights().prepare()
    assert eng2.act_scales is not None
    out1 = np.asarray(eng.forward_fn()(eng.exec_params, x))
    out2 = np.asarray(eng2.forward_fn()(eng2.exec_params, x))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_engine_config_calib_field(tmp_path, rng):
    """EngineConfig.calib drives calibration without the CLI: file-loaded
    weights + w8a8 prepare successfully when config.calib names a saved
    calibration batch (the remediation engine.prepare's error suggests)."""
    x = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    # a "file-loaded" checkpoint (fp32 params, no scales) would normally
    # hard-error in w8a8 prepare without calibration images
    eng0 = Engine(_small_cfg(mode="fp32")).load_weights().prepare()
    wpath = str(tmp_path / "w.npz")
    eng0.save(wpath)
    cpath = str(tmp_path / "calib.npy")
    np.save(cpath, x)

    eng = Engine(_small_cfg(mode="w8a8", weights=wpath, calib=cpath)
                 ).load_weights().prepare()
    assert eng.act_scales is not None
    # and it matches explicit calib_images= on the same batch
    eng2 = Engine(_small_cfg(mode="w8a8", weights=wpath)
                  ).load_weights().prepare(calib_images=x)
    np.testing.assert_allclose(eng.act_scales, eng2.act_scales, rtol=1e-6)


def test_engine_w8a8_file_weights_without_calib_errors(tmp_path, rng):
    """Without calib anywhere, file-loaded fp32 weights + w8a8 must raise
    (uniform-noise fallback is only legal for synthetic weights)."""
    eng0 = Engine(_small_cfg(mode="fp32")).load_weights().prepare()
    wpath = str(tmp_path / "w.npz")
    eng0.save(wpath)
    with pytest.raises(ValueError, match="calib"):
        Engine(_small_cfg(mode="w8a8", weights=wpath)
               ).load_weights().prepare()


def test_engine_classify_resnet(rng):
    eng = Engine(EngineConfig(model="resnet18", mode="w8", input_size=64,
                              num_classes=1000)).load_weights().prepare()
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = eng.classify(x)
    assert out.shape == (2, 1000)


def test_engine_yolov3_detect(rng):
    eng = Engine(EngineConfig(model="yolov3-tiny", mode="fp32",
                              input_size=64)).load_weights().prepare()
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    boxes, scores, classes = eng.detect(x)
    assert boxes.shape == (1, 128, 4)


def test_engine_uint8_input_matches_f32(rng):
    """Engine accepts uint8 batches (serving wire format) with on-device
    normalization equal to f32/255 inputs."""
    eng = Engine(_small_cfg(mode="fp32")).load_weights().prepare()
    u8 = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    b1, s1, c1 = eng.detect(u8)
    b2, s2, c2 = eng.detect(f32)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-3)
