"""Quantization tests (reference Q1-Q3; SURVEY.md sections 2.2, 3.3, 4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.eval.golden import quant_error_report
from dnn_inference_engine_tpu.models import yolov2_tiny
from dnn_inference_engine_tpu.ops.conv import conv2d_fp32, conv2d_w8, conv2d_w8a8
from dnn_inference_engine_tpu.quant.quantize import (
    calibrate, dequantize, quantize_act, quantize_model_params,
    quantize_weights_per_channel,
)


def test_weight_quant_roundtrip(rng):
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and s_w.shape == (32,)
    wd = np.asarray(wq, np.float32) * np.asarray(s_w)
    # max error per channel bounded by s_c / 2
    err = np.abs(wd - w).max(axis=(0, 1, 2))
    assert np.all(err <= np.asarray(s_w) * 0.5 + 1e-7)


def test_act_quant_clip(rng):
    x = jnp.asarray([[-10.0, 0.0, 0.5, 10.0]])
    q = quantize_act(x, jnp.float32(0.05))
    np.testing.assert_array_equal(np.asarray(q), [[-127, 0, 10, 127]])
    d = dequantize(q, jnp.float32(0.05))
    np.testing.assert_allclose(np.asarray(d), [[-6.35, 0.0, 0.5, 6.35]],
                               rtol=1e-6)


def test_conv_w8_close_to_fp32(rng):
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    ref = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    got = np.asarray(conv2d_w8(jnp.asarray(x), wq, s_w, jnp.asarray(b)))
    rms = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref ** 2)) + 1e-9)
    assert rms < 0.01, rms


def test_conv_w8a8_close_to_fp32(rng):
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    s_in = jnp.float32(np.abs(x).max() / 127.0)
    xq = quantize_act(jnp.asarray(x), s_in)
    ref = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    got = np.asarray(conv2d_w8a8(xq, s_in, wq, s_w, jnp.asarray(b)))
    rms = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref ** 2)) + 1e-9)
    assert rms < 0.02, rms


def test_w8a8_int_accumulation_exact(rng):
    """int8 x int8 conv must accumulate exactly in int32 (SURVEY.md 4.1)."""
    xq = rng.integers(-127, 128, (1, 6, 6, 8)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, 8, 4)).astype(np.int8)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # f32 conv of int8 values is exact (magnitudes << 2^24)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref, np.int64))


def _small_model_and_data(rng, mode_batch=2):
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (mode_batch, 64, 64, 3)).astype(np.float32)
    return model, params, images


def test_calibrate_and_w8a8_model(rng):
    model, params, images = _small_model_and_data(rng)
    scales = calibrate(model, params, images, batch=2)
    assert len(scales) == len(model.layers) + 1
    assert all(s > 0 for s in scales)

    qparams = quantize_model_params(params, model.layers)
    x = jnp.asarray(images[:1])
    ref, ref_outs = model.forward_fp32(params, x, capture_outputs=True)
    got, got_outs = model.forward_w8a8(qparams, scales, x,
                                       capture_outputs=True)
    assert got.dtype == jnp.float32
    report = quant_error_report(got_outs, dict(enumerate(ref_outs)))
    # per-layer relative RMS error stays within quantization-error bounds
    assert max(report.values()) < 0.15, report


def test_w8_model_close(rng):
    model, params, images = _small_model_and_data(rng)
    qparams = quantize_model_params(params, model.layers)
    x = jnp.asarray(images[:1])
    ref = np.asarray(model.forward_fp32(params, x))
    got = np.asarray(model.forward_w8(qparams, x))
    rms = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref ** 2)) + 1e-9)
    assert rms < 0.05, rms
