"""Pallas fused-GEMM kernel tests (SURVEY.md section 4.1: exact int32
accumulation vs dequant-then-dot, f32 epilogue to 1e-6). Run in
interpreter mode on CPU; identical code compiles via Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.ops.conv import conv2d_fp32, conv2d_w8, conv2d_w8a8
from dnn_inference_engine_tpu.ops.conv_lowering import (
    conv2d_fp32_pallas, conv2d_w8_pallas, conv2d_w8a8_pallas, extract_patches,
)
from dnn_inference_engine_tpu.ops.pallas_gemm import gemm_fused, int8_gemm_fused


def _ref_epilogue(acc, scale, bias, act):
    y = acc.astype(np.float32) * scale + bias
    if act == "leaky":
        y = np.where(y > 0, y, 0.1 * y)
    elif act == "relu":
        y = np.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("m,k,n", [(128, 128, 128), (200, 300, 100),
                                   (37, 1152, 125)])
def test_int8_gemm_exact(rng, m, k, n):
    a = rng.integers(-127, 128, (m, k)).astype(np.int8)
    b = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, n).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)

    acc = a.astype(np.int64) @ b.astype(np.int64)
    ref = _ref_epilogue(acc, scale, bias, "leaky")
    got = np.asarray(int8_gemm_fused(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_int8_gemm_requant(rng):
    m, k, n = 64, 256, 32
    a = rng.integers(-127, 128, (m, k)).astype(np.int8)
    b = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, n).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)
    s_out = np.float32(0.05)

    acc = a.astype(np.int64) @ b.astype(np.int64)
    y = _ref_epilogue(acc, scale, bias, "leaky")
    ref = np.clip(np.round(y / s_out), -127, 127).astype(np.int8)
    got = np.asarray(int8_gemm_fused(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(scale), jnp.asarray(bias),
                                     s_out=s_out))
    assert got.dtype == np.int8
    # rounding-boundary values may flip by 1 code in f32 vs f64 math
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    assert (got != ref).mean() < 0.01


def test_gemm_f32_and_w8_paths(rng):
    m, k, n = 96, 160, 48
    a = rng.standard_normal((m, k)).astype(np.float32)
    bq = rng.integers(-127, 128, (k, n)).astype(np.int8)
    s_w = rng.uniform(0.001, 0.01, n).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)

    ref = _ref_epilogue(a @ bq.astype(np.float32), s_w, bias, "leaky")
    got = np.asarray(gemm_fused(jnp.asarray(a), jnp.asarray(bq),
                                jnp.asarray(s_w), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    bf = rng.standard_normal((k, n)).astype(np.float32)
    ones = np.ones(n, np.float32)
    ref2 = _ref_epilogue(a @ bf, ones, bias, "linear")
    got2 = np.asarray(gemm_fused(jnp.asarray(a), jnp.asarray(bf),
                                 jnp.asarray(ones), jnp.asarray(bias),
                                 act="linear"))
    np.testing.assert_allclose(got2, ref2, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (1, 1), (7, 2)])
def test_extract_patches_matches_conv(rng, k, stride):
    """patches @ reshaped-weights == XLA conv (validates layout + padding)."""
    x = rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    w = rng.standard_normal((k, k, 5, 8)).astype(np.float32)
    ref = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                 jnp.zeros(8), act="linear", stride=stride))
    p = extract_patches(jnp.asarray(x), k, k, stride, "SAME")
    # HIGHEST: the reference path multiplies exactly; the test's own
    # matmul must not round through bf16 on TPU
    got = np.asarray(jnp.dot(
        p.reshape(-1, k * k * 5), jnp.asarray(w).reshape(-1, 8),
        precision=jax.lax.Precision.HIGHEST)).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_w8a8_pallas_matches_xla(rng):
    xq = rng.integers(-127, 128, (2, 13, 13, 128)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, 128, 64)).astype(np.int8)
    s_w = rng.uniform(0.001, 0.01, 64).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    s_in = jnp.float32(0.02)
    ref = np.asarray(conv2d_w8a8(jnp.asarray(xq), s_in, jnp.asarray(wq),
                                 jnp.asarray(s_w), jnp.asarray(b)))
    got = np.asarray(conv2d_w8a8_pallas(jnp.asarray(xq), s_in, jnp.asarray(wq),
                                        jnp.asarray(s_w), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv_w8a8_pallas_requant_matches_xla(rng):
    xq = rng.integers(-127, 128, (1, 8, 8, 64)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, 64, 32)).astype(np.int8)
    s_w = rng.uniform(0.001, 0.01, 32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    s_in, s_out = jnp.float32(0.02), jnp.float32(0.06)
    ref = np.asarray(conv2d_w8a8(jnp.asarray(xq), s_in, jnp.asarray(wq),
                                 jnp.asarray(s_w), jnp.asarray(b), s_out=s_out))
    got = np.asarray(conv2d_w8a8_pallas(jnp.asarray(xq), s_in, jnp.asarray(wq),
                                        jnp.asarray(s_w), jnp.asarray(b),
                                        s_out=s_out))
    assert got.dtype == np.int8
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    assert (got != ref).mean() < 0.01


def test_conv_w8_and_fp32_pallas_match_xla(rng):
    x = rng.standard_normal((1, 9, 9, 32)).astype(np.float32)
    w = rng.standard_normal((3, 3, 32, 16)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)

    from dnn_inference_engine_tpu.quant.quantize import quantize_weights_per_channel
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    ref_w8 = np.asarray(conv2d_w8(jnp.asarray(x), wq, s_w, jnp.asarray(b)))
    got_w8 = np.asarray(conv2d_w8_pallas(jnp.asarray(x), wq, s_w,
                                         jnp.asarray(b)))
    np.testing.assert_allclose(got_w8, ref_w8, rtol=1e-4, atol=1e-4)

    ref_f = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b)))
    got_f = np.asarray(conv2d_fp32_pallas(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b)))
    np.testing.assert_allclose(got_f, ref_f, rtol=1e-4, atol=1e-4)


def test_full_model_pallas_vs_xla(rng):
    """Whole-model W8A8 forward: kernel='pallas' vs kernel='xla'."""
    from dnn_inference_engine_tpu.models import yolov2_tiny
    from dnn_inference_engine_tpu.quant.quantize import (
        calibrate, quantize_model_params)
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    scales = calibrate(model, params, images, batch=2)
    qparams = quantize_model_params(params, model.layers)
    x = jnp.asarray(images[:1])
    ref = np.asarray(model.forward_w8a8(qparams, scales, x, kernel="xla"))
    got = np.asarray(model.forward_w8a8(qparams, scales, x, kernel="pallas"))
    # identical int math; epilogue rounding can flip borderline int8 codes,
    # which the final f32 head then scales — allow tiny deviation
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_auto_policy_tiers():
    from dnn_inference_engine_tpu.models import yolov2_tiny
    from dnn_inference_engine_tpu.ops.dispatch import tier_report
    rep = tier_report(yolov2_tiny(), batch=1)
    tiers = {li: tier for li, _desc, tier in rep}
    assert tiers[0] == "xla"          # conv1: 416x416x3 — XLA
    assert tiers[12] == "pallas"      # conv7: 13x13, K=4608 — Pallas
    assert tiers[13] == "pallas"      # conv8
