"""stem_fused_k2: the whole stage-0 pipeline in one Pallas kernel vs the
plain-op reference chain quantize -> conv3x3 SAME -> epilogue -> requant
-> maxpool 2x2/s2 -> s2d(2).

Tolerance: same 1-LSB round-boundary policy as test_pallas_stage0 (the
kernel folds the requant into one scale; the chain requantizes in two
steps — equal except within ~1 ulp of a round-half boundary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.ops.pallas_conv import (
    fold_conv3x3_k2_weights, space_to_depth, stem_fused_k2)
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.quant.quantize import (
    quantize_act, quantize_weights_per_channel)


def assert_int8_1lsb(got, ref, max_frac=1e-4):
    d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert d.max() <= 1, f"max diff {d.max()} > 1 LSB"
    frac = float((d > 0).mean())
    assert frac <= max_frac, f"{frac:.2e} of elements differ (> {max_frac})"


def _ref_chain(x_f32, wq, s_w, b, s_in, s_out):
    xq = quantize_act(x_f32, jnp.float32(s_in))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_in * s_w) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    yq = quantize_act(y, jnp.float32(s_out))
    return space_to_depth(maxpool(yq, 2, 2, "VALID"), 2)


def _stem_args(rng, wq, s_w, b, s_in, s_out, cin_pad):
    wf = fold_conv3x3_k2_weights(np.asarray(wq), 4, pool_major=True)
    if cin_pad > wf.shape[2]:
        wf = np.concatenate(
            [wf, np.zeros(wf.shape[:2] + (cin_pad - wf.shape[2],
                                          wf.shape[3]), wf.dtype)], axis=2)
    scale = jnp.float32(s_in) * jnp.tile(s_w, 16) / s_out
    bias = jnp.tile(b, 16) / s_out
    return jnp.asarray(wf), scale, bias


@pytest.mark.parametrize("cin_pad", [48, 64])
@pytest.mark.parametrize("shape", [(2, 64, 64), (1, 416, 416)])
def test_stem_fused_k2_f32(rng, shape, cin_pad):
    n, h, wd = shape
    x = jnp.asarray(rng.uniform(0, 1, (n, h, wd, 3)), jnp.float32)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 0.00787, 0.05     # 1/s_in not exactly representable

    ref = _ref_chain(x, wq, s_w, b, s_in, s_out)
    wf, scale, bias = _stem_args(rng, wq, s_w, b, s_in, s_out, cin_pad)
    got = stem_fused_k2(x, wf, scale, bias, jnp.float32(s_in))
    assert got.shape == (n, h // 4, wd // 4, 64)
    assert_int8_1lsb(got, ref)


def test_stem_fused_k2_uint8_wire(rng):
    """uint8 serving wire format: the in-kernel normalize must match the
    host path (u8 -> f32/255 -> quantize) bit-for-bit modulo 1-LSB."""
    n, h, wd = 1, 416, 416
    xu = rng.integers(0, 256, (n, h, wd, 3)).astype(np.uint8)
    x_f32 = jnp.asarray(xu.astype(np.float32) / 255.0)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 1 / 127.0, 0.05

    ref = _ref_chain(x_f32, wq, s_w, b, s_in, s_out)
    wf, scale, bias = _stem_args(rng, wq, s_w, b, s_in, s_out, 64)
    got = stem_fused_k2(jnp.asarray(xu), wf, scale, bias,
                        jnp.float32(s_in))
    assert_int8_1lsb(got, ref)


@pytest.mark.parametrize("shape", [(2, 64, 64), (1, 416, 416)])
def test_stem_fused_dg_matches_k2(rng, shape):
    """The transpose-free dot_general formulation must be BIT-IDENTICAL
    to stem_fused_k2: same int32 accumulation (order-independent), same
    one-step f32 epilogue."""
    from dnn_inference_engine_tpu.ops.pallas_conv import stem_fused_dg
    n, h, wd = shape
    x = jnp.asarray(rng.uniform(0, 1, (n, h, wd, 3)), jnp.float32)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 0.00787, 0.05
    wf, scale, bias = _stem_args(rng, wq, s_w, b, s_in, s_out, 64)
    ref = stem_fused_k2(x, wf, scale, bias, jnp.float32(s_in))
    got = stem_fused_dg(x, wf, scale, bias, jnp.float32(s_in))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # uint8 wire + exact ingestion path
    xu = rng.integers(0, 256, (n, h, wd, 3)).astype(np.uint8)
    ref_u = stem_fused_k2(jnp.asarray(xu), wf, scale, bias,
                          jnp.float32(s_in), exact_u8=True)
    got_u = stem_fused_dg(jnp.asarray(xu), wf, scale, bias,
                          jnp.float32(s_in), exact_u8=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(ref_u))


def test_stem_rs_plan_stage_matches_fold_xla_k2(rng):
    """The stem_rs plan kind reproduces the fold_xla_k2 stage end-to-end
    through plan_forward_w8a8 (whole-model run on YOLOv2-tiny @ 64px)."""
    from dnn_inference_engine_tpu.models import yolov2_tiny
    from dnn_inference_engine_tpu.quant.quantize import (
        calibrate, quantize_model_params)
    from dnn_inference_engine_tpu.runtime.plan import (
        build_plan, plan_forward_w8a8, prepare_plan_params)

    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    scales = calibrate(model, params, imgs, batch=2)
    qparams = quantize_model_params(params, model.layers)

    def run(kind):
        strategy = {0: (kind, 4, {"cin_pad": 64}), 2: ("fold_xla", 2),
                    4: ("fold_xla", 2)}
        plan = build_plan(model, strategy)
        assert plan is not None
        pp = prepare_plan_params(model, qparams, plan)
        return np.asarray(plan_forward_w8a8(
            model, plan, pp, scales, jnp.asarray(imgs)))

    ref = run("fold_xla_k2")
    got = run("stem_rs")
    # downstream layers re-quantize; 1-LSB stem flips can grow slightly
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel
    # the dot_general stem kind is bit-identical to stem_rs end-to-end
    np.testing.assert_array_equal(run("stem_dg"), got)


def test_stem_fused_k2_exact_u8(rng):
    """EXACT uint8 ingestion: with s_in = 1/255 the input codes are the
    raw pixel values (zero quantization error). The kernel feeds
    v = u - 128 and the caller folds 128 * weight-row-sums into the
    bias; the result must match the reference chain quantized at
    s_in = 1/255 (where quantize is the identity on the pixel grid)."""
    n, h, wd = 1, 416, 416
    xu = rng.integers(0, 256, (n, h, wd, 3)).astype(np.uint8)
    x_f32 = jnp.asarray(xu.astype(np.float32) / 255.0)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 1.0 / 255.0, 0.05

    # the exact reference: integer conv on the RAW pixel codes u (which
    # exceed the +-127 int8 code range — that is exactly what the
    # v = u - 128 offset trick buys), then the standard epilogue chain
    from dnn_inference_engine_tpu.ops.pool import maxpool as _mp
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xu, jnp.int32), wq.astype(jnp.int32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_in * s_w) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    yq = quantize_act(y, jnp.float32(s_out))
    ref = space_to_depth(_mp(yq, 2, 2, "VALID"), 2)

    wf, _, _ = _stem_args(rng, wq, s_w, b, s_in, s_out, 64)
    w1 = jnp.asarray(np.asarray(wf).reshape(-1, 256).astype(np.float32)
                     .sum(axis=0))
    s_wt = jnp.tile(s_w, 16)
    scale = jnp.float32(s_in) * s_wt / s_out
    bias = (jnp.tile(b, 16) + 128.0 * s_in * s_wt * w1) / s_out
    got = stem_fused_k2(jnp.asarray(xu), wf, scale, bias,
                        jnp.float32(s_in), exact_u8=True)
    assert_int8_1lsb(got, ref)


def test_stem_rs_plan_exact_u8_more_accurate_than_f32(rng):
    """Through the whole plan: the uint8 wire (exact ingestion) must be
    at least as close to the fp32 model as the f32 path (calibrated
    layer-0 quantization) is."""
    import jax
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=2,
                              input_size=64)
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    ref = np.asarray(eng.model.forward_fp32(eng.fp32_params,
                                            jnp.asarray(f32)))
    h_u8 = np.asarray(eng.forward_fn()(eng.exec_params, jnp.asarray(u8)))
    h_f32 = np.asarray(eng.forward_fn()(eng.exec_params,
                                        jnp.asarray(f32)))

    def rel_rms(a):
        return float(np.sqrt(np.mean((a - ref) ** 2))
                     / np.sqrt(np.mean(ref ** 2)))
    assert rel_rms(h_u8) <= rel_rms(h_f32) * 1.05, (
        rel_rms(h_u8), rel_rms(h_f32))
