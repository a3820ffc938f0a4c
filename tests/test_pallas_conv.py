"""Row-streaming Pallas conv kernel tests: parity with the XLA-tier W8A8
conv + maxpool, exactness of space-to-depth folds, and the composed
fold-pipeline (conv1 f=8 -> conv2 f=4 -> conv3 f=2) against the plain
layer chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.ops.conv import conv2d_fp32, conv2d_w8a8
from dnn_inference_engine_tpu.ops.pallas_conv import (
    conv2d_w8a8_rs, conv3x3_rs, fold_conv3x3_weights, fold_group_pool_channels,
    folded_stage_params, space_to_depth,
)
from dnn_inference_engine_tpu.ops.pool import maxpool


def _mk(rng, n, h, w, cin, cout):
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, cin)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    s_w = jnp.asarray(rng.uniform(1e-3, 1e-2, cout), jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    return xq, wq, s_w, b


def _close_int8(got, ref):
    d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


@pytest.mark.parametrize("h,w,cin,cout", [
    (16, 16, 16, 32),       # small-channel (pads Cin 16->128)
    (8, 52, 128, 256),      # production-like folded shape (W 52->64)
    (8, 13, 8, 16),         # odd W
])
def test_rs_matches_xla_no_pool(rng, h, w, cin, cout):
    xq, wq, s_w, b = _mk(rng, 2, h, w, cin, cout)
    s_in, s_out = jnp.float32(0.02), jnp.float32(0.06)
    ref = conv2d_w8a8(xq, s_in, wq, s_w, b, s_out=s_out)
    got = conv2d_w8a8_rs(xq, s_in, wq, s_w, b, s_out=s_out)
    assert got.shape == ref.shape
    _close_int8(got, ref)


def test_rs_fused_pool2_matches(rng):
    xq, wq, s_w, b = _mk(rng, 2, 16, 20, 16, 32)
    s_in, s_out = jnp.float32(0.02), jnp.float32(0.06)
    ref = maxpool(conv2d_w8a8(xq, s_in, wq, s_w, b, s_out=s_out), 2, 2)
    got = conv2d_w8a8_rs(xq, s_in, wq, s_w, b, s_out=s_out, pool="pool2")
    assert got.shape == ref.shape
    _close_int8(got, ref)


def test_rs_f32_output(rng):
    xq, wq, s_w, b = _mk(rng, 1, 8, 8, 16, 32)
    s_in = jnp.float32(0.02)
    ref = conv2d_w8a8(xq, s_in, wq, s_w, b)
    got = conv2d_w8a8_rs(xq, s_in, wq, s_w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("f", [2, 4])
def test_fold_weights_exact_fp32(rng, f):
    """Folded conv + group-max pool == conv + maxpool (fp32 check of the
    reassociation, independent of quantization)."""
    hw = 4 * f
    x = rng.standard_normal((1, hw, hw, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    ref = maxpool(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                              jnp.zeros(8), act="leaky"), 2, 2)

    wf = fold_conv3x3_weights(w, f)
    xf = space_to_depth(jnp.asarray(x), f)
    yf = conv2d_fp32(xf, jnp.asarray(wf), jnp.zeros(f * f * 8), act="leaky")
    pooled = fold_group_pool_channels(yf, f, 8)        # fold-(f/2) layout
    # unfold to compare: fold-(f/2) of pooled tensor
    want = space_to_depth(ref, f // 2) if f > 2 else ref
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_composed_fold_pipeline_matches_chain(rng):
    """THE production path: conv1(f=8)+gmax -> conv2(f=4)+gmax ->
    conv3(f=2)+gmax, all via the rs kernel at constant spatial size,
    vs the plain conv+pool chain (int8 parity)."""
    n, hw = 2, 32                        # 32 = 8*4: folded grid 4x4
    cins, couts = [3, 16, 32], [16, 32, 64]
    s = jnp.float32(0.02)
    s_outs = [jnp.float32(0.05), jnp.float32(0.07), jnp.float32(0.09)]

    xq = jnp.asarray(rng.integers(-127, 128, (n, hw, hw, cins[0])), jnp.int8)
    ws, sws, bs = [], [], []
    for cin, cout in zip(cins, couts):
        wq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        ws.append(wq)
        sws.append(jnp.asarray(rng.uniform(1e-3, 1e-2, cout), jnp.float32))
        bs.append(jnp.asarray(rng.standard_normal(cout), jnp.float32))

    # reference chain: (conv -> pool) x3
    ref = xq
    s_cur = s
    for wq, sw, b, so in zip(ws, sws, bs, s_outs):
        ref = maxpool(conv2d_w8a8(ref, s_cur, wq, sw, b, s_out=so), 2, 2)
        s_cur = so

    # folded pipeline at constant (hw/8, hw/8) spatial
    x = space_to_depth(xq, 8)
    s_cur = s
    for f, wq, sw, b, so in zip((8, 4, 2), ws, sws, bs, s_outs):
        wf, sw_f, b_f = folded_stage_params(wq, sw, b, f)
        cout = wq.shape[3]
        scale = (s_cur * jnp.asarray(sw_f)) / so
        bias = jnp.asarray(b_f) / so
        x = conv3x3_rs(x, jnp.asarray(wf), scale, bias, act="leaky",
                       quantize_out=True, pool=("gmax", f, cout))
        s_cur = so

    # x is now fold-1 == plain NHWC
    assert x.shape == ref.shape, (x.shape, ref.shape)
    _close_int8(x, ref)


def test_rs_padding_stripped(rng):
    xq, wq, s_w, b = _mk(rng, 1, 8, 13, 8, 16)
    s_in, s_out = jnp.float32(0.02), jnp.float32(0.06)
    got = conv2d_w8a8_rs(xq, s_in, wq, s_w, b, s_out=s_out)
    assert got.shape == (1, 8, 13, 16)


def test_k2_fold_matches_chain(rng):
    """k=2 shifted-fold formulation == conv + maxpool (int8 parity)."""
    from dnn_inference_engine_tpu.ops.pallas_conv import (
        fold_conv3x3_k2_weights, shift_space_to_depth)
    n, hw, cin, cout = 2, 16, 8, 16
    s_in, s_out = jnp.float32(0.02), jnp.float32(0.06)
    xq = jnp.asarray(rng.integers(-127, 128, (n, hw, hw, cin)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    s_w = jnp.asarray(rng.uniform(1e-3, 1e-2, cout), jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)

    ref = maxpool(conv2d_w8a8(xq, s_in, wq, s_w, b, s_out=s_out), 2, 2)

    for f in (2, 4):
        wf = jnp.asarray(fold_conv3x3_k2_weights(np.asarray(wq), f))
        reps = f * f
        scale = (s_in * jnp.tile(s_w, reps)) / s_out
        bias = jnp.tile(b, reps) / s_out
        xf = shift_space_to_depth(xq, f)
        got = conv3x3_rs(xf, wf, scale, bias, act="leaky",
                         quantize_out=True, pool=("gmax", f, cout), ksize=2)
        # unfold to plain layout for comparison
        from dnn_inference_engine_tpu.ops.pallas_conv import depth_to_space
        if f > 2:
            got = depth_to_space(got, f // 2)
        assert got.shape == ref.shape, (f, got.shape, ref.shape)
        _close_int8(got, ref)


def test_plan_with_rs2_strategy(rng):
    """Full yolov2 plan with rs2 early stages matches the reference."""
    from dnn_inference_engine_tpu.models import yolov2_tiny
    from dnn_inference_engine_tpu.quant.quantize import (
        calibrate, quantize_model_params)
    from dnn_inference_engine_tpu.runtime.plan import (
        build_plan, plan_forward_w8a8, prepare_plan_params)
    strategy = {0: ("rs2", 4), 2: ("rs2", 2), 4: ("rs2", 2), 6: ("xla", 1),
                8: ("gemm", 1), 10: ("gemm", 1), 12: ("gemm", 1),
                13: ("gemm", 1), 14: ("gemm", 1)}
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    scales = calibrate(model, params, images, batch=2)
    qparams = quantize_model_params(params, model.layers)
    plan = build_plan(model, strategy)
    pp = prepare_plan_params(model, qparams, plan)
    x = jnp.asarray(images)
    ref = np.asarray(model.forward_w8a8(qparams, scales, x))
    got = np.asarray(plan_forward_w8a8(model, plan, pp, scales, x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_quant_space_to_depth4_bit_exact(rng):
    """Fused quantize+s2d(4) kernel vs quantize_act -> space_to_depth,
    including a 416x416 shape (multiple grid blocks) and a scale whose
    reciprocal is NOT exactly representable (the kernel divides in-kernel,
    so parity must hold for arbitrary scales)."""
    from dnn_inference_engine_tpu.ops.pallas_conv import quant_space_to_depth4
    from dnn_inference_engine_tpu.quant.quantize import quantize_act

    for n, h, w, s_in in [(1, 416, 416, 0.0123), (2, 64, 64, 1 / 127.0),
                          (1, 32, 96, 0.007919)]:
        x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)), jnp.float32)
        ref = space_to_depth(quantize_act(x, jnp.float32(s_in)), 4)
        got = quant_space_to_depth4(x, jnp.float32(s_in))
        assert got.shape == ref.shape == (n, h // 4, w // 4, 48)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_shift_s2d2_pallas_matches_xla(rng):
    """One-pass Pallas shift-s2d(2) == pad(1,1)+space_to_depth(2) (the
    exact input the fold_xla_k2 f=2 stage consumes, minus the junk
    trailing block the XLA path pads in and slices back off). The
    kernel additionally emits zero junk rows up to a multiple of 8
    (H/2+1 is often prime) — asserted zero."""
    import jax.numpy as jnp
    from dnn_inference_engine_tpu.ops.pallas_conv import (
        shift_s2d2_pallas, space_to_depth)
    for shape in ((2, 52, 52, 32), (1, 104, 104, 64), (3, 8, 12, 16)):
        x = jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
        ref = np.asarray(space_to_depth(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), 2))
        got = np.asarray(shift_s2d2_pallas(x))
        hout = ref.shape[1]
        np.testing.assert_array_equal(got[:, :hout], ref)
        assert got.shape[1] % 8 == 0
        np.testing.assert_array_equal(got[:, hout:], 0)


def test_gmax_shift_s2d2_kernel_exact(rng):
    """Fused group-max + shifted-s2d(2) pack == pool-major gmax then
    shift_space_to_depth(2), junk rows zero (round-4 fold_xla_s2 kind)."""
    from dnn_inference_engine_tpu.ops.pallas_conv import (
        gmax_shift_s2d2, shift_space_to_depth)
    for (n, h, w, go) in [(2, 16, 16, 8), (1, 104, 104, 32), (2, 24, 16, 4)]:
        y = jnp.asarray(rng.integers(-127, 128, (n, h, w, 4 * go)), jnp.int8)
        g = jnp.maximum(
            jnp.maximum(y[..., :go], y[..., go:2 * go]),
            jnp.maximum(y[..., 2 * go:3 * go], y[..., 3 * go:]))
        ref = np.asarray(shift_space_to_depth(g, 2))
        got = np.asarray(gmax_shift_s2d2(y, go))
        hr = ref.shape[1]
        np.testing.assert_array_equal(got[:, :hr], ref)
        assert got.shape[1] % 8 == 0
        np.testing.assert_array_equal(got[:, hr:], 0)


def test_plan_with_fold_xla_s2_strategy(rng):
    """yolov2 plan with the fold_xla_s2 L2 stage is BIT-exact vs the
    default plan (the gs2 kernel replaces gmax+relayout exactly), and
    illegal chains (s2 not followed by a fold_xla_k2 f=2 conv) are
    rejected by build_plan."""
    from dnn_inference_engine_tpu.models import yolov2_tiny
    from dnn_inference_engine_tpu.quant.quantize import (
        calibrate, quantize_model_params)
    from dnn_inference_engine_tpu.runtime.plan import (
        _YOLOV2_STRATEGY, build_plan, plan_forward_w8a8,
        prepare_plan_params)
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    scales = calibrate(model, params, images, batch=2)
    qparams = quantize_model_params(params, model.layers)
    x = jnp.asarray(images)

    p_ref = build_plan(model, None)
    ref = np.asarray(plan_forward_w8a8(
        model, p_ref, prepare_plan_params(model, qparams, p_ref),
        scales, x))

    strat = dict(_YOLOV2_STRATEGY)
    strat[2] = ("fold_xla_s2", 2)
    p_s2 = build_plan(model, strat)
    assert p_s2 is not None
    got = np.asarray(plan_forward_w8a8(
        model, p_s2, prepare_plan_params(model, qparams, p_s2),
        scales, x))
    np.testing.assert_array_equal(got, ref)

    bad = dict(strat)
    bad[4] = ("xla", 1)          # consumer is not fold_xla_k2 f=2
    assert build_plan(model, bad) is None
