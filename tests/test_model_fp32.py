"""FP32 golden-slice tests (reference PR1 path; SURVEY.md sections 3.1, 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.models import build_model, yolov2_tiny
from dnn_inference_engine_tpu.ops.conv import conv2d_fp32


def _ref_conv_same_numpy(x, w, b):
    """Direct scalar conv (reference K1 naive-loop role) for 3x3 SAME s1."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((n, h, wd, cout), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + h, j:j + wd, :]          # (n,h,w,cin)
            out += np.einsum("nhwc,co->nhwo", patch, w[i, j])
    return out + b


def test_conv2d_fp32_matches_naive(rng):
    x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    got = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), act="linear"))
    np.testing.assert_allclose(got, _ref_conv_same_numpy(x, w, b),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_leaky(rng):
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    w = rng.standard_normal((1, 1, 2, 3)).astype(np.float32)
    b = np.zeros((3,), np.float32)
    lin = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), act="linear"))
    lk = np.asarray(conv2d_fp32(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), act="leaky"))
    np.testing.assert_allclose(lk, np.where(lin > 0, lin, 0.1 * lin), rtol=1e-6)


def test_yolov2_tiny_shapes():
    model = yolov2_tiny()
    assert model.out_channels()[-1] == 125
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))  # small spatial for CPU speed; 64/32 = 2
    out = jax.jit(lambda p, xx: model.forward_fp32(p, xx))(params, x)
    assert out.shape == (1, 2, 2, 125)


def test_yolov2_tiny_param_count():
    # SURVEY.md section 2.5: ~15.8 M params
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    n = sum(int(np.prod(v.shape)) for p in params for v in p.values())
    assert 15.5e6 < n < 16.1e6, n


def test_yolov3_tiny_two_heads():
    model = build_model("yolov3-tiny")
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    h1, h2 = jax.jit(lambda p, xx: model.forward_fp32(p, xx))(params, x)
    assert h1.shape == (1, 2, 2, 75)
    assert h2.shape == (1, 4, 4, 75)


def test_resnet18_shapes():
    model = build_model("resnet18")
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.jit(lambda p, xx: model.forward_fp32(p, xx))(params, x)
    assert out.shape == (2, 1000)


@pytest.mark.parametrize("name", ["yolov2-tiny", "yolov3-tiny", "resnet18"])
def test_capture_outputs_len(name):
    model = build_model(name)
    params = model.init_params(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 64, 64, 3))
    _, outs = model.forward_fp32(params, x, capture_outputs=True)
    assert len(outs) == len(model.layers)
