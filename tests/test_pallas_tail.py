"""Batched shift-GEMM tail conv kernel (ops/attic/pallas_tail.py, NON-PRODUCTION): parity with
the XLA-tier W8A8 conv on the small-spatial production shapes.

The kernel is benchmarked but not in the default plan: XLA's native int8
conv emitter wins at the yolov2 tail shapes (96%+ calibrated peak vs
this kernel's 81-82% — see the strategy table in runtime/plan.py).
Correctness stays locked so the tier remains selectable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.ops.conv import conv2d_w8a8
from dnn_inference_engine_tpu.ops.attic.pallas_tail import conv2d_w8a8_bt


def _close_int8(got, ref):
    d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


@pytest.mark.parametrize("n,h,w,cin,cout", [
    (2, 13, 13, 128, 256),      # production tail geometry
    (3, 13, 13, 256, 128),      # M not a multiple of the block
    (2, 26, 26, 128, 128),      # wider spatial
    (1, 8, 8, 128, 128),        # tiny
])
def test_bt_matches_xla_requant(rng, n, h, w, cin, cout):
    xq = jnp.asarray(rng.integers(-127, 128, (n, h, w, cin)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    s_w = jnp.asarray(rng.uniform(1e-3, 1e-2, cout), jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    s_in, s_out = jnp.float32(0.0217), jnp.float32(0.0613)
    ref = conv2d_w8a8(xq, s_in, wq, s_w, b, s_out=s_out)
    got = conv2d_w8a8_bt(xq, s_in, wq, s_w, b, s_out=s_out)
    assert got.shape == ref.shape
    _close_int8(got, ref)


def test_bt_f32_output(rng):
    xq = jnp.asarray(rng.integers(-127, 128, (2, 13, 13, 128)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 256)), jnp.int8)
    s_w = jnp.asarray(rng.uniform(1e-3, 1e-2, 256), jnp.float32)
    b = jnp.asarray(rng.standard_normal(256), jnp.float32)
    s_in = jnp.float32(0.02)
    ref = conv2d_w8a8(xq, s_in, wq, s_w, b)
    got = conv2d_w8a8_bt(xq, s_in, wq, s_w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_bt_cout_split(rng):
    """Cout larger than one weight block forces the grid's j dimension."""
    xq = jnp.asarray(rng.integers(-127, 128, (1, 13, 13, 128)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 512)), jnp.int8)
    s_w = jnp.asarray(rng.uniform(1e-3, 1e-2, 512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512), jnp.float32)
    from dnn_inference_engine_tpu.ops.attic.pallas_tail import conv3x3_bt
    scale = (jnp.float32(0.02) * s_w) / 0.06
    bias = b / 0.06
    got = conv3x3_bt(xq, wq, scale, bias, quantize_out=True, tn=128)
    ref = conv2d_w8a8(xq, jnp.float32(0.02), wq, s_w, b,
                      s_out=jnp.float32(0.06))
    _close_int8(got, ref)
