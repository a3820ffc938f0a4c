"""Maxpool unit tests incl. the darknet stride-1 'same' pool
(SURVEY.md hard part 3)."""

import numpy as np
import jax.numpy as jnp

from dnn_inference_engine_tpu.ops.pool import maxpool


def _ref_pool_s2(x):
    n, h, w, c = x.shape
    out = np.zeros((n, h // 2, w // 2, c), np.float32)
    for i in range(h // 2):
        for j in range(w // 2):
            out[:, i, j] = x[:, 2 * i:2 * i + 2, 2 * j:2 * j + 2].max(axis=(1, 2))
    return out


def _ref_pool_s1_same(x):
    """darknet: window extends past right/bottom edge (max over in-bounds)."""
    n, h, w, c = x.shape
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            out[:, i, j] = x[:, i:min(i + 2, h), j:min(j + 2, w)].max(axis=(1, 2))
    return out


def test_maxpool_s2(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(maxpool(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, _ref_pool_s2(x), rtol=0, atol=0)


def test_maxpool_s1_same(rng):
    x = rng.standard_normal((2, 13, 13, 4)).astype(np.float32)
    got = np.asarray(maxpool(jnp.asarray(x), 2, 1))
    assert got.shape == x.shape
    np.testing.assert_allclose(got, _ref_pool_s1_same(x), rtol=0, atol=0)


def test_maxpool_int8(rng):
    x = rng.integers(-127, 128, (1, 8, 8, 4)).astype(np.int8)
    got = np.asarray(maxpool(jnp.asarray(x), 2, 2))
    assert got.dtype == np.int8
    np.testing.assert_array_equal(
        got.astype(np.float32), _ref_pool_s2(x.astype(np.float32)))


def test_maxpool_same_resnet_stem(rng):
    # 3x3 stride-2 SAME pool: 112 -> 56
    x = rng.standard_normal((1, 112, 112, 2)).astype(np.float32)
    got = maxpool(jnp.asarray(x), 3, 2, padding="SAME")
    assert got.shape == (1, 56, 56, 2)
