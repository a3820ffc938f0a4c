"""Fused stage-0 kernel (ops/attic/pallas_stage0.py, NON-PRODUCTION) vs the plain-op reference
chain quantize -> conv1 -> epilogue -> requant -> pool -> s2d(2).

The kernel is experimental (not yet wired into plans: slower than the
XLA fold chain on v5e until Mosaic grows a fast strided-sublane gather —
see the module docstring); correctness is locked here so it stays
integrable.

Tolerance note: the kernels fold the requant into one scale
(acc * (s_in*s_w/s_out) + b/s_out) while the plain chain requantizes in
two steps (round((acc*s_in*s_w + b after leaky) / s_out)). The two are
equal except when a value lands within ~1 ulp of a round-half boundary,
where they can differ by exactly 1 LSB (a few elements per 692k,
data-dependent). The int32 accumulation itself is exact; the assertion
below tolerates the boundary flips and nothing else."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.ops.attic.pallas_stage0 import (
    stage0_fused, stage0_params)
from dnn_inference_engine_tpu.ops.pallas_conv import space_to_depth
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.quant.quantize import (
    quantize_act, quantize_weights_per_channel)


def assert_int8_1lsb(got, ref, max_frac=1e-4):
    """Exact except for rare 1-LSB round-boundary flips (module docstring)."""
    d = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert d.max() <= 1, f"max diff {d.max()} > 1 LSB"
    frac = float((d > 0).mean())
    assert frac <= max_frac, f"{frac:.2e} of elements differ (> {max_frac})"


def test_stage0_fused_bit_exact(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 416, 416, 3)), jnp.float32)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 1 / 127.0, 0.05

    xq = quantize_act(x, jnp.float32(s_in))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_in * s_w) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    yq = quantize_act(y, jnp.float32(s_out))
    ref = space_to_depth(maxpool(yq, 2, 2, "VALID"), 2)

    wb, scale, bias = stage0_params(wq, s_w, b, s_in, s_out, ht=4)
    got = stage0_fused(x, wb, scale, bias, s_in, ht=4)
    assert got.shape == (1, 104, 104, 64)
    assert_int8_1lsb(got, ref)


def test_stage0_fused_v2_bit_exact(rng):
    """Shuffle-free v2 kernel (the variant plans wire in via the 's0'
    kind) vs the plain-op chain, at the full 416x416 production shape
    (multiple grid blocks + halos), pool-major fold-2 output layout."""
    from dnn_inference_engine_tpu.ops.attic.pallas_stage0 import (
        build_stage0_weights_v2, stage0_fused_v2)

    x = jnp.asarray(rng.uniform(0, 1, (1, 416, 416, 3)), jnp.float32)
    w = rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2
    wq, s_w = quantize_weights_per_channel(jnp.asarray(w))
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32) * 0.1
    s_in, s_out = 0.00789, 0.0511          # reciprocals inexact on purpose

    # reference chain: quantize -> int8 conv -> epilogue -> requant ->
    # maxpool -> fold-2 (pool-major group order, matching _fold_group)
    xq = quantize_act(x, jnp.float32(s_in))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_in * s_w) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    yq = quantize_act(y, jnp.float32(s_out))
    ref = space_to_depth(maxpool(yq, 2, 2, "VALID"), 2)

    # kernel operands exactly as runtime/plan.py prepares them
    wv, _, _ = build_stage0_weights_v2(
        np.asarray(wq), np.ones(16, np.float32), np.zeros(16, np.float32),
        1.0, 1.0)
    scale = jnp.tile(s_w, 4) * (s_in / s_out)
    bias = jnp.tile(b, 4) / s_out
    got = stage0_fused_v2(x, jnp.asarray(wv), scale, bias,
                          jnp.float32(s_in))
    assert got.shape == ref.shape == (1, 104, 104, 64)
    assert_int8_1lsb(got, ref)
