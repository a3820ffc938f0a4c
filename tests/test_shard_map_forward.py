"""Explicit-collective shard_map forward tests (SURVEY.md N2/N3).

Key property: the int32 psum on the row-parallel conv's accumulator makes
the sharded forward BIT-EXACT vs single-chip (unlike the GSPMD path,
whose f32-converted partial sums flip boundary codes — see
test_sharding.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dnn_inference_engine_tpu.models import yolov2_tiny
from dnn_inference_engine_tpu.parallel.mesh import make_mesh
from dnn_inference_engine_tpu.parallel.shard_map_forward import (
    async_collective_flags, make_shardmap_forward,
)
from dnn_inference_engine_tpu.parallel.sharding import (
    input_sharding, shard_params,
)
from dnn_inference_engine_tpu.quant.quantize import (
    calibrate, quantize_model_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _setup(rng):
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    scales = calibrate(model, params, images, batch=8)
    qparams = quantize_model_params(params, model.layers)
    ref = np.asarray(model.forward_w8a8(qparams, scales,
                                        jnp.asarray(images)))
    return model, qparams, scales, images, ref


def _run(model, qparams, scales, images, mesh_shape, policy):
    mesh = make_mesh(mesh_shape)
    sharded = shard_params(qparams, mesh, model, policy)
    fwd = make_shardmap_forward(model, mesh, scales, policy)
    x = jax.device_put(jnp.asarray(images), input_sharding(mesh))
    return np.asarray(fwd(sharded, x))


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 2)])
def test_channel_sharding_adds_zero_error(rng, mesh_shape):
    """The int32 psum on the row-parallel conv's accumulator makes the
    channel-sharded forward BIT-IDENTICAL to the replicated shard_map
    forward — the collective introduces no numeric error at all (the
    GSPMD path flips ~12% of boundary codes; see test_sharding.py)."""
    model, qparams, scales, images, _ref = _setup(rng)
    got = _run(model, qparams, scales, images, mesh_shape, "channel")
    rep = _run(model, qparams, scales, images, (8, 1), "replicated")
    np.testing.assert_array_equal(got, rep)


@pytest.mark.parametrize("mesh_shape,policy", [
    ((4, 2), "channel"),
    ((8, 1), "replicated"),
])
def test_shardmap_matches_generic_forward(rng, mesh_shape, policy):
    """vs the generic Model.forward_w8a8: equal up to f32 fusion-order
    rounding at requant boundaries (separately compiled programs may
    fuse the f32 epilogue differently; an unlucky boundary flip then
    cascades through later requants for that image)."""
    model, qparams, scales, images, ref = _setup(rng)
    got = _run(model, qparams, scales, images, mesh_shape, policy)
    rel = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rel < 0.02, rel


def test_async_flags_wellformed():
    flags = async_collective_flags()
    assert all(f.startswith("--xla") for f in flags.split())


def test_pallas_kernel_tier_under_shardmap(rng):
    """kernel='auto' runs the fused Pallas GEMM tier inside shard_map
    (raw_acc mode on the row-parallel conv keeps the psum in int32).
    Channel-sharded pallas-tier output must be bit-identical to the
    replicated pallas-tier output (same local epilogue code; exact
    int32 contraction regardless of the Cin split)."""
    model, qparams, scales, images, _ref = _setup(rng)

    def run(mesh_shape, policy):
        mesh = make_mesh(mesh_shape)
        sharded = shard_params(qparams, mesh, model, policy)
        fwd = make_shardmap_forward(model, mesh, scales, policy,
                                    kernel="auto")
        x = jax.device_put(jnp.asarray(images), input_sharding(mesh))
        return np.asarray(fwd(sharded, x))

    got = run((4, 2), "channel")
    rep = run((8, 1), "replicated")
    np.testing.assert_array_equal(got, rep)
    # and quantization-grade agreement with the generic forward
    ref = np.asarray(model.forward_w8a8(qparams, scales,
                                        jnp.asarray(images), kernel="auto"))
    rel = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rel < 0.02, rel


def test_raw_acc_gemm_exact(rng):
    """gemm_fused(raw_acc=True) returns the exact int32 accumulator."""
    from dnn_inference_engine_tpu.ops.pallas_gemm import gemm_fused
    a = rng.integers(-127, 128, (37, 200), dtype=np.int8)
    b = rng.integers(-127, 128, (200, 65), dtype=np.int8)
    dummy = jnp.zeros((65,), jnp.float32)
    acc = gemm_fused(jnp.asarray(a), jnp.asarray(b), dummy, dummy,
                     act="linear", raw_acc=True)
    assert acc.dtype == jnp.int32
    ref = a.astype(np.int32) @ b.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(acc), ref)


@pytest.mark.parametrize("name,size", [
    ("yolov3-tiny", 64),
    ("resnet18", 64),
])
def test_graph_models_channel_sharded_bit_exact(rng, name, size):
    """Graph models (routes/upsample; shortcuts/GAP/dense) under
    shard_map: channel-sharded output bit-identical to replicated."""
    from dnn_inference_engine_tpu.models import build_model
    from dnn_inference_engine_tpu.parallel.sharding import channel_shard_pair
    model = build_model(name)
    assert channel_shard_pair(model) is not None
    params = model.init_params(jax.random.PRNGKey(0))
    images = rng.uniform(0, 1, (8, size, size, 3)).astype(np.float32)
    scales = calibrate(model, params, images, batch=8)
    qparams = quantize_model_params(params, model.layers)

    def run(mesh_shape, policy):
        mesh = make_mesh(mesh_shape)
        sharded = shard_params(qparams, mesh, model, policy)
        fwd = make_shardmap_forward(model, mesh, scales, policy)
        x = jax.device_put(jnp.asarray(images), input_sharding(mesh))
        out = fwd(sharded, x)
        return [np.asarray(o) for o in (out if isinstance(out, tuple)
                                        else (out,))]

    got = run((4, 2), "channel")
    rep = run((8, 1), "replicated")
    for g, r in zip(got, rep):
        if name == "resnet18":
            # the int8 chain is exact, but the f32 GAP/Dense tail's
            # reduction order depends on the local batch tiling (dp=4 vs
            # dp=8 compile different programs) — logits agree to f32
            # rounding, not bit-exactly
            np.testing.assert_allclose(g, r, rtol=5e-3, atol=1e-4)
        else:
            # detector heads: elementwise f32 epilogue on exact int32
            # accumulators — bit-identical across shardings
            np.testing.assert_array_equal(g, r)
    # quantization-grade agreement with the generic forward
    ref = model.forward_w8a8(qparams, scales, jnp.asarray(images))
    refs = [np.asarray(o) for o in (ref if isinstance(ref, tuple)
                                    else (ref,))]
    for g, r in zip(got, refs):
        rel = np.sqrt(np.mean((g - r) ** 2)) / np.sqrt(np.mean(r ** 2))
        assert rel < 0.02, rel


def test_channel_pair_avoids_referenced_layers():
    """A conv whose output feeds a Route/Shortcut/head out of sequence
    cannot be the Cout-sharded half of the pair (its saved tensor would
    be a channel slice)."""
    from dnn_inference_engine_tpu.models import build_model
    from dnn_inference_engine_tpu.parallel.sharding import (
        _out_of_sequence_refs, channel_shard_pair)
    for name in ("yolov2-tiny", "yolov3-tiny", "resnet18"):
        model = build_model(name)
        pair = channel_shard_pair(model)
        refs = _out_of_sequence_refs(model)
        assert pair is not None
        assert not any(li in refs for li in range(pair[0], pair[1]))
