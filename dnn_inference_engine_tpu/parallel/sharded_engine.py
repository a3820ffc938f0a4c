"""End-to-end sharded inference assembly (SURVEY.md N1/N2, BASELINE
config 5: channel-sharded continuous-batching serving).

This module composes the pieces the engine needs to honor
``EngineConfig.mesh_shape``/``sharding``:

- per-stage PartitionSpecs for fused-plan params (the plan is the
  production W8A8 path; its channel-pair conv stages shard exactly like
  the generic layer params);
- ``shard_plan_params`` / ``shard_engine_params``: device_put the
  engine's exec params with their NamedShardings;
- ``make_sharded_detect_fn`` / ``make_sharded_forward_fn``: one jitted
  shard_map program running the WHOLE pipeline per shard — quantized
  forward (fused plan when active), head decode, device NMS — with the
  channel pair's row-parallel conv psumming its int32 accumulator over
  'model' (bit-exact; parallel/shard_map_forward.py).

Activations are batch-sharded over 'data'; decode+NMS are per-image, so
they run on each chip's local batch shard with no collective. The device
boundary is crossed exactly twice per batch (input in, boxes out), same
as single-chip (SURVEY.md 3.5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dnn_inference_engine_tpu.models.layers import Dense, GlobalAvgPool
from dnn_inference_engine_tpu.parallel.sharding import (
    channel_shard_pair, param_specs,
)
from dnn_inference_engine_tpu.parallel.shard_map_forward import (
    make_local_w8a8_forward,
)


def plan_param_specs(model, stages, policy: str = "replicated"
                     ) -> List[Dict[str, P]]:
    """Per-plan-stage PartitionSpec dicts, aligned with
    ``runtime.plan.prepare_plan_params`` output.

    Folded stages tile s_w/b across position groups and are only ever
    early layers — always replicated. Unfolded conv stages inherit the
    layer's spec from ``param_specs`` (the channel pair shards).
    """
    layer_specs = param_specs(model, policy)
    out: List[Dict[str, P]] = []
    for st in stages:
        if st.fold > 1 or st.kind == "s0":
            out.append({})                       # folded/stem: replicated
            continue
        spec = layer_specs[st.conv_li] if st.conv_li < len(layer_specs) \
            else {}
        out.append(spec)
    return out


def _specs_for(params, specs) -> List[Dict[str, P]]:
    """Spec pytree matching the actual params structure (missing keys
    replicate)."""
    return [{k: specs[i].get(k, P()) for k in p}
            for i, p in enumerate(params)]


def shard_engine_params(engine, mesh: Mesh) -> None:
    """device_put the engine's exec params with their NamedShardings
    (plan-stage specs when a fused plan is active, per-layer otherwise).
    Mutates the engine's param references in place."""
    policy = engine.config.sharding
    model = engine.model
    if engine._plan is not None:
        specs = _specs_for(engine._plan_params,
                           plan_param_specs(model, engine._plan, policy))
        engine._plan_params = [
            {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
             for k, v in p.items()}
            for p, spec in zip(engine._plan_params, specs)]
    if engine.params is not None:
        specs = _specs_for(engine.params, param_specs(model, policy))
        engine.params = [
            {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
             for k, v in p.items()}
            for p, spec in zip(engine.params, specs)]


def _out_rank_spec(model, li: int) -> P:
    rank = 4
    for layer in model.layers[:li + 1]:
        if isinstance(layer, (GlobalAvgPool, Dense)):
            rank = 2
    return P(*(("data",) + (None,) * (rank - 1)))


def _head_out_specs(model):
    if model.out_layers is not None:
        return tuple(_out_rank_spec(model, j) for j in model.out_layers)
    return _out_rank_spec(model, len(model.layers) - 1)


def _plan_takes_uint8(engine) -> bool:
    if engine._plan is None or engine.config.mode != "w8a8":
        return False
    from dnn_inference_engine_tpu.runtime.plan import plan_input_uint8_ok
    return plan_input_uint8_ok(engine._plan)


def _make_local_forward(engine, pair: Optional[Tuple[int, int]]):
    """The per-shard forward matching the engine's mode/plan config."""
    model, cfg = engine.model, engine.config

    if engine._plan is not None:
        from dnn_inference_engine_tpu.runtime.plan import (
            plan_forward_w8, plan_forward_w8a8)
        plan = engine._plan
        scales = engine.act_scales

        if cfg.mode == "w8":
            assert pair is None      # channel sharding is w8a8-only

            def local_fwd(params, x):
                return plan_forward_w8(model, plan, params, x)
            return local_fwd

        def local_fwd(params, x):
            return plan_forward_w8a8(model, plan, params, scales, x,
                                     pair=pair)
        return local_fwd

    if cfg.mode == "w8a8":
        return make_local_w8a8_forward(model, engine.act_scales, pair,
                                       kernel=cfg.kernel)

    # fp32 / w8: replicated weights only (pure DP) — the generic forward
    # runs unchanged on the local batch shard
    assert pair is None, (
        f"mode {cfg.mode!r} supports sharding='replicated' (pure DP) only")

    def local_fwd(params, x):
        return model.forward(params, x, mode=cfg.mode,
                             act_scales=engine.act_scales,
                             kernel=cfg.kernel)
    return local_fwd


def _validated_pair(engine, mesh: Mesh) -> Optional[Tuple[int, int]]:
    policy = engine.config.sharding
    if policy == "replicated":
        return None
    if policy != "channel":
        raise ValueError(f"unknown sharding policy {policy!r}")
    if engine.config.mode != "w8a8":
        raise ValueError(
            "sharding='channel' requires mode='w8a8' (the int32-psum "
            "row-parallel conv); use sharding='replicated' for "
            f"mode={engine.config.mode!r}")
    pair = channel_shard_pair(engine.model)
    if pair is None:
        raise ValueError(
            f"{engine.model.name} has no shardable conv pair; use "
            "sharding='replicated'")
    return pair


def _param_in_specs(engine) -> Sequence:
    policy = engine.config.sharding
    model = engine.model
    if engine._plan is not None:
        return _specs_for(engine._plan_params,
                          plan_param_specs(model, engine._plan, policy))
    return _specs_for(engine.params, param_specs(model, policy))


def make_sharded_detect_fn(engine, mesh: Mesh):
    """jit(shard_map) image batch -> (boxes, scores, classes), the whole
    pipeline (forward + decode + NMS) sharded over the mesh."""
    cfg = engine.config
    pair = _validated_pair(engine, mesh)
    local_fwd = _make_local_forward(engine, pair)
    u8_through = _plan_takes_uint8(engine)

    def local_run(params, x):
        if x.dtype == jnp.uint8 and not u8_through:
            x = x.astype(jnp.float32) / 255.0
        heads = local_fwd(params, x)
        return engine.postprocess(heads)

    in_specs = (_param_in_specs(engine), P("data", None, None, None))
    out_specs = (P("data", None, None), P("data", None), P("data", None))

    def fn(params, x):
        return shard_map(local_run, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(params, x)

    return jax.jit(fn)


def make_sharded_forward_fn(engine, mesh: Mesh):
    """jit(shard_map) image batch -> raw head(s)/logits (classify path)."""
    pair = _validated_pair(engine, mesh)
    local_fwd = _make_local_forward(engine, pair)
    out_specs = _head_out_specs(engine.model)
    u8_through = _plan_takes_uint8(engine)

    def local_run(params, x):
        if x.dtype == jnp.uint8 and not u8_through:
            x = x.astype(jnp.float32) / 255.0
        return local_fwd(params, x)

    in_specs = (_param_in_specs(engine), P("data", None, None, None))

    def fn(params, x):
        return shard_map(local_run, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(params, x)

    return jax.jit(fn)
