"""Explicit-collective sharded forward via shard_map (SURVEY.md N2/N3).

Two sharded execution paths exist:

1. ``parallel/sharding.py``: GSPMD derives collectives from NamedShardings
   (the scaling-book recipe). Caveat: XLA converts the Cin-sharded conv's
   int32 partial sums to f32 *before* the psum, and accumulator
   magnitudes (~K*127^2) exceed f32's exact-integer range — a small
   fraction of requantized codes flip vs single-chip execution. The
   GSPMD path is therefore the pure-DP (replicated weights) tier only;
   channel sharding is contracted to THIS module.

2. This module: shard_map with hand-placed collectives. The heaviest
   conv pair (SURVEY.md 2.5: conv7+conv8 = ~69% of YOLOv2-tiny FLOPs)
   runs column-parallel -> row-parallel:

     conv7: Cout-sharded weights; output channel slice stays LOCAL —
            it is exactly conv8's Cin shard, so no collective between
            the two layers;
     conv8: Cin-sharded contraction -> int32 partial sums ->
            ``lax.psum`` over 'model' ON THE INT32 ACCUMULATOR ->
            f32 epilogue. Bit-exact vs single-chip (tested).

   Activations are batch-sharded over 'data' throughout. One psum per
   forward rides the ICI; XLA's latency-hiding scheduler can overlap it
   with conv9's weight prefetch (see async_collective_flags()).

The local forward covers the FULL layer vocabulary (Conv, MaxPool,
Route, Shortcut, Upsample, GlobalAvgPool, Dense) with the same scale
tracking as Model.forward_w8a8, so YOLOv3-tiny and ResNet-18 shard too.
Graph layers reference only replicated-weight conv outputs (the channel
pair is excluded from out-of-sequence references by
``channel_shard_pair``), so their saved tensors are replicated along
'model' and concat/add stay local.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dnn_inference_engine_tpu.models.layers import (
    Conv, Dense, GlobalAvgPool, MaxPool, Route, Shortcut, Upsample,
)
from dnn_inference_engine_tpu.ops.activations import apply_activation
from dnn_inference_engine_tpu.ops.conv import _conv, conv2d_w8a8
from dnn_inference_engine_tpu.ops.conv_lowering import conv2d_int8_acc
from dnn_inference_engine_tpu.ops.dispatch import (
    conv2d_w8a8_dispatch, use_pallas,
)
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.parallel.sharding import (
    channel_shard_pair, param_specs,
)
from dnn_inference_engine_tpu.quant.quantize import dequantize, quantize_act


def async_collective_flags() -> str:
    """LIBTPU_INIT_ARGS for collective/compute overlap (SURVEY.md N3).

    Set in the environment BEFORE jax initializes — ``init_distributed``
    (parallel/mesh.py) and the serve CLI bring-up do this. The
    latency-hiding scheduler then overlaps the conv8 psum with
    neighboring compute. (On the sandbox's relay terminal these flags are
    owned by the terminal process; on a real pod slice they apply.)
    """
    return " ".join([
        "--xla_tpu_enable_async_collective_fusion=true",
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
        "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
        "--xla_tpu_overlap_compute_collective_tc=true",
        "--xla_enable_async_all_gather=true",
        "--xla_enable_async_collective_permute=true",
    ])


def row_parallel_conv_w8a8(x, p, layer_or_stage, cur_scale, s_out,
                           axis_name: str = "model",
                           use_pallas_tier: bool = False,
                           force_pallas: bool = False):
    """Cin-sharded W8A8 conv: local int8 contraction -> int32 psum over
    ``axis_name`` -> f32 epilogue (+ optional requant). Bit-exact vs the
    unsharded conv because the collective runs on the exact int32
    accumulator (int addition is associative)."""
    stride, padding = layer_or_stage.stride, layer_or_stage.padding
    act = layer_or_stage.act
    if use_pallas_tier and (force_pallas or use_pallas(
            x.shape, p["wq"].shape, stride)):
        acc = conv2d_int8_acc(x, p["wq"], stride, padding)
    else:
        acc = _conv(x, p["wq"], stride, padding,
                    preferred_element_type=jnp.int32)
    acc = jax.lax.psum(acc, axis_name)
    y = acc.astype(jnp.float32) * (cur_scale * p["s_w"]) + p["b"]
    y = apply_activation(y, act)
    return y if s_out is None else quantize_act(y, s_out)


def make_local_w8a8_forward(model, act_scales: Sequence[float],
                            pair: Optional[Tuple[int, int]] = None,
                            kernel: str = "xla",
                            axis_name: str = "model"):
    """The per-shard W8A8 forward: same semantics as Model.forward_w8a8
    on the local batch shard, with the channel pair's row-parallel conv
    psumming its int32 accumulator over ``axis_name``.

    Works for any layer graph. Returns ``local_fwd(params, x)``.
    """
    layers = model.layers
    force_pallas = kernel == "pallas"
    use_dispatch = kernel in ("auto", "pallas")

    def to_f32(t, s):
        return t if s is None else dequantize(t, s)

    def local_fwd(params, x):
        cur_scale = None
        outs: List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = []
        for li, layer in enumerate(layers):
            s_next = jnp.float32(act_scales[li + 1])
            if isinstance(layer, Conv):
                p = params[li]
                if cur_scale is None:
                    cur_scale = jnp.float32(act_scales[li])
                    x = quantize_act(x, cur_scale)
                final = layer.act == "linear"
                s_out = None if final else s_next
                if pair is not None and li == pair[1]:
                    x = row_parallel_conv_w8a8(
                        x, p, layer, cur_scale, s_out, axis_name,
                        use_pallas_tier=use_dispatch,
                        force_pallas=force_pallas)
                elif use_dispatch:
                    x = conv2d_w8a8_dispatch(
                        x, cur_scale, p["wq"], p["s_w"], p["b"],
                        act=layer.act, stride=layer.stride,
                        padding=layer.padding, s_out=s_out,
                        force_pallas=force_pallas)
                else:
                    # replicated or column-parallel (local Cout slice —
                    # per-channel scales/bias are sliced to match)
                    x = conv2d_w8a8(x, cur_scale, p["wq"], p["s_w"], p["b"],
                                    act=layer.act, stride=layer.stride,
                                    padding=layer.padding, s_out=s_out)
                cur_scale = s_out
            elif isinstance(layer, MaxPool):
                x = maxpool(x, layer.size, layer.stride, layer.padding)
            elif isinstance(layer, Upsample):
                x = jnp.repeat(jnp.repeat(x, layer.stride, axis=1),
                               layer.stride, axis=2)
            elif isinstance(layer, Route):
                pieces = [to_f32(*outs[j]) for j in layer.layers]
                x = jnp.concatenate(pieces, axis=-1)
                x = quantize_act(x, s_next)
                cur_scale = s_next
            elif isinstance(layer, Shortcut):
                x = to_f32(x, cur_scale) + to_f32(*outs[layer.frm])
                x = apply_activation(x, layer.act)
                x = quantize_act(x, s_next)
                cur_scale = s_next
            elif isinstance(layer, GlobalAvgPool):
                x = jnp.mean(to_f32(x, cur_scale), axis=(1, 2))
                cur_scale = None
            elif isinstance(layer, Dense):
                p = params[li]
                w = p["wq"].astype(jnp.float32) * p["s_w"]
                x = apply_activation(to_f32(x, cur_scale) @ w + p["b"],
                                     layer.act)
                cur_scale = None
            else:
                raise TypeError(layer)
            outs.append((x, cur_scale))
        x = to_f32(x, cur_scale)
        if model.out_layers is not None:
            return tuple(to_f32(*outs[j]) for j in model.out_layers)
        return x

    return local_fwd


def make_shardmap_forward(model, mesh: Mesh, act_scales: Sequence[float],
                          policy: str = "channel", kernel: str = "xla"):
    """jit(shard_map) W8A8 forward for any layer-graph model.

    Returns ``fwd(params, x)`` where params must be placed with
    ``shard_params(..., policy)`` and x batch-sharded. The function is
    also correct for policy='replicated' (no psum inserted).

    ``kernel``: 'xla' (stock conv tier) or 'auto'/'pallas' — pallas_call
    is opaque to GSPMD but legal under shard_map, where each chip runs
    the fused Pallas GEMM on its local shard; the row-parallel conv uses
    the kernel's raw_acc mode so the psum still happens on the exact
    int32 accumulator before the epilogue.
    """
    pair = channel_shard_pair(model) if policy == "channel" else None
    specs = param_specs(model, policy)
    local_fwd = make_local_w8a8_forward(model, act_scales, pair, kernel)

    def fwd_specs(params):
        """PartitionSpec pytree matching the actual params structure."""
        return [
            {k: specs[li].get(k, P()) for k in p}
            for li, p in enumerate(params)
        ]

    # batch axis sharded over 'data'; trailing axes replicated — output
    # rank varies by model (detector heads rank 4, classifier logits
    # rank 2), derived statically from the layer graph
    def _rank_spec(li):
        rank = 4
        for layer in model.layers[:li + 1]:
            if isinstance(layer, (GlobalAvgPool, Dense)):
                rank = 2
        return P(*(("data",) + (None,) * (rank - 1)))

    if model.out_layers is not None:
        out_specs = tuple(_rank_spec(j) for j in model.out_layers)
    else:
        out_specs = _rank_spec(len(model.layers) - 1)

    def fwd(params, x):
        smapped = shard_map(
            local_fwd, mesh=mesh,
            in_specs=(fwd_specs(params), P("data", None, None, None)),
            out_specs=out_specs,
            check_vma=False,
        )
        return smapped(params, x)

    return jax.jit(fwd)
