"""Explicit-collective sharded forward via shard_map (SURVEY.md N2/N3).

Two sharded execution paths exist:

1. ``parallel/sharding.py``: GSPMD derives collectives from NamedShardings
   (the scaling-book recipe). Caveat: XLA converts the Cin-sharded conv's
   int32 partial sums to f32 *before* the psum, and accumulator
   magnitudes (~K*127^2) exceed f32's exact-integer range — a small
   fraction of requantized codes flip vs single-chip execution.

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
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dnn_inference_engine_tpu.models.layers import Conv, MaxPool
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
from dnn_inference_engine_tpu.quant.quantize import quantize_act


def async_collective_flags() -> str:
    """LIBTPU_INIT_ARGS for collective/compute overlap (SURVEY.md N3).

    Set in the environment BEFORE jax initializes, e.g.
      os.environ["LIBTPU_INIT_ARGS"] = async_collective_flags()
    The latency-hiding scheduler then overlaps the conv8 psum with
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


def make_shardmap_forward(model, mesh: Mesh, act_scales: Sequence[float],
                          policy: str = "channel", kernel: str = "xla"):
    """jit(shard_map) W8A8 forward for sequential conv/pool models.

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
    layers = model.layers
    specs = param_specs(model, policy)
    force_pallas = kernel == "pallas"
    use_dispatch = kernel in ("auto", "pallas")

    def _local_fwd(params, x):
        cur_scale = None
        n_layers = len(layers)
        for li, layer in enumerate(layers):
            s_next = jnp.float32(act_scales[li + 1]) if li + 1 <= n_layers \
                else None
            if isinstance(layer, Conv):
                p = params[li]
                if cur_scale is None:
                    cur_scale = jnp.float32(act_scales[li])
                    x = quantize_act(x, cur_scale)
                final = layer.act == "linear"
                if pair is not None and li == pair[1]:
                    # row-parallel: local Cin shard -> int32 psum -> epilogue
                    if use_dispatch and (force_pallas or use_pallas(
                            x.shape, p["wq"].shape, layer.stride)):
                        acc = conv2d_int8_acc(x, p["wq"], layer.stride,
                                              layer.padding)
                    else:
                        acc = _conv(x, p["wq"], layer.stride, layer.padding,
                                    preferred_element_type=jnp.int32)
                    acc = jax.lax.psum(acc, "model")
                    y = acc.astype(jnp.float32) * (cur_scale * p["s_w"]) \
                        + p["b"]
                    y = apply_activation(y, layer.act)
                    x = y if final else quantize_act(y, s_next)
                elif use_dispatch:
                    x = conv2d_w8a8_dispatch(
                        x, cur_scale, p["wq"], p["s_w"], p["b"],
                        act=layer.act, stride=layer.stride,
                        padding=layer.padding,
                        s_out=None if final else s_next,
                        force_pallas=force_pallas)
                else:
                    # replicated or column-parallel (local Cout slice —
                    # per-channel scales/bias are sliced to match)
                    x = conv2d_w8a8(x, cur_scale, p["wq"], p["s_w"], p["b"],
                                    act=layer.act, stride=layer.stride,
                                    padding=layer.padding,
                                    s_out=None if final else s_next)
                cur_scale = None if final else s_next
            elif isinstance(layer, MaxPool):
                x = maxpool(x, layer.size, layer.stride, layer.padding)
            else:
                raise NotImplementedError(
                    f"shard_map forward supports sequential conv/pool "
                    f"models; got {layer}")
        return x

    def fwd_specs(params):
        """PartitionSpec pytree matching the actual params structure."""
        return [
            {k: specs[li].get(k, P()) for k in p}
            for li, p in enumerate(params)
        ]

    def fwd(params, x):
        smapped = shard_map(
            _local_fwd, mesh=mesh,
            in_specs=(fwd_specs(params), P("data", None, None, None)),
            out_specs=P("data", None, None, None),
            check_vma=False,
        )
        return smapped(params, x)

    return jax.jit(fwd)
