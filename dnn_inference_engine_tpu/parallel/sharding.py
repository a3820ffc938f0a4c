"""Sharding policies: replicated / channel-sharded weights, batch-sharded
activations (SURVEY.md sections 2.6, 2.9 N2).

Policy 'channel' implements the [B] pattern on the heaviest consecutive
conv pair (conv7/conv8 carry ~69% of YOLOv2-tiny FLOPs, SURVEY.md 2.5):

- first conv of the pair:  Cout-sharded  (column-parallel; HWIO weight
  ``P(None, None, None, 'model')``, per-channel bias/scales sharded)
- second conv of the pair: Cin-sharded   (row-parallel; weight
  ``P(None, None, 'model', None)``), whose contraction over the sharded
  axis makes XLA insert the psum — the collective rides ICI, derived by
  GSPMD from the NamedShardings rather than hand-written (scaling-book
  recipe: annotate shardings, let XLA insert collectives).

Activations are batch-sharded over the 'data' axis in all policies.

Note: the sharded path drives the XLA conv tier; ``pallas_call`` is
opaque to GSPMD, so running Pallas kernels under a model-sharded mesh
requires a shard_map wrapper with explicit collectives (planned N3 work).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnn_inference_engine_tpu.models.layers import Conv, MaxPool, Upsample


def _conv_flops(model, input_size: Optional[int] = None) -> Dict[int, float]:
    """Per-conv-layer MAC estimate (spatial tracked like dispatch.tier_report)."""
    flops = {}
    h = w = input_size or model.input_size
    prev_c = model.in_ch
    chans = model.out_channels()
    sizes = []
    for li, layer in enumerate(model.layers):
        if isinstance(layer, Conv):
            ho, wo = -(-h // layer.stride), -(-w // layer.stride)
            flops[li] = (ho * wo * layer.ksize * layer.ksize
                         * prev_c * layer.out_ch)
            h, w = ho, wo
        elif isinstance(layer, MaxPool) and layer.stride > 1:
            h, w = -(-h // layer.stride), -(-w // layer.stride)
        elif isinstance(layer, Upsample):
            h, w = h * layer.stride, w * layer.stride
        elif hasattr(layer, "layers"):       # Route
            h, w = sizes[layer.layers[0]]
        sizes.append((h, w))
        prev_c = chans[li]
    return flops


def _out_of_sequence_refs(model) -> set:
    """Layer indices whose outputs are consumed out of sequence (Route /
    Shortcut sources, detection heads)."""
    refs = set()
    for layer in model.layers:
        if hasattr(layer, "layers"):         # Route
            refs.update(layer.layers)
        elif hasattr(layer, "frm"):          # Shortcut
            refs.add(layer.frm)
    if model.out_layers is not None:
        refs.update(model.out_layers)
    return refs


def channel_shard_pair(model) -> Optional[Tuple[int, int]]:
    """The (Cout-shard, Cin-shard) conv pair: consecutive convs (channel
    count preserved between them) maximizing combined FLOPs.

    A pair is eligible only if nothing references the first conv's (or
    any in-between layer's) output out of sequence: that tensor is
    Cout-SHARDED along 'model', so a Route/Shortcut/head reading it would
    see one channel slice. The second conv's output is psum-replicated
    and safe to reference.
    """
    flops = _conv_flops(model)
    refs = _out_of_sequence_refs(model)
    conv_ids = sorted(flops)
    best, best_val = None, 0.0
    for a, b in zip(conv_ids, conv_ids[1:]):
        # b must consume a's channels unchanged (only pools/upsamples between)
        between = model.layers[a + 1:b]
        if any(not isinstance(l, (MaxPool, Upsample)) for l in between):
            continue
        if any(li in refs for li in range(a, b)):
            continue
        val = flops[a] + flops[b]
        if val > best_val:
            best, best_val = (a, b), val
    return best


def param_specs(model, policy: str = "replicated") -> List[Dict[str, P]]:
    """Per-layer PartitionSpec dict for every param leaf."""
    specs: List[Dict[str, P]] = []
    pair = channel_shard_pair(model) if policy == "channel" else None
    for li, layer in enumerate(model.layers):
        if not isinstance(layer, Conv):
            specs.append({})
            continue
        if pair and li == pair[0]:
            # column-parallel: split output channels
            specs.append({"w": P(None, None, None, "model"),
                          "wq": P(None, None, None, "model"),
                          "s_w": P("model"), "b": P("model")})
        elif pair and li == pair[1]:
            # row-parallel: split input channels; psum derives the output
            specs.append({"w": P(None, None, "model", None),
                          "wq": P(None, None, "model", None),
                          "s_w": P(), "b": P()})
        else:
            specs.append({k: P() for k in ("w", "wq", "s_w", "b")})
    return specs


def shard_params(params: Sequence[Dict], mesh: Mesh, model,
                 policy: str = "replicated") -> List[Dict]:
    """device_put every param leaf with its NamedSharding."""
    specs = param_specs(model, policy)
    out = []
    for p, spec in zip(params, specs):
        out.append({
            k: jax.device_put(v, NamedSharding(mesh, spec.get(k, P())))
            for k, v in p.items()
        })
    return out


def input_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded NHWC activations."""
    return NamedSharding(mesh, P("data", None, None, None))


def make_sharded_forward(model, mesh: Mesh, mode: str = "w8a8",
                         act_scales=None, donate: bool = False):
    """jit the full forward with batch-sharded inputs; weight shardings
    travel with the (already device_put) params. Output replicated.

    CONTRACT NOTE: this GSPMD tier is the *pure-DP* path (replicated
    weights; exact — no collectives inside the forward). It still runs
    with channel-sharded params, but XLA then converts the Cin-sharded
    conv's int32 partial sums to f32 before its derived psum, flipping a
    small fraction of requant boundary codes vs single-chip execution.
    Channel sharding with bit-exact int32 psums is contracted to
    ``parallel.shard_map_forward.make_shardmap_forward`` — the engine
    and serve paths use that.
    """

    def fwd(params, x):
        return model.forward(params, x, mode=mode, act_scales=act_scales,
                             kernel="xla")

    return jax.jit(
        fwd,
        in_shardings=(None, input_sharding(mesh)),   # params keep their placement
        out_shardings=NamedSharding(mesh, P()),
    )
