"""Execution plans: per-layer kernel strategy for the fused W8A8 pipeline.

The generic Model.forward_* methods (models/model.py) are the semantic
reference. A *plan* rewrites a sequential conv/pool model into fused
stages chosen from measured-fastest implementations per shape (v5e,
batch 32, min-of-reps timing — see bench notes in ops/pallas_conv.py):

  strategy        implementation
  --------------  ----------------------------------------------------------
  xla             ops.conv.conv2d_w8a8 (+ separate maxpool)
  gemm            ops.conv_lowering im2col + flat Pallas GEMM (late layers)
  rs[:f]          ops.pallas_conv row-streaming kernel, optional fold-2
  fold[:f]:xla    space-to-depth folded conv via XLA + group-max pooling

Folded stages absorb the following 2x2/s2 maxpool into a channel
group-max — exact in int8 (max commutes with the monotone requant; the
fold itself is the same MAC set reassociated, and int32 accumulation is
order-independent). Activation scales follow the same tracking as
Model.forward_w8a8: each conv requantizes to the calibrated scale of its
own output tensor; pools preserve scale.

Plans currently cover strictly sequential conv/pool models (YOLOv2-tiny).
Models with routes/shortcuts fall back to the generic forward.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.models.layers import Conv, MaxPool
from dnn_inference_engine_tpu.ops.conv import conv2d_w8a8
from dnn_inference_engine_tpu.ops.conv_lowering import conv2d_w8a8_pallas
from dnn_inference_engine_tpu.ops.pallas_conv import (
    conv3x3_rs, depth_to_space, fold_conv3x3_k2_weights, fold_conv3x3_weights,
    fold_group_pool_channels, shift_space_to_depth, space_to_depth,
)
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.quant.quantize import quantize_act


@dataclasses.dataclass
class Stage:
    kind: str                     # xla | gemm | rs | fold_xla
    conv_li: int                  # layer index of the conv
    pool_li: Optional[int]        # fused following MaxPool layer (or None)
    fold: int = 1                 # 1 (unfolded) or fold factor (+ gmax)
    k: int = 3                    # folded kernel size (3 = SAME, 2 = shifted VALID)
    s2d_out: bool = False         # kernel emits s2d(2) fold layout
    act: str = "leaky"
    stride: int = 1
    s_out_is_final: bool = False


# measured-fastest strategy for YOLOv2-tiny @ batch 32 on v5e.
# conv1 folds at f=4: its fold-2 shape (208,208,12)->64 hits XLA's slow
# path (~4-5ms); (104,104,48)->256 does not. Its fold-2-layout output
# then feeds conv2's fold-2 stage with no relayout between them.
# Relayout-minimized chain: conv1's k2-f4 stage emits fold-2 layout that
# conv2's k3-f2 stage reads directly; conv3/conv5 take one small XLA s2d
# each. (Kernel-side s2d_out would remove those too, but its stride-2
# column extraction lowers to a >2D gather Mosaic rejects — CPU tests
# keep the path alive for when Mosaic grows strided-slice support.)
# Profiling showed XLA s2d/relayout copies previously cost more than all
# conv kernels combined (~2.2 ms/iter at batch 32).
_YOLOV2_STRATEGY = {
    # A/B same-job min-of-5 on v5e (batch 32): this mix 4.39 ms/batch vs
    # 5.41 for the all-rs chain and 5.51 for xla-early+gemm-late.
    0: ("fold_xla", 4),     # conv1 folded f4; fold-2 output chains to conv2
    2: ("fold_xla", 2),     # conv2 folded f2 (chained in, no relayout)
    4: ("rs", 2),           # conv3: rs kernel f2 + fused gmax
    6: ("xla", 1),          # conv4: XLA direct + pool
    8: ("gemm", 1),         # conv5-conv9: flat Pallas GEMM tier
    10: ("gemm", 1),
    12: ("gemm", 1),
    13: ("gemm", 1),
    14: ("gemm", 1),
}


def build_plan(model, strategy: Optional[Dict] = None) -> Optional[List[Stage]]:
    """Sequential conv/pool model -> list of stages; None if unsupported."""
    if strategy is None:
        strategy = _YOLOV2_STRATEGY if model.name == "yolov2-tiny" else None
    if strategy is None:
        return None
    stages: List[Stage] = []
    layers = model.layers
    li = 0
    while li < len(layers):
        layer = layers[li]
        if isinstance(layer, Conv):
            if li not in strategy:
                return None
            entry = strategy[li]
            kind, fold = entry[0], entry[1]
            opts = entry[2] if len(entry) > 2 else {}
            pool_li = None
            nxt = li + 1
            if (fold > 1 and nxt < len(layers)
                    and isinstance(layers[nxt], MaxPool)
                    and layers[nxt].stride == 2 and layers[nxt].size == 2):
                pool_li = nxt
            if fold > 1 and pool_li is None:
                return None            # fold requires the absorbable pool
            stages.append(Stage(
                kind={"fold_xla": "fold_xla", "rs": "rs", "rs2": "rs",
                      "xla": "xla", "gemm": "gemm"}[kind],
                conv_li=li, pool_li=pool_li, fold=fold,
                k=2 if kind == "rs2" else 3,
                s2d_out=opts.get("s2d_out", False), act=layer.act,
                stride=layer.stride,
                s_out_is_final=(layer.act == "linear")))
            li = (pool_li + 1) if pool_li is not None else li + 1
        elif isinstance(layer, MaxPool):
            stages.append(Stage(kind="pool", conv_li=li, pool_li=None))
            li += 1
        else:
            return None
    return stages


def prepare_plan_params(model, qparams: Sequence[Dict],
                        stages: Sequence[Stage]) -> List[Dict]:
    """Pre-fold weights for folded stages (host-side, once)."""
    out: List[Dict] = []
    for st in stages:
        if st.kind == "pool":
            out.append({})
            continue
        p = qparams[st.conv_li]
        if st.fold > 1:
            f = st.fold
            folder = (fold_conv3x3_k2_weights if st.k == 2
                      else fold_conv3x3_weights)
            # rs stages use the pool-major group order (fast fused gmax)
            wf = folder(np.asarray(p["wq"]), f, pool_major=(st.kind == "rs"))
            out.append({"wq": jnp.asarray(wf),
                        "s_w": jnp.tile(jnp.asarray(p["s_w"]), f * f),
                        "b": jnp.tile(jnp.asarray(p["b"]), f * f)})
        else:
            out.append({k: jnp.asarray(v) for k, v in p.items()})
    return out


def plan_forward_w8a8(model, stages: Sequence[Stage],
                      plan_params: Sequence[Dict], act_scales, x):
    """Run the fused stage pipeline. x: (N,H,W,3) f32; returns f32 head."""
    layers = model.layers
    cur_scale = None
    cur_fold = 1                  # s2d fold factor of the tensor in ``x``
    for si, st in enumerate(stages):
        pp = plan_params[si]
        # label every op of this stage in traces/HLO (profiling.py)
        with jax.named_scope(
                f"stage{si}_{st.kind}_L{st.conv_li}"
                + (f"_fold{st.fold}" if st.fold > 1 else "")):
            x, cur_scale, cur_fold = _run_stage(
                layers, st, pp, x, cur_scale, cur_fold, act_scales)
    if cur_fold > 1:
        x = depth_to_space(x, cur_fold)
    return x


def _run_stage(layers, st, pp, x, cur_scale, cur_fold, act_scales):
    """One plan stage; returns (x, cur_scale, cur_fold)."""
    if st.kind == "pool":
        if cur_fold > 1:
            x = depth_to_space(x, cur_fold)
            cur_fold = 1
        lay = layers[st.conv_li]
        x = maxpool(x, lay.size, lay.stride, lay.padding)
        return x, cur_scale, cur_fold
    li = st.conv_li
    if cur_scale is None:
        cur_scale = jnp.float32(act_scales[li])
        x = quantize_act(x, cur_scale)
    # layout: folded stages consume s2d(fold) of the plain tensor; the
    # k=2 formulation consumes the SHIFTED fold (never chainable)
    if st.fold > 1 and st.k == 2:
        if cur_fold > 1:
            x = depth_to_space(x, cur_fold)
        x = shift_space_to_depth(x, st.fold)
        cur_fold = st.fold
    else:
        need_fold = st.fold if st.fold > 1 else 1
        if cur_fold != need_fold:
            if cur_fold > 1:
                x = depth_to_space(x, cur_fold)
            if need_fold > 1:
                x = space_to_depth(x, need_fold)
            cur_fold = need_fold
    # requant target: the calibrated scale of this conv's output
    if st.s_out_is_final:
        s_out = None
    else:
        s_out = jnp.float32(act_scales[li + 1])

    if st.kind == "xla":
        x = conv2d_w8a8(x, cur_scale, pp["wq"], pp["s_w"], pp["b"],
                        act=st.act, stride=st.stride, s_out=s_out)
    elif st.kind == "gemm":
        x = conv2d_w8a8_pallas(x, cur_scale, pp["wq"], pp["s_w"],
                               pp["b"], act=st.act, stride=st.stride,
                               s_out=s_out)
    elif st.kind in ("fold_xla", "rs"):
        assert s_out is not None
        f = st.fold
        cout = pp["s_w"].shape[0] // (f * f)   # static (from shape)
        if st.kind == "rs":
            scale = (cur_scale * pp["s_w"]) / s_out
            bias = pp["b"] / s_out
            x = conv3x3_rs(x, pp["wq"], scale, bias, act=st.act,
                           quantize_out=True, pool=("gmaxm", f, cout),
                           ksize=st.k, s2d_out=st.s2d_out)
        else:
            y = jax.lax.conv_general_dilated(
                x, pp["wq"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (cur_scale * pp["s_w"]) + pp["b"]
            y = jnp.where(y > 0, y, 0.1 * y) if st.act == "leaky" else y
            y = quantize_act(y, s_out)
            x = fold_group_pool_channels(y, f, cout)
        cur_fold = f // 2     # gmax output is in fold-(f/2) layout
        if st.kind == "rs" and st.s2d_out:
            cur_fold *= 2     # the kernel emitted the next fold level
    else:
        raise ValueError(st.kind)
    cur_scale = None if s_out is None else s_out
    return x, cur_scale, cur_fold
