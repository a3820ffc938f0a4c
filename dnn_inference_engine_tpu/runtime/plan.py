"""Execution plans: per-layer kernel strategy for the fused W8A8 pipeline.

The generic Model.forward_* methods (models/model.py) are the semantic
reference. A *plan* rewrites a layer-list model into fused stages chosen
from measured-fastest implementations per shape (v5e, batch 32,
min-of-reps timing — see bench notes in ops/pallas_conv.py):

  strategy        implementation
  --------------  ----------------------------------------------------------
  xla             ops.conv.conv2d_w8a8 (+ separate maxpool)
  gemm            ops.conv_lowering im2col + flat Pallas GEMM (late layers)
  auto            ops.dispatch per-shape choice between the two above
  rs[:f]          ops.pallas_conv row-streaming kernel, optional fold-2
  fold[:f]:xla    space-to-depth folded conv via XLA + group-max pooling

Folded stages absorb the following 2x2/s2 maxpool into a channel
group-max — exact in int8 (max commutes with the monotone requant; the
fold itself is the same MAC set reassociated, and int32 accumulation is
order-independent). Activation scales follow the same tracking as
Model.forward_w8a8: each conv requantizes to the calibrated scale of its
own output tensor; pools preserve scale.

Plans cover the full layer vocabulary: graph layers (Route concat,
Shortcut residual add, Upsample, GlobalAvgPool, Dense) execute with the
same semantics as Model.forward_w8a8, so YOLOv3-tiny and ResNet-18 run
fused plans too. Layer outputs referenced later (route/shortcut sources,
detection heads) are kept de-folded; folding is disallowed on a conv
whose pre-pool output is itself referenced (build_plan returns None and
the engine falls back to the generic forward).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.models.layers import (
    Conv, Dense, GlobalAvgPool, MaxPool, Route, Shortcut, Upsample,
)
from dnn_inference_engine_tpu.ops.activations import apply_activation
from dnn_inference_engine_tpu.ops.conv import conv2d_w8a8
from dnn_inference_engine_tpu.ops.conv_lowering import conv2d_w8a8_pallas
from dnn_inference_engine_tpu.ops.dispatch import conv2d_w8a8_dispatch
from dnn_inference_engine_tpu.ops.pallas_conv import (
    conv3x3_rs, depth_to_space, fold_conv3x3_k2_weights, fold_conv3x3_weights,
    fold_group_pool_channels, shift_space_to_depth, space_to_depth,
)
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.quant.quantize import dequantize, quantize_act


@dataclasses.dataclass
class Stage:
    kind: str                     # conv kinds: xla|gemm|auto|rs|fold_xla
                                  # graph kinds: pool|route|shortcut|upsample|gap|dense
    conv_li: int                  # layer index this stage implements
    pool_li: Optional[int]        # fused following MaxPool layer (or None)
    fold: int = 1                 # 1 (unfolded) or fold factor (+ gmax)
    k: int = 3                    # folded kernel size (3 = SAME, 2 = shifted VALID)
    s2d_out: bool = False         # kernel emits s2d(2) fold layout
    cin_pad: int = 0              # lane-pad folded input channels to this
                                  # (zero channels x zero weight rows — exact;
                                  # XLA's int8 conv emitter runs 2x faster at
                                  # 64-aligned Cin: 305 vs 609 us measured on
                                  # the conv1-f4 stage, v5e batch 32)
    act: str = "leaky"
    stride: int = 1
    padding: str = "SAME"
    s_out_is_final: bool = False


# A/B toggle for the one-pass Pallas shift-s2d(2) feeding chained
# fold_xla_k2 f=2 stages (see that branch in _run_stage); module-level so
# benchmarks can interleave both paths in one process.
USE_SHIFT_S2D2_KERNEL = True

_CONV_KINDS = {"fold_xla": "fold_xla", "fold_xla_k2": "fold_xla_k2",
               "fold_xla_s2": "fold_xla_s2",
               "rs": "rs", "rs2": "rs", "stem_rs": "stem_rs",
               "stem_dg": "stem_dg",
               "xla": "xla", "gemm": "gemm", "auto": "auto", "s0": "s0"}

# measured-fastest strategy for YOLOv2-tiny @ batch 32 on v5e.
# conv1 folds at f=4: its fold-2 shape (208,208,12)->64 hits XLA's slow
# path (~4-5ms); (104,104,48)->256 does not. Its fold-2-layout output
# then feeds conv2's fold-2 stage with no relayout between them.
# Relayout-minimized chain: conv1's k2-f4 stage emits fold-2 layout that
# conv2's k3-f2 stage reads directly; conv3/conv5 take one small XLA s2d
# each. (The rs kernel's s2d_out emission compiles on TPU since round 2
# — _parity_extract's flatten-reshape-index form — but the rs tier
# itself loses to XLA at these shapes, so the XLA s2d stays.)
# Profiling showed XLA s2d/relayout copies previously cost more than all
# conv kernels combined (~2.2 ms/iter at batch 32).
_YOLOV2_STRATEGY = {
    # Round-2 re-sweep driven by Engine.stage_times on v5e (batch 32):
    # the executed-stage roofline table showed conv1 (1.04 ms, 18.7% HW
    # util), conv3 (0.28 ms, 11.5%) and the following (104,104,64) pool
    # (0.58 ms!) carrying most of the 2.65 ms total while conv5-conv8
    # already ran at 76-95% MFU. Measured fixes:
    # - conv1 f4 with folded Cin lane-padded 48->64: XLA's int8 conv
    #   emitter is 2x faster at 64-aligned Cin (305 vs 609 us);
    # - conv3 folded f2 (52,52,128)->256 + gmax: 164 us REPLACES
    #   conv3-xla (281 us) + the pathological reduce_window pool
    #   (574 us; XLA relayouts at C=64/W=104) — the s2d(2) relayout
    #   between conv2 and conv3 measures <1 us;
    # - conv5-conv9 stay XLA: 76-95% MFU in-graph (the native conv
    #   emitter beats both the im2col+GEMM tier and the batched
    #   shift-GEMM tail kernel standalone at these shapes).
    # - conv1 f4 via the k2 SHIFTED fold (fold_conv3x3_k2_weights:
    #   4f^2/9 of the k3 MACs) + cin_pad 64: whole-net 2.09 ms vs 2.62
    #   (k3-pad64) vs 2.77 (k2 unpadded) — same-process min A/B.
    # Round-2b re-sweep (same-process min A/B on v5e, uint8 wire):
    # - stage 0 -> stem_rs: the ONE-KERNEL fused stem (quantize + shifted
    #   s2d(4) + 2x2 folded conv + i32 group-max + epilogue, see
    #   pallas_conv.stem_fused_k2): 0.67-0.73 ms vs 1.16-1.21 for the
    #   fold_xla_k2 XLA chain; whole-net 2.14 vs 2.58 ms. cin_pad 64
    #   beats 48 (tile-aligned A_cat writes): 2.28 vs 2.39 whole-net.
    # - conv3 (L4) -> the k2 shifted fold: 0.40 ms vs 0.42 (k3); the
    #   pallas rs tier LOSES here ((104,104,64)x128: 1.15 ms vs 0.10-0.17
    #   XLA; (52,52,128)x256: 0.55-0.60 vs 0.40-0.42) — XLA's int8 conv
    #   emitter wins at MXU-dense mid-net shapes, keep it.
    # Round-3 NEGATIVE RESULT (tools/ab_stem.py, interleaved min A/B on
    # v5e batch 32, uint8 wire): the transpose-free dot_general stem
    # (stem_dg: 4 per-tap sublane-contracting GEMMs, no A_cat scratch,
    # no K 192->256 pad) measures 0.762 ms stage-0 / 2.22-2.25 ms
    # whole-net vs stem_rs's 0.724 / 2.18-2.19 — the in-kernel
    # transposes were NOT the limiter (Mosaic relayouts the sublane
    # contraction internally; 4 K=48 GEMMs underfill the MXU vs one
    # K=256). Both land ~12% HW-util; the stage is VPU/issue-bound.
    # stem_dg stays selectable so plan-sweep keeps re-measuring it.
    # Round-4 NEGATIVE RESULT (docs/FRONTEND_FLOORS.md, xplane-traced):
    # the conv2 seam (L2 fold_xla) costs 598 us in context — conv 217 +
    # gmax fusion 235 + boundary relayout 146 — and FOUR replacement
    # strategies all measured worse: all-XLA middle 2.197 vs 2.142 ms
    # whole-net; rs kernel at this shape 1007 us standalone; DMA-
    # assembled A_cat impossible (offsets+extents must be tile-aligned,
    # tools/probe_dma_rules.py); the fused gmax+shift-s2d kernel
    # (fold_xla_s2) 405 us alone vs a 61 us floor (Mosaic can't
    # legalize int8 vector max -> i32 upcast over the 44 MB input) —
    # whole-net 2.133 vs 2.061. fold_xla stays; fold_xla_s2 stays
    # selectable so plan-sweep re-measures it on future toolchains.
    0: ("stem_rs", 4, {"cin_pad": 64}),
    2: ("fold_xla", 2),     # conv2 folded f2 (chained in, no relayout)
    4: ("fold_xla_k2", 2),  # conv3 shifted-k2 f2 (absorbs the slow pool)
    6: ("xla", 1),
    8: ("xla", 1),
    10: ("xla", 1),
    12: ("xla", 1),
    13: ("xla", 1),
    14: ("xla", 1),
}

# YOLOv3-tiny @ batch 16: MEASURED (round-4 re-sweep with auto-scaled
# loop counts, docs/SWEEP_yolov3_w8a8_b16.json: 1.023 ms/batch =
# 15.6k img/s, 2 passes, 0 crashes). Differs from the yolov2-b32
# inheritance it replaced: stem_dg WINS at b16 (1.0234 vs stem_rs
# 1.0551 — half the batch halves the stem grid, and the transpose-free
# formulation's smaller per-cell fixed cost pays off); the rest match.
_YOLOV3_STRATEGY = {
    0: ("stem_dg", 4),
    2: ("fold_xla", 2),
    4: ("fold_xla_k2", 2),                    # absorbs the C=64 pool

    6: ("xla", 1),
    8: ("xla", 1),
    10: ("xla", 1),
    12: ("xla", 1),
    13: ("xla", 1),
    14: ("xla", 1),
    15: ("xla", 1),
    17: ("xla", 1),
    20: ("xla", 1),
    21: ("xla", 1),
}

_DEFAULT_STRATEGIES = {
    "yolov2-tiny": _YOLOV2_STRATEGY,
    "yolov3-tiny": _YOLOV3_STRATEGY,
    # resnet18: no entry -> every conv defaults to ("xla", 1). Measured
    # (224x224 batch 32, v5e): all-xla 1.10 ms vs 2.27 ms for the
    # dispatch-auto mix that routed deep blocks to the im2col+GEMM tier.
    #
    # NEGATIVE RESULT (round 2, do not re-try without new evidence): a
    # fused Pallas stem for the 7x7/s2 conv + 3x3/s2 pool (quantize +
    # fold-2 4x4 conv + i32 spatial pool in one kernel, mirroring the
    # winning YOLO stem_rs) measured 0.81 ms standalone / whole-net
    # 1.71 ms vs 0.98 ms all-XLA — the per-row (48,116) transposes
    # dominate a stem whose data is 14x smaller than YOLO's. A
    # transpose-free variant reading an XLA-prefolded u8 tensor was
    # WORSE (2.15 ms: sliced-then-reshaped A_cat writes gather per
    # row), and a pure-XLA folded stem (u8 s2d + 12-ch quantize + 4x4
    # VALID conv) hit 1.05 ms standalone. XLA's in-graph stem fusion
    # (clamp_convert overlapped with the convs) beats all isolated
    # formulations here; revisit only with a fundamentally different
    # layout (e.g. channel-major chain or Mosaic strided-gather
    # support).
}


# per-(model, batch) pinned sweeps: the b32-tuned model defaults above
# are NOT the measured winners at other batch sizes. Exact batch match
# wins; otherwise the model default. Every entry mirrors a committed
# docs/SWEEP_*.json artifact and is pinned to it by
# tests/test_plan_sweep.py.
_BATCH_STRATEGIES: Dict[Tuple[str, int], Dict] = {
    # docs/SWEEP_yolov2_w8a8_b1.json: 0.1401 ms single-image device
    # time — 4.9x better than running the b32 table at batch 1 (0.691
    # ms, BENCH_r03): conv3's k2 shifted fold LOSES at b1 (0.305 vs
    # 0.140 whole-net) and the k3 fold wins instead.
    ("yolov2-tiny", 1): {
        0: ("stem_rs", 4, {"cin_pad": 64}),
        2: ("fold_xla", 2),
        4: ("fold_xla", 2),
        6: ("xla", 1), 8: ("xla", 1), 10: ("xla", 1),
        12: ("xla", 1), 13: ("xla", 1), 14: ("xla", 1),
    },
    # docs/SWEEP_yolov2_w8a8_b8.json: 0.6225 ms/batch = 12.9k img/s —
    # the graft-entry batch. Differs from b32: conv3 takes the k3 fold
    # and conv5 (L8) folds k2 (both lose at b32).
    ("yolov2-tiny", 8): {
        0: ("stem_rs", 4, {"cin_pad": 64}),
        2: ("fold_xla", 2),
        4: ("fold_xla", 2),
        6: ("xla", 1),
        8: ("fold_xla_k2", 2),
        10: ("xla", 1),
        12: ("xla", 1), 13: ("xla", 1), 14: ("xla", 1),
    },
}


# w8 (weight-only, bf16 MXU) pinned sweeps, keyed (model, batch).
# BASELINE config 2 (yolov2 w8 batch-1) had NEVER been swept before
# round 5 — every w8 plan inherited the w8a8-shaped tables (round-4
# verdict missing #2). The w8 walker runs the stem kinds as bf16 k2
# folds, so w8a8 tables are legal for it, just not measured-optimal.
# Entries mirror committed docs/SWEEP_*_w8_*.json artifacts and are
# pinned by tests/test_plan_sweep.py.
_W8_BATCH_STRATEGIES: Dict[Tuple[str, int], Dict] = {
    # docs/SWEEP_yolov2_w8_b1.json: 0.1886 ms single-image forward =
    # 5.3k img/s (2 passes, full candidate set) vs 0.224 ms running
    # the inherited w8a8-b1 table and 0.460 all-xla. The bf16 tier
    # ordering differs from int8: the stem takes the XLA k2 fold (the
    # bf16 stem-kind variants lose) and conv3 UNFOLDS back to plain
    # xla (its int8 win came from absorbing the pool relayout the bf16
    # path doesn't suffer). L6's "gemm" is as the artifact recorded it,
    # but the w8 walker runs the SAME conv_bf16 for xla/gemm/auto —
    # the 0.189-vs-0.203 gap there is within measurement noise, not a
    # tier difference.
    ("yolov2-tiny", 1): {
        0: ("fold_xla_k2", 4, {"cin_pad": 64}),
        2: ("fold_xla", 2),
        4: ("xla", 1),
        6: ("gemm", 1),
        8: ("xla", 1), 10: ("xla", 1),
        12: ("xla", 1), 13: ("xla", 1), 14: ("xla", 1),
    },
    # docs/SWEEP_yolov3_w8_b16.json: 2.0074 ms/batch = 8.0k img/s
    # (quick set, 2 passes) vs 2.05 inheriting the w8a8 table — the
    # inherited choice was near-optimal here; the measured difference
    # is the stem (plain k3 fold beats the k2 shifted stem kinds in
    # bf16, where the 4f^2/9 MAC saving matters less than the shift
    # bookkeeping).
    ("yolov3-tiny", 16): {
        0: ("fold_xla", 4, {"cin_pad": 64}),
        2: ("fold_xla", 2),
        4: ("xla", 1),
        6: ("xla", 1), 8: ("xla", 1), 10: ("xla", 1),
        12: ("xla", 1), 13: ("xla", 1), 14: ("xla", 1),
        15: ("xla", 1), 17: ("xla", 1), 20: ("xla", 1), 21: ("xla", 1),
    },
}


def default_strategy(model_name: str, batch: Optional[int] = None,
                     mode: str = "w8a8") -> Dict:
    """The pinned measured strategy for (model, mode, batch): the
    mode-specific per-batch sweep result when one exists, else the
    per-batch w8a8 sweep, else the model's default table."""
    if mode == "w8" and batch is not None:
        s = _W8_BATCH_STRATEGIES.get((model_name, batch))
        if s is not None:
            return s
    if batch is not None:
        s = _BATCH_STRATEGIES.get((model_name, batch))
        if s is not None:
            return s
    return _DEFAULT_STRATEGIES.get(model_name, {})


def _referenced_layers(model) -> Set[int]:
    """Layer indices whose outputs are consumed out of sequence."""
    refs: Set[int] = set()
    for layer in model.layers:
        if isinstance(layer, Route):
            refs.update(layer.layers)
        elif isinstance(layer, Shortcut):
            refs.add(layer.frm)
    if model.out_layers is not None:
        refs.update(model.out_layers)
    return refs


def build_plan(model, strategy: Optional[Dict] = None,
               batch: Optional[int] = None,
               mode: str = "w8a8") -> Optional[List[Stage]]:
    """Layer-list model -> list of stages; None if unsupported.
    ``batch``/``mode`` select a pinned strategy when no explicit
    strategy is given (default_strategy)."""
    if strategy is None:
        strategy = default_strategy(model.name, batch, mode)
    refs = _referenced_layers(model)
    stages: List[Stage] = []
    layers = model.layers
    li = 0
    while li < len(layers):
        layer = layers[li]
        if isinstance(layer, Conv):
            entry = strategy.get(li, ("xla", 1))
            kind, fold = entry[0], entry[1]
            opts = entry[2] if len(entry) > 2 else {}
            if kind not in _CONV_KINDS:
                raise ValueError(
                    f"unknown plan strategy kind {kind!r} for layer {li}; "
                    f"valid kinds: {sorted(_CONV_KINDS)}")
            if kind == "s0" and not (
                    li == 0 and model.in_ch == 3 and model.input_size == 416
                    and layer.ksize == 3 and layer.out_ch == 16
                    and layer.stride == 1):
                kind = "fold_xla"   # shape-specialized kernel; degrade
            pool_li = None
            nxt = li + 1
            if (fold > 1 and nxt < len(layers)
                    and isinstance(layers[nxt], MaxPool)
                    and layers[nxt].stride == 2 and layers[nxt].size == 2):
                pool_li = nxt
            if fold > 1 and (pool_li is None or li in refs):
                # fold needs the absorbable pool, and erases the conv's
                # pre-pool output (illegal if something routes from it)
                return None
            stages.append(Stage(
                kind=_CONV_KINDS[kind],
                conv_li=li, pool_li=pool_li, fold=fold,
                k=2 if kind in ("rs2", "fold_xla_k2", "stem_rs", "stem_dg") else 3,
                s2d_out=opts.get("s2d_out", False),
                cin_pad=opts.get("cin_pad", 0), act=layer.act,
                stride=layer.stride, padding=layer.padding,
                s_out_is_final=(layer.act == "linear")))
            li = (pool_li + 1) if pool_li is not None else li + 1
        elif isinstance(layer, MaxPool):
            stages.append(Stage(kind="pool", conv_li=li, pool_li=None))
            li += 1
        elif isinstance(layer, Route):
            stages.append(Stage(kind="route", conv_li=li, pool_li=None))
            li += 1
        elif isinstance(layer, Shortcut):
            stages.append(Stage(kind="shortcut", conv_li=li, pool_li=None,
                                act=layer.act))
            li += 1
        elif isinstance(layer, Upsample):
            stages.append(Stage(kind="upsample", conv_li=li, pool_li=None))
            li += 1
        elif isinstance(layer, GlobalAvgPool):
            stages.append(Stage(kind="gap", conv_li=li, pool_li=None))
            li += 1
        elif isinstance(layer, Dense):
            stages.append(Stage(kind="dense", conv_li=li, pool_li=None,
                                act=layer.act))
            li += 1
        else:
            return None
    # fold_xla_s2 emits the SHIFTED fold-2 layout; only a fold_xla_k2
    # f=2 conv stage can consume it (anything else would misread the
    # junk-padded shifted tensor)
    for i, st in enumerate(stages):
        if st.kind == "fold_xla_s2":
            if st.fold != 2 or st.pool_li in refs:
                return None
            nxt_conv = next((s for s in stages[i + 1:]
                             if s.kind in _CONV_KINDS.values()), None)
            if (nxt_conv is None or nxt_conv is not stages[i + 1]
                    or nxt_conv.kind != "fold_xla_k2"
                    or nxt_conv.fold != 2):
                return None
    # the shifted-k2 formulation cannot chain from a FOLDED producer
    # (its input must be the plain tensor it shifts, or a fold_xla_s2
    # emission): simulate the fold state _run_stage tracks and reject
    # chains that would trip its layout assertions at trace time
    # (round-4: the yolov3 sweep's crash recording surfaced exactly
    # this — a fold_xla:4 entry followed by a fold_xla_k2:2 candidate)
    cur = 1
    for st in stages:
        if cur == -2 and st.kind != "fold_xla_k2":
            return None              # only fold_xla_k2 reads s2 output
        if st.kind in ("stem_rs", "stem_dg"):
            cur = st.fold // 2
        elif st.kind == "s0":
            cur = 2
        elif st.kind == "fold_xla_s2":
            cur = -2
        elif st.kind == "fold_xla_k2":
            cur = st.fold // 2       # defolds its input if needed
        elif st.kind == "fold_xla":
            cur = st.fold // 2
        elif st.kind == "rs":
            cur = ((st.fold // 2) * (2 if st.s2d_out else 1)
                   if st.fold > 1 else 1)
        else:
            cur = 1                  # plain convs / graph stages defold
    if cur == -2:
        return None
    return stages


def prepare_plan_params(model, qparams: Sequence[Dict],
                        stages: Sequence[Stage]) -> List[Dict]:
    """Pre-fold weights for folded stages (host-side, once)."""
    out: List[Dict] = []
    for st in stages:
        p = qparams[st.conv_li] if st.conv_li < len(qparams) else {}
        if st.kind == "s0":
            from dnn_inference_engine_tpu.ops.attic.pallas_stage0 import (
                build_stage0_weights_v2)
            wv, _, _ = build_stage0_weights_v2(
                np.asarray(p["wq"]), np.ones(16, np.float32),
                np.zeros(16, np.float32), 1.0, 1.0)
            out.append({"wv": jnp.asarray(wv),
                        "s_w": jnp.asarray(p["s_w"]),
                        "b": jnp.asarray(p["b"])})
            continue
        if st.fold > 1:
            f = st.fold
            folder = (fold_conv3x3_k2_weights if st.k == 2
                      else fold_conv3x3_weights)
            # pool-major group order everywhere: the fused group-max is 3
            # wide vector maxes over contiguous channel slices instead of
            # a 5D reshape (XLA lowered that reshape to two relayout
            # copies costing ~590us/iter at batch 32 — xplane-measured)
            wf = folder(np.asarray(p["wq"]), f, pool_major=True)
            if st.cin_pad and wf.shape[2] < st.cin_pad:
                # zero Cin rows match the lane-padded input's zero
                # channels — exact (see Stage.cin_pad)
                wf = np.concatenate(
                    [wf, np.zeros(wf.shape[:2]
                                  + (st.cin_pad - wf.shape[2], wf.shape[3]),
                                  wf.dtype)], axis=2)
            out.append({"wq": jnp.asarray(wf),
                        "s_w": jnp.tile(jnp.asarray(p["s_w"]), f * f),
                        "b": jnp.tile(jnp.asarray(p["b"]), f * f)})
        else:
            out.append({k: jnp.asarray(v) for k, v in p.items()})
    return out


def plan_forward_w8a8(model, stages: Sequence[Stage],
                      plan_params: Sequence[Dict], act_scales, x,
                      pair: Optional[Tuple[int, int]] = None,
                      axis_name: str = "model",
                      record_states: Optional[list] = None):
    """Run the fused stage pipeline. x: (N,H,W,3) f32; returns the f32
    head (or tuple of heads for multi-output models).

    ``pair``: when executing inside a shard_map over a mesh with a
    channel-sharded conv pair (parallel/shard_map_forward.py), the
    (Cout-shard, Cin-shard) layer indices. The first pair conv needs no
    special handling (its plan params are already the local Cout slice);
    the second runs its local Cin contraction, psums the int32
    accumulator over ``axis_name``, then the f32 epilogue — so the
    sharded fused plan stays bit-exact vs single-chip.
    """
    layers = model.layers
    refs = _referenced_layers(model)
    cur_scale = None
    cur_fold = 1                  # s2d fold factor of the tensor in ``x``
    # saved[li] = (tensor, scale) for out-of-sequence consumers, always
    # de-folded; scale None <=> tensor is f32 (mirrors forward_w8a8's outs)
    saved: Dict[int, Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = {}
    for si, st in enumerate(stages):
        pp = plan_params[si]
        if record_states is not None:
            # pre-stage execution state, for per-stage timing of the
            # EXECUTED pipeline (Engine.stage_times / roofline report)
            record_states.append((x, cur_scale, cur_fold, dict(saved)))
        # label every op of this stage in traces/HLO (profiling.py)
        with jax.named_scope(
                f"stage{si}_{st.kind}_L{st.conv_li}"
                + (f"_fold{st.fold}" if st.fold > 1 else "")):
            x, cur_scale, cur_fold = _run_stage(
                layers, st, pp, x, cur_scale, cur_fold, act_scales, saved,
                pair=pair, axis_name=axis_name)
        out_li = st.pool_li if st.pool_li is not None else st.conv_li
        if out_li in refs:
            t = depth_to_space(x, cur_fold) if cur_fold > 1 else x
            saved[out_li] = (t, cur_scale)
    if model.out_layers is not None:
        return tuple(_to_f32(*saved[j]) for j in model.out_layers)
    if cur_fold > 1:
        x = depth_to_space(x, cur_fold)
    return _to_f32(x, cur_scale)


def stage_flops(model, stages: Sequence[Stage],
                input_size: Optional[int] = None):
    """Per-stage (useful_macs, executed_macs) per image.

    ``useful``: the original layer's MAC count — the work a perfect
    implementation must do. ``executed``: MACs the MXU actually performs
    under the stage's formulation (space-to-depth folds trade extra MACs
    for dense tiling: k=3 fold-f executes f^2x the useful MACs, the
    shifted k=2 formulation 4f^2/9x, the v2 stem kernel 3 GEMMs of
    K=128 per 27-MAC output). Non-conv stages are bandwidth-bound: 0.
    """
    from dnn_inference_engine_tpu.parallel.sharding import _conv_flops
    per_layer = _conv_flops(model, input_size)  # useful MACs per conv layer
    out = []
    for st in stages:
        if st.kind in ("pool", "route", "shortcut", "upsample", "gap"):
            out.append((0.0, 0.0))
            continue
        if st.kind == "dense":
            lay = model.layers[st.conv_li]
            chans = model.out_channels()
            cin = chans[st.conv_li - 1] if st.conv_li else model.in_ch
            out.append((float(cin * lay.out),) * 2)
            continue
        useful = float(per_layer[st.conv_li])
        if st.kind == "s0":
            factor = 3 * 128 / 27.0     # 3 K=128 GEMMs per 27-MAC output
        elif st.fold > 1 and st.k == 2:
            factor = 4.0 * st.fold ** 2 / 9.0
        elif st.fold > 1:
            factor = float(st.fold ** 2)
        else:
            factor = 1.0
        out.append((useful, useful * factor))
    return out


def plan_input_uint8_ok(stages: Sequence[Stage]) -> bool:
    """True when the plan's entry stage consumes the uint8 serving wire
    format directly (the fused quant+s2d input kernel normalizes
    in-kernel) — the engine then skips the separate /255 normalize and
    the f32 materialization of the input batch."""
    st = stages[0]
    return (st.kind in ("fold_xla", "fold_xla_k2", "stem_rs", "stem_dg")
            and st.fold == 4)


def plan_forward_w8(model, stages: Sequence[Stage],
                    plan_params: Sequence[Dict], x):
    """Weight-only (w8) fused plan: bf16 activations x int8 codes on the
    MXU (codes are exact in bf16), f32 epilogues, and the same
    space-to-depth fold stages as the w8a8 plan — the early layers'
    tiny-channel shapes are what make the generic w8 forward slow, and
    folding fixes exactly that. No activation quantization anywhere, so
    the scale tracking collapses away; inter-stage tensors are bf16
    (the rounding a bf16-input conv applies anyway).

    Supports the XLA-tier stage kinds (fold_xla / fold_xla_k2 / xla /
    gemm / auto all run the bf16 conv) plus every graph kind; the int8
    Pallas kinds (rs / s0) have no w8 counterpart — build plans for w8
    with strategies that avoid them (the defaults do).
    """
    layers = model.layers
    refs = _referenced_layers(model)
    cur_fold = 1
    saved: Dict[int, jnp.ndarray] = {}
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x.astype(jnp.bfloat16)

    def conv_bf16(xb, pp, act, stride=1, padding="SAME", valid_k2=False):
        y = jax.lax.conv_general_dilated(
            xb, pp["wq"].astype(jnp.bfloat16), (stride, stride),
            "VALID" if valid_k2 else padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y * pp["s_w"] + pp["b"]
        return apply_activation(y, act)

    def gmax_bf16(y, f, cout):
        go = (f // 2) ** 2 * cout
        y = y.astype(jnp.bfloat16)
        return jnp.maximum(
            jnp.maximum(y[..., :go], y[..., go:2 * go]),
            jnp.maximum(y[..., 2 * go:3 * go], y[..., 3 * go:]))

    for si, st in enumerate(stages):
        pp = plan_params[si]
        li = st.conv_li
        with jax.named_scope(f"w8stage{si}_{st.kind}_L{li}"):
            if st.kind == "pool":
                x, cur_fold = _defold(x, cur_fold)
                lay = layers[li]
                x = maxpool(x, lay.size, lay.stride, lay.padding)
            elif st.kind == "route":
                pieces = [saved[j] for j in layers[li].layers]
                x = jnp.concatenate(pieces, axis=-1)
            elif st.kind == "shortcut":
                x, cur_fold = _defold(x, cur_fold)
                x = (x.astype(jnp.float32)
                     + saved[layers[li].frm].astype(jnp.float32))
                x = apply_activation(x, st.act).astype(jnp.bfloat16)
            elif st.kind == "upsample":
                x, cur_fold = _defold(x, cur_fold)
                s = layers[li].stride
                x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
            elif st.kind == "gap":
                x, cur_fold = _defold(x, cur_fold)
                x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            elif st.kind == "dense":
                w = pp["wq"].astype(jnp.float32) * pp["s_w"]
                x = apply_activation(
                    x.astype(jnp.float32) @ w + pp["b"], st.act)
            elif st.kind in ("fold_xla_k2", "stem_rs", "stem_dg"):
                # stem_rs is the int8 fused-stem Pallas kind; its stage
                # params are identical to fold_xla_k2's, and this bf16
                # XLA chain is its w8 counterpart.
                f = st.fold
                assert cur_fold == 1, cur_fold
                x = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1),
                                (0, 0)))
                x = space_to_depth(x, f)
                if st.cin_pad and x.shape[-1] < st.cin_pad:
                    x = jnp.pad(x, ((0, 0),) * 3
                                + ((0, st.cin_pad - x.shape[-1]),))
                ho, wo = x.shape[1] - 2, x.shape[2] - 2
                y = conv_bf16(x, pp, st.act, valid_k2=True)[:, :ho, :wo]
                cout = pp["s_w"].shape[0] // (f * f)
                x = gmax_bf16(y, f, cout)
                cur_fold = f // 2
            elif st.kind in ("fold_xla", "fold_xla_s2"):
                # w8 has no int8 gs2 kernel; the gmax-then-relayout XLA
                # chain is semantically identical, so s2 degrades to the
                # fold_xla behavior (the next k2 stage re-shifts itself)
                f = st.fold
                if cur_fold != f:
                    if cur_fold > 1:
                        x = depth_to_space(x, cur_fold)
                    x = space_to_depth(x, f)
                    cur_fold = f
                if st.cin_pad and x.shape[-1] < st.cin_pad:
                    x = jnp.pad(x, ((0, 0),) * 3
                                + ((0, st.cin_pad - x.shape[-1]),))
                y = conv_bf16(x, pp, st.act)
                cout = pp["s_w"].shape[0] // (f * f)
                x = gmax_bf16(y, f, cout)
                cur_fold = f // 2
            elif st.kind in ("xla", "gemm", "auto"):
                x, cur_fold = _defold(x, cur_fold)
                y = conv_bf16(x, pp, st.act, stride=st.stride,
                              padding=st.padding)
                x = y if st.s_out_is_final else y.astype(jnp.bfloat16)
            else:
                raise ValueError(
                    f"stage kind {st.kind!r} has no w8 implementation; "
                    "use a strategy without rs/s0 kinds for w8 plans")
        out_li = st.pool_li if st.pool_li is not None else st.conv_li
        if out_li in refs:
            t = depth_to_space(x, cur_fold) if cur_fold > 1 else x
            saved[out_li] = t
    if model.out_layers is not None:
        return tuple(saved[j].astype(jnp.float32)
                     for j in model.out_layers)
    if cur_fold > 1:
        x = depth_to_space(x, cur_fold)
    return x.astype(jnp.float32)


def _to_f32(t, s):
    return t if s is None else dequantize(t, s)


def _defold(x, cur_fold):
    assert cur_fold >= 1, (
        "shifted fold-2 state (negative sentinel) must feed a "
        "fold_xla_k2 f=2 stage")
    return (depth_to_space(x, cur_fold), 1) if cur_fold > 1 else (x, 1)


def _run_stage(layers, st, pp, x, cur_scale, cur_fold, act_scales, saved,
               pair=None, axis_name="model"):
    """One plan stage; returns (x, cur_scale, cur_fold)."""
    li = st.conv_li
    s_next = jnp.float32(act_scales[li + 1])
    if st.kind == "pool":
        x, cur_fold = _defold(x, cur_fold)
        lay = layers[li]
        x = maxpool(x, lay.size, lay.stride, lay.padding)  # scale-preserving
        return x, cur_scale, cur_fold
    if st.kind == "route":
        pieces = [_to_f32(*saved[j]) for j in layers[li].layers]
        x = jnp.concatenate(pieces, axis=-1)
        return quantize_act(x, s_next), s_next, 1
    if st.kind == "shortcut":
        x, cur_fold = _defold(x, cur_fold)
        x = _to_f32(x, cur_scale) + _to_f32(*saved[layers[li].frm])
        x = apply_activation(x, st.act)
        return quantize_act(x, s_next), s_next, 1
    if st.kind == "upsample":
        x, cur_fold = _defold(x, cur_fold)
        s = layers[li].stride
        x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)  # scale-preserving
        return x, cur_scale, cur_fold
    if st.kind == "gap":
        x, cur_fold = _defold(x, cur_fold)
        x = jnp.mean(_to_f32(x, cur_scale), axis=(1, 2))
        return x, None, cur_fold
    if st.kind == "dense":
        w = pp["wq"].astype(jnp.float32) * pp["s_w"]
        x = apply_activation(_to_f32(x, cur_scale) @ w + pp["b"], st.act)
        return x, None, cur_fold

    # ---- conv stages ----
    if st.kind == "s0":
        # fused stem kernel: quantize + conv1 + pool + fold-2 emit in one
        # HBM pass (ops/attic/pallas_stage0.py, NON-PRODUCTION; kept for A/B)
        from dnn_inference_engine_tpu.ops.attic.pallas_stage0 import stage0_fused_v2
        assert cur_scale is None and cur_fold == 1
        s_in = jnp.float32(act_scales[li])
        scale = jnp.tile(pp["s_w"], 4) * (s_in / s_next)
        bias = jnp.tile(pp["b"], 4) / s_next
        x = stage0_fused_v2(x, pp["wv"], scale, bias, s_in, act=st.act)
        return x, s_next, 2
    if st.kind in ("stem_rs", "stem_dg"):
        # whole stage-0 in ONE Pallas kernel: quantize (uint8 wire or
        # f32) + shifted s2d(4) + 2x2 folded conv + epilogue/requant +
        # pool-major group-max (ops/pallas_conv.py::stem_fused_k2). Same
        # contract as fold_xla_k2 below but the folded input and the
        # pre-gmax tensor never round-trip HBM. stem_dg is the same
        # contract via the transpose-free dot_general formulation.
        from dnn_inference_engine_tpu.ops.pallas_conv import (
            stem_fused_dg, stem_fused_k2)
        stem_fn = stem_fused_dg if st.kind == "stem_dg" else stem_fused_k2
        assert cur_fold == 1 and cur_scale is None and st.fold == 4, st
        assert not st.s_out_is_final, st
        s_out = s_next
        if x.dtype == jnp.uint8:
            # EXACT uint8 ingestion: layer-0 input scale is 1/255, so
            # the code for pixel u is exactly u (zero input quantization
            # error — strictly more accurate than the calibrated scale,
            # whose resolution is coarser for [0,1] inputs). The kernel
            # feeds v = u - 128 to the MXU; the offset contributes
            # 128 * (per-channel weight row-sums), folded into the bias.
            # Row-sums are identical across the 4 pool groups (every
            # original 3x3 tap appears exactly once per group), so the
            # i32 group-max-first epilogue stays exact.
            s_in = jnp.float32(1.0 / 255.0)
            w1 = pp["wq"].reshape(-1, pp["s_w"].shape[0]).astype(
                jnp.float32).sum(axis=0)
            scale = (s_in * pp["s_w"]) / s_out
            bias = (pp["b"] + 128.0 * s_in * pp["s_w"] * w1) / s_out
            x = stem_fn(x, pp["wq"], scale, bias, s_in,
                        act=st.act, exact_u8=True)
        else:
            s_in = jnp.float32(act_scales[li])
            scale = (s_in * pp["s_w"]) / s_out
            bias = pp["b"] / s_out
            x = stem_fn(x, pp["wq"], scale, bias, s_in, act=st.act)
        return x, s_out, st.fold // 2
    if st.kind == "fold_xla_k2":
        # shifted-fold k2 formulation via XLA conv: a 2x2 VALID conv over
        # the shifted s2d(f) covers the same 3x3 receptive field with
        # 4f^2/9 of the k3 fold's MACs (fold_conv3x3_k2_weights: 34 vs
        # 76.5 GOP executed on conv1-f4 @ batch 32). The input is padded
        # 1 top/left (the SAME halo) and 2f-1 bottom/right (completes
        # blocks and keeps dims % 8 for the fused quant+s2d kernel); the
        # conv's trailing junk row/col of blocks is sliced off. Never
        # chains from a folded producer (shifted layout).
        f = st.fold
        assert not st.s_out_is_final, st
        if cur_fold > 1:
            # chaining from a folded producer: de-fold first (same as
            # the rs2 path; the shifted layout below needs the plain
            # tensor). Surfaced by the round-4 yolov3 sweep's crash
            # recording — this combination used to trip an assertion.
            x = depth_to_space(x, cur_fold)
            cur_fold = 1
        s_out = s_next
        ho_wo = None      # (ho, wo) override when trim can't express it
        trim = 2          # junk rows/cols of the 2f-1 pad, sliced post-conv
        if cur_fold < 0:
            # a fold_xla_s2 producer already emitted the shifted fold-2
            # layout (gmax_shift_s2d2: W/2+1 columns, junk zero rows to
            # a multiple of 8) — consume it directly, no relayout at
            # all. The sentinel's magnitude carries the producer's TRUE
            # output row count (H/2), which is NOT recoverable from the
            # 8-rounded padded height (round-4 advisor #3: deriving it
            # from the width silently broke non-square inputs).
            assert f == 2, st
            ho = -cur_fold
            assert x.shape[1] == -(-(ho + 1) // 8) * 8, (
                "shifted fold-2 payload height inconsistent with the "
                f"producer's row count: padded {x.shape}, ho={ho}")
            ho_wo = (ho, x.shape[2] - 1)
            cur_fold = 1
        elif cur_scale is None:
            cur_scale = jnp.float32(act_scales[li])
            fused_ok = (f == 4 and x.shape[-1] == 3
                        and (x.shape[1] + 2 * f) % 8 == 0
                        and (x.shape[2] + 2 * f) % 8 == 0)
            if x.dtype == jnp.uint8 and not fused_ok:
                x = x.astype(jnp.float32) / 255.0
            if fused_ok:
                from dnn_inference_engine_tpu.ops.pallas_conv import (
                    quant_space_to_depth4)
                # works on the uint8 wire format directly (normalize
                # in-kernel) — zero-pad is exact in both dtypes
                x = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1),
                                (0, 0)))
                x = quant_space_to_depth4(x, cur_scale, pad_to=st.cin_pad)
            else:
                x = quantize_act(x, cur_scale)
                x = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1),
                                (0, 0)))
                x = space_to_depth(x, f)
        else:
            if USE_SHIFT_S2D2_KERNEL and f == 2 and x.dtype == jnp.int8 \
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                # one-pass Pallas shift-s2d(2): round-3 gap attribution
                # (docs/GAP_ATTRIB.json) measured the XLA pad+s2d chain
                # at ~0.27 ms in context here — the plan's largest
                # boundary overhead. Measured win on v5e batch 32
                # (tools/ab_shift_s2d.py, interleaved): whole-net
                # 2.163/2.174 ms vs 2.189/2.194 — most of the ~0.27 ms
                # attribution was NOT the s2d chain itself (XLA fuses
                # it into the conv's input); the kernel keeps a steady
                # ~1% and stays on. The kernel emits W/2+1 columns and
                # H/2+1 valid rows plus zero junk rows up to a multiple
                # of 8 (53 is prime); the VALID conv's junk output rows
                # are sliced off by the explicit (ho, wo) below.
                from dnn_inference_engine_tpu.ops.pallas_conv import (
                    shift_s2d2_pallas)
                ho_wo = (x.shape[1] // 2, x.shape[2] // 2)
                x = shift_s2d2_pallas(x)
            else:
                x = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1),
                                (0, 0)))
                x = space_to_depth(x, f)
        if st.cin_pad and x.shape[-1] < st.cin_pad:
            x = jnp.pad(x, ((0, 0),) * 3 + ((0, st.cin_pad - x.shape[-1]),))
        ho, wo = ho_wo or (x.shape[1] - trim, x.shape[2] - trim)
        y = jax.lax.conv_general_dilated(
            x, pp["wq"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)[:, :ho, :wo]
        y = y.astype(jnp.float32) * (cur_scale * pp["s_w"]) + pp["b"]
        y = jnp.where(y > 0, y, 0.1 * y) if st.act == "leaky" else y
        y = quantize_act(y, s_out)
        cout = pp["s_w"].shape[0] // (f * f)
        go = (f // 2) ** 2 * cout
        x = jnp.maximum(
            jnp.maximum(y[..., :go], y[..., go:2 * go]),
            jnp.maximum(y[..., 2 * go:3 * go], y[..., 3 * go:]))
        return x, s_out, f // 2

    if cur_scale is None:
        cur_scale = jnp.float32(act_scales[li])
        fused_ok = (st.fold == 4 and st.k == 3 and cur_fold == 1
                    and x.shape[-1] == 3 and x.shape[1] % 8 == 0
                    and x.shape[2] % 8 == 0)
        if x.dtype == jnp.uint8 and not fused_ok:
            x = x.astype(jnp.float32) / 255.0
        if fused_ok:
            # fused quantize+s2d(4) kernel: skips the XLA s8 relayout
            # copies (~0.7 ms/iter at batch 32; see pallas_conv.py);
            # emits cin_pad lanes directly when the stage wants them,
            # and consumes the uint8 wire format directly
            from dnn_inference_engine_tpu.ops.pallas_conv import (
                quant_space_to_depth4)
            x = quant_space_to_depth4(x, cur_scale, pad_to=st.cin_pad)
            cur_fold = 4
        else:
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
    if st.fold > 1 and st.cin_pad and x.shape[-1] < st.cin_pad:
        # lane-pad the folded input (zero channels, zero weight rows)
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, st.cin_pad - x.shape[-1]),))
    # requant target: the calibrated scale of this conv's output
    s_out = None if st.s_out_is_final else s_next

    if st.kind in ("xla", "gemm", "auto"):
        if pair is not None and li == pair[1]:
            # row-parallel under shard_map: int32 psum before the epilogue
            assert st.fold == 1 and cur_fold == 1, (st, cur_fold)
            from dnn_inference_engine_tpu.parallel.shard_map_forward import (
                row_parallel_conv_w8a8)
            x = row_parallel_conv_w8a8(
                x, pp, st, cur_scale, s_out, axis_name,
                use_pallas_tier=st.kind in ("gemm", "auto"),
                force_pallas=st.kind == "gemm")
        else:
            fn = {"xla": conv2d_w8a8, "gemm": conv2d_w8a8_pallas,
                  "auto": conv2d_w8a8_dispatch}[st.kind]
            x = fn(x, cur_scale, pp["wq"], pp["s_w"], pp["b"],
                   act=st.act, stride=st.stride, padding=st.padding,
                   s_out=s_out)
    elif st.kind in ("fold_xla", "fold_xla_s2", "rs"):
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
            if st.kind == "fold_xla_s2":
                # fused group-max + shifted-s2d(2) pack in one Pallas
                # pass: the downstream fold_xla_k2 f=2 stage reads this
                # directly. Replaces the XLA gmax fusion + boundary
                # relayout + shift_s2d2 chain (~556 us in-context at
                # batch 32, docs/TRACE_ATTRIB_r04.json) with one
                # bandwidth-grade kernel.
                from dnn_inference_engine_tpu.ops.pallas_conv import (
                    gmax_shift_s2d2)
                assert f == 2, st
                # negative sentinel: shifted fold-2 state; magnitude =
                # the true output row count H/2 (the consumer cannot
                # recover it from the 8-rounded padded height)
                return gmax_shift_s2d2(y, go=cout), s_out, -(y.shape[1] // 2)
            # pool-major group-max on the requantized s8 tensor: 3 vector
            # maxes over contiguous channel slices; the surviving
            # (a*(f/2)+b, co) group order IS the fold-(f/2) layout.
            # (A/B on v5e conv1-f4 @32: 1.34 ms vs 1.77 for the 5D-reshape
            # fold_group_pool_channels whose relayout copies dominated;
            # max on the pre-requant int32 acc was 2.54 ms — XLA then
            # materializes the 4x bigger i32 accumulator.)
            go = (f // 2) ** 2 * cout
            x = jnp.maximum(
                jnp.maximum(y[..., :go], y[..., go:2 * go]),
                jnp.maximum(y[..., 2 * go:3 * go], y[..., 3 * go:]))
        cur_fold = f // 2     # gmax output is in fold-(f/2) layout
        if st.kind == "rs" and st.s2d_out:
            cur_fold *= 2     # the kernel emitted the next fold level
    else:
        raise ValueError(st.kind)
    cur_scale = None if s_out is None else s_out
    return x, cur_scale, cur_fold
