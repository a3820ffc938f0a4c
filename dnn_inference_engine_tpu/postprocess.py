"""Head decode + NMS (reference P2/P3; SURVEY.md section 2.4).

The decode stays on-device in-graph ([B]: "NMS-ready head decode"), and the
engine provides THREE implementations:
- ``host_nms``: numpy greedy per-class NMS — the reference-style baseline
  and the correctness oracle;
- ``device_nms``: static-shape on-device NMS (SURVEY.md hard part 1),
  round-5 fixpoint formulation: one class-agnostic candidate top-K, one
  shared IoU matrix, per-class greedy suppression as a Jacobi fixpoint
  on the suppression DAG (``_greedy_fixpoint``) — exactly greedy, no
  dynamic shapes, converges in chain-depth sweeps;
- ``device_nms_seq``: the round-4 sequential formulation (per-class
  top-K + K-step ``lax.fori_loop``), kept as the A/B baseline and a
  second oracle.

Named scopes (``post_decode``, ``nms_candidates``, ``nms_suppress``,
``nms_merge``) let ``runtime/profiling.trace_attribution`` decompose
detect-path device time per phase.

Box convention: (cx, cy, w, h) in network-input pixels ([0, 416]) out of
decode; (x1, y1, x2, y2) inside NMS/eval.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.config import (
    GRID_SIZE, INPUT_SIZE, MAX_DETECTIONS, NMS_IOU_THRESH, NUM_ANCHORS,
    NUM_CLASSES, SCORE_THRESH_VIS, YOLOV2_TINY_ANCHORS,
)

# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def decode_yolov2(head: jnp.ndarray,
                  anchors=YOLOV2_TINY_ANCHORS,
                  num_classes: int = NUM_CLASSES,
                  input_size: int = INPUT_SIZE):
    """Decode a (N, S, S, A*(5+C)) head to boxes + class scores.

    darknet semantics: for each cell (row, col) and anchor a with raw
    (tx, ty, tw, th, to, logits):
        bx = (col + sigmoid(tx)) * cell_px     (cell_px = input_size / S)
        by = (row + sigmoid(ty)) * cell_px
        bw = anchor_w * exp(tw) * cell_px      (anchors in cell units)
        bh = anchor_h * exp(th) * cell_px
        score_c = sigmoid(to) * softmax(logits)_c

    Returns (boxes (N, S*S*A, 4) cxcywh in pixels, scores (N, S*S*A, C)).
    """
    n, s, _, _ = head.shape
    a = len(anchors)
    e = 5 + num_classes
    cell_px = input_size / s
    # (N, M=S*S*A, E) with m = (row*S + col)*A + anchor — a FREE
    # row-major reshape. Decoding in the 5-D (N,S,S,A,E) shape puts the
    # tiny A/C dims in the tiled minor positions (A=5 -> 8 sublanes,
    # C=20 -> 128 lanes) and XLA's emitter loops (13,13,N) with ~3%
    # vector fill: the round-5 b32 detect trace measured that decode
    # fusion at 1.34 ms of the 4.4 ms module. Here the big M dim fills
    # the sublanes and E=25 the lanes.
    x = head.reshape(n, s * s * a, e)
    m = s * s * a
    mi = jax.lax.iota(jnp.float32, m)
    col = jnp.floor(mi / a) % s                        # cell col per m
    row = jnp.floor(mi / (a * s))                      # cell row per m
    anc = jnp.asarray(anchors, jnp.float32)            # (A, 2) cell units
    anc_w = jnp.tile(anc[:, 0], s * s)                 # (M,)
    anc_h = jnp.tile(anc[:, 1], s * s)

    with jax.named_scope("post_decode"):
        bx = (col + jax.nn.sigmoid(x[..., 0])) * cell_px
        by = (row + jax.nn.sigmoid(x[..., 1])) * cell_px
        bw = anc_w * jnp.exp(x[..., 2]) * cell_px
        bh = anc_h * jnp.exp(x[..., 3]) * cell_px
        obj = jax.nn.sigmoid(x[..., 4])
        cls = jax.nn.softmax(x[..., 5:], axis=-1)
        scores = obj[..., None] * cls

        boxes = jnp.stack([bx, by, bw, bh], axis=-1)
        return boxes, scores


def decode_yolov3(head: jnp.ndarray, anchors_px,
                  num_classes: int = NUM_CLASSES,
                  input_size: int = INPUT_SIZE):
    """YOLOv3 head decode: anchors in pixels, sigmoid class scores."""
    n, s, _, _ = head.shape
    a = len(anchors_px)
    e = 5 + num_classes
    cell_px = input_size / s
    # same (N, M, E) flat-decode as decode_yolov2 (see its layout note)
    x = head.reshape(n, s * s * a, e)
    m = s * s * a
    mi = jax.lax.iota(jnp.float32, m)
    col = jnp.floor(mi / a) % s
    row = jnp.floor(mi / (a * s))
    anc = jnp.asarray(anchors_px, jnp.float32)
    anc_w = jnp.tile(anc[:, 0], s * s)
    anc_h = jnp.tile(anc[:, 1], s * s)

    with jax.named_scope("post_decode"):
        bx = (col + jax.nn.sigmoid(x[..., 0])) * cell_px
        by = (row + jax.nn.sigmoid(x[..., 1])) * cell_px
        bw = anc_w * jnp.exp(x[..., 2])
        bh = anc_h * jnp.exp(x[..., 3])
        obj = jax.nn.sigmoid(x[..., 4])
        cls = jax.nn.sigmoid(x[..., 5:])                # multi-label
        scores = obj[..., None] * cls

        boxes = jnp.stack([bx, by, bw, bh], axis=-1)
        return boxes, scores


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    if isinstance(boxes, np.ndarray):
        stack = np.stack
    else:
        stack = jnp.stack
    return stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


# ---------------------------------------------------------------------------
# Columnar decode (engine-internal layout; SURVEY.md section 2.4 P2)
# ---------------------------------------------------------------------------
#
# The row-major public layout (boxes (N, M, 4), scores (N, M, C)) puts
# 4- and 20-wide dims in the TPU lane position, so every tensor pads to
# 128 lanes (boxes 32x, scores 6.4x) and the decode/NMS fusions run at
# a few % vector fill. The columnar layout (boxes (N, 4, M), scores
# (N, C, M)) keeps the big M dim in the lanes; candidate order is
# ANCHOR-MAJOR (m = anchor*S*S + cell), which only permutes tie-breaks
# vs the public row-major order. The engine's jitted detect path uses
# these; the public decode_* / device_nms keep the reference-shaped API.

def _decode_cols(head, anchors, num_classes: int, input_size: int,
                 anchors_in_cells: bool, softmax_cls: bool):
    n, s, _, _ = head.shape
    a = len(anchors)
    e = 5 + num_classes
    s2 = s * s
    cell_px = input_size / s
    # (N,S,S,A*E) -> (N,S2,A*E) -> transpose -> (N,A*E,S2) -> (N,A,E,S2)
    # (one compact-layout transpose; both reshapes are free)
    x = head.reshape(n, s2, a * e)
    x = jnp.transpose(x, (0, 2, 1)).reshape(n, a, e, s2)
    mi = jax.lax.iota(jnp.float32, s2)
    col = mi % s
    row = jnp.floor(mi / s)
    anc = jnp.asarray(anchors, jnp.float32)
    with jax.named_scope("post_decode"):
        bx = (col + jax.nn.sigmoid(x[:, :, 0, :])) * cell_px   # (N,A,S2)
        by = (row + jax.nn.sigmoid(x[:, :, 1, :])) * cell_px
        scale_wh = cell_px if anchors_in_cells else 1.0
        bw = anc[:, 0][None, :, None] * jnp.exp(x[:, :, 2, :]) * scale_wh
        bh = anc[:, 1][None, :, None] * jnp.exp(x[:, :, 3, :]) * scale_wh
        obj = jax.nn.sigmoid(x[:, :, 4, :])
        logits = x[:, :, 5:, :]                                 # (N,A,C,S2)
        cls = (jax.nn.softmax(logits, axis=2) if softmax_cls
               else jax.nn.sigmoid(logits))
        scores = obj[:, :, None, :] * cls                       # (N,A,C,S2)
        boxes = jnp.stack([bx, by, bw, bh], axis=1)             # (N,4,A,S2)
        scores = jnp.transpose(scores, (0, 2, 1, 3))            # (N,C,A,S2)
        return (boxes.reshape(n, 4, a * s2),
                scores.reshape(n, num_classes, a * s2))


def decode_yolov2_cols(head, anchors=YOLOV2_TINY_ANCHORS,
                       num_classes: int = NUM_CLASSES,
                       input_size: int = INPUT_SIZE):
    """Columnar decode: (N,4,M) cxcywh + (N,C,M), anchor-major order."""
    return _decode_cols(head, anchors, num_classes, input_size,
                        anchors_in_cells=True, softmax_cls=True)


def decode_yolov3_cols(head, anchors_px,
                       num_classes: int = NUM_CLASSES,
                       input_size: int = INPUT_SIZE):
    return _decode_cols(head, anchors_px, num_classes, input_size,
                        anchors_in_cells=False, softmax_cls=False)


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def _pairwise_iou_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) xyxy -> (K, K) IoU matrix."""
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


# ---------------------------------------------------------------------------
# Device NMS (static shapes; SURVEY.md hard part 1)
# ---------------------------------------------------------------------------

def _greedy_suppress(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                     iou_thresh: float, score_thresh: float) -> jnp.ndarray:
    """Sorted-candidate greedy NMS. boxes (K,4) sorted by score desc,
    scores (K,). Returns keep mask (K,) bool."""
    k = boxes_xyxy.shape[0]
    iou = _pairwise_iou_xyxy(boxes_xyxy)
    valid = scores > score_thresh

    def body(i, state):
        suppressed, keep = state
        live = jnp.logical_and(jnp.logical_not(suppressed[i]), valid[i])
        keep = keep.at[i].set(live)
        row = jnp.logical_and(iou[i] > iou_thresh,
                              jax.lax.broadcasted_iota(jnp.int32, (k,), 0) > i)
        suppressed = jnp.where(jnp.logical_and(live, row), True, suppressed)
        return suppressed, keep

    _, keep = jax.lax.fori_loop(
        0, k, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool)))
    return keep


def _pack_bits(x: jnp.ndarray) -> jnp.ndarray:
    """(…, K) bool -> (…, ceil(K/32)) uint32 bitset over the last axis
    (bit b of word w = element w*32+b; K zero-padded to a multiple of
    32). The per-word sum is exact (bits are disjoint — it IS the or)."""
    k = x.shape[-1]
    kp = -(-k // 32) * 32
    if kp != k:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, kp - k)])
    xr = x.reshape(*x.shape[:-1], kp // 32, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return (xr * weights).sum(axis=-1, dtype=jnp.uint32)


def _greedy_fixpoint(s: jnp.ndarray, oidx: jnp.ndarray,
                     iou_hit: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy NMS keep masks as a Jacobi fixpoint over a
    bit-packed dominance matrix.

    s (C, K) per-class candidate scores; oidx (K,) original candidate
    indices (host-oracle tie-break order); iou_hit (K, K) bool
    (pairwise IoU above the threshold); valid (C, K): above the score
    threshold. The dominance relation

        dom[c, i, j] = j precedes i in class-c greedy order
                       (score desc, index tie-break) AND iou_hit[i, j]

    is a DAG (precedence is a strict order), so greedy's keep is the
    unique solution of

        keep[i] = valid[i] and not any_j(dom[i, j] and keep[j]).

    Jacobi iteration from keep0 = valid makes every candidate of
    suppression depth <= t correct after t+1 sweeps, so
    ``lax.while_loop`` with a convergence test terminates in (longest
    suppression chain + 2) iterations — typically 2-5 for real
    detections, vs the always-K sequential steps of
    ``_greedy_suppress`` (the round-4 trace put that ``fori_loop`` at
    166 us of the 462 us batch-1 detect). Worst case is still K
    sweeps (safety bound).

    dom is built ONCE and bit-packed over the suppressor axis j into
    uint32 words (32x smaller: 1.3 MB instead of 42 MB at batch 32 x
    C=20 x K=256), so each sweep is a word-wise AND + any over
    K/32 words. The round-5 b32 detect trace showed the per-sweep
    recompute/reread of the full (C, K, K) relation costing ~2.9 ms
    of the 4.8 ms module (docs/TRACE_DETECT_b32.json); the packed
    sweeps read 32x less.
    """
    k = valid.shape[-1]
    # dom oriented (C, i, j) so the pack runs over the last axis
    prec_t = jnp.logical_or(
        s[:, None, :] > s[:, :, None],
        jnp.logical_and(s[:, None, :] == s[:, :, None],
                        oidx[None, :] < oidx[:, None]))
    dom_p = _pack_bits(jnp.logical_and(prec_t, iou_hit[None]))  # (C,K,W)

    def step(keep):
        kp = _pack_bits(keep)                      # (C, W)
        hits = jnp.bitwise_and(dom_p, kp[:, None, :])
        sup = jnp.any(hits != 0, axis=-1)
        return jnp.logical_and(valid, jnp.logical_not(sup))

    def cond(st):
        prev, keep, it = st
        return jnp.logical_and(jnp.any(prev != keep), it < k)

    def body(st):
        _, keep, it = st
        return keep, step(keep), it + 1

    keep0 = valid
    _, keep, _ = jax.lax.while_loop(
        cond, body, (keep0, step(keep0), jnp.int32(1)))
    return keep


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh", "topk",
                                   "max_det"))
def device_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_thresh: float = NMS_IOU_THRESH,
               score_thresh: float = SCORE_THRESH_VIS,
               topk: int = MAX_DETECTIONS,
               max_det: int = MAX_DETECTIONS):
    """On-device per-class NMS with fully static shapes.

    boxes: (B, M, 4) cxcywh; scores: (B, M, C).
    Returns (boxes (B, D, 4) xyxy, scores (B, D), classes (B, D) int32),
    zero-padded, sorted by score desc. D = max_det.

    Formulation (round-5 batch-1 latency attack): ONE class-agnostic
    candidate top-K (by best-class score) replaces C per-class sorts;
    the K x K IoU matrix is computed once and shared by every class;
    per-class greedy order is encoded as a pairwise precedence matrix
    (score desc, candidate-index tie-break — matching the host
    oracle's stable sort) and suppression resolves via
    ``_greedy_fixpoint``. With topk >= M (no candidate truncation) the
    result is exactly the host oracle's; with truncation the candidate
    set is the global top-K rather than per-class top-Ks (gated by the
    production accuracy proxies in tests/test_accuracy_proxy*.py).
    """
    b_xyxy = cxcywh_to_xyxy(boxes)
    m = boxes.shape[1]
    topk = min(topk, m)               # fewer candidates than top-K

    def per_image(bx, sc):           # bx (M,4), sc (M,C)
        c = sc.shape[-1]
        with jax.named_scope("nms_candidates"):
            if topk < m:
                best = jnp.max(sc, axis=-1)
                _, oidx = jax.lax.top_k(best, topk)  # (K,) original indices
                bk, sk = bx[oidx], sc[oidx]          # (K,4), (K,C)
            else:
                oidx = jax.lax.iota(jnp.int32, m)
                bk, sk = bx, sc
        with jax.named_scope("nms_suppress"):
            iou = _pairwise_iou_xyxy(bk)             # (K,K), shared
            s = sk.T                                 # (C,K)
            valid = s > score_thresh
            keep = _greedy_fixpoint(s, oidx, iou > iou_thresh,
                                    valid)           # (C,K)
        with jax.named_scope("nms_merge"):
            sk_out = jnp.where(keep, s, 0.0)
            cls = jax.lax.broadcasted_iota(jnp.int32, (c, topk), 0)
            bk_all = jnp.broadcast_to(bk[None], (c, topk, 4)).reshape(-1, 4)
            sk_out, cls = sk_out.reshape(-1), cls.reshape(-1)
            d = min(max_det, sk_out.shape[0])
            s_top, i_top = jax.lax.top_k(sk_out, d)
            bk_all, cls = bk_all[i_top], cls[i_top]
            if d < max_det:           # keep the advertised static shape
                pad = max_det - d
                bk_all = jnp.pad(bk_all, ((0, pad), (0, 0)))
                s_top = jnp.pad(s_top, (0, pad))
                cls = jnp.pad(cls, (0, pad))
            return bk_all, s_top, cls

    return jax.vmap(per_image)(b_xyxy, scores)


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh", "topk",
                                   "max_det"))
def device_nms_cols(boxes: jnp.ndarray, scores: jnp.ndarray,
                    iou_thresh: float = NMS_IOU_THRESH,
                    score_thresh: float = SCORE_THRESH_VIS,
                    topk: int = MAX_DETECTIONS,
                    max_det: int = MAX_DETECTIONS):
    """Columnar-layout twin of ``device_nms``: boxes (B, 4, M) cxcywh,
    scores (B, C, M) — the big M dim stays in the TPU lane position
    throughout (no 128-lane padding of 4-/C-wide tensors), same
    fixpoint suppression, same (boxes (B, D, 4) xyxy, scores (B, D),
    classes (B, D)) outputs. Candidate order follows the input's M
    order (the engine feeds anchor-major), which only permutes
    tie-breaks vs the row-major path."""
    m = boxes.shape[-1]
    topk = min(topk, m)

    def per_image(bx, sc):           # bx (4,M), sc (C,M)
        c = sc.shape[0]
        with jax.named_scope("nms_candidates"):
            if topk < m:
                best = jnp.max(sc, axis=0)
                _, oidx = jax.lax.top_k(best, topk)
                bk = jnp.take(bx, oidx, axis=1)      # (4,K)
                sk = jnp.take(sc, oidx, axis=1)      # (C,K)
            else:
                oidx = jax.lax.iota(jnp.int32, m)
                bk, sk = bx, sc
        with jax.named_scope("nms_suppress"):
            x1 = bk[0] - bk[2] * 0.5
            y1 = bk[1] - bk[3] * 0.5
            x2 = bk[0] + bk[2] * 0.5
            y2 = bk[1] + bk[3] * 0.5
            area = (jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0))
            ix1 = jnp.maximum(x1[:, None], x1[None, :])
            iy1 = jnp.maximum(y1[:, None], y1[None, :])
            ix2 = jnp.minimum(x2[:, None], x2[None, :])
            iy2 = jnp.minimum(y2[:, None], y2[None, :])
            inter = (jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0))
            union = area[:, None] + area[None, :] - inter
            iou = inter / jnp.maximum(union, 1e-9)
            valid = sk > score_thresh
            keep = _greedy_fixpoint(sk, oidx, iou > iou_thresh, valid)
        with jax.named_scope("nms_merge"):
            sk_out = jnp.where(keep, sk, 0.0).reshape(-1)   # (C*K,)
            d = min(max_det, sk_out.shape[0])
            s_top, i_top = jax.lax.top_k(sk_out, d)
            cls = i_top // topk
            k_idx = i_top % topk
            bxyxy = jnp.stack([x1, y1, x2, y2], axis=0)     # (4,K)
            bk_out = jnp.take(bxyxy, k_idx, axis=1).T       # (D,4)
            if d < max_det:           # keep the advertised static shape
                pad = max_det - d
                bk_out = jnp.pad(bk_out, ((0, pad), (0, 0)))
                s_top = jnp.pad(s_top, (0, pad))
                cls = jnp.pad(cls, (0, pad))
            return bk_out, s_top, cls

    return jax.vmap(per_image)(boxes, scores)


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh", "topk",
                                   "max_det"))
def device_nms_seq(boxes: jnp.ndarray, scores: jnp.ndarray,
                   iou_thresh: float = NMS_IOU_THRESH,
                   score_thresh: float = SCORE_THRESH_VIS,
                   topk: int = MAX_DETECTIONS,
                   max_det: int = MAX_DETECTIONS):
    """Round-4 sequential formulation (per-class top-K + K-step
    ``fori_loop`` greedy): kept as the device-side A/B baseline and a
    second oracle for the fixpoint implementation."""
    b_xyxy = cxcywh_to_xyxy(boxes)
    topk = min(topk, boxes.shape[1])

    def per_class(bx, sc):           # bx (M,4), sc (M,)
        sc_k, idx = jax.lax.top_k(sc, topk)
        bk = bx[idx]
        keep = _greedy_suppress(bk, sc_k, iou_thresh, score_thresh)
        return bk, jnp.where(keep, sc_k, 0.0)

    def per_image(bx, sc):           # bx (M,4), sc (M,C)
        c = sc.shape[-1]
        bk, sk = jax.vmap(per_class, in_axes=(None, 1))(bx, sc)  # (C,K,...)
        cls = jax.lax.broadcasted_iota(jnp.int32, (c, sk.shape[1]), 0)
        bk, sk, cls = (bk.reshape(-1, 4), sk.reshape(-1), cls.reshape(-1))
        d = min(max_det, sk.shape[0])
        s_top, i_top = jax.lax.top_k(sk, d)
        bk, cls = bk[i_top], cls[i_top]
        if d < max_det:               # keep the advertised static shape
            pad = max_det - d
            bk = jnp.pad(bk, ((0, pad), (0, 0)))
            s_top = jnp.pad(s_top, (0, pad))
            cls = jnp.pad(cls, (0, pad))
        return bk, s_top, cls

    return jax.vmap(per_image)(b_xyxy, scores)


# ---------------------------------------------------------------------------
# Host NMS (numpy oracle, reference-style P3)
# ---------------------------------------------------------------------------

def host_nms(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float = NMS_IOU_THRESH,
             score_thresh: float = SCORE_THRESH_VIS,
             max_det: int = MAX_DETECTIONS):
    """Per-class greedy NMS for one image on host.

    boxes (M, 4) cxcywh, scores (M, C). Returns (boxes_xyxy (D,4),
    scores (D,), classes (D,)) for the D <= max_det survivors, score-desc.
    """
    from dnn_inference_engine_tpu.runtime.native_bridge import native_nms
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    bx = np.asarray(cxcywh_to_xyxy(boxes))
    out_b, out_s, out_c = [], [], []
    for c in range(scores.shape[1]):
        sc = scores[:, c]
        cand = np.where(sc > score_thresh)[0]
        cand = cand[np.argsort(-sc[cand], kind="stable")]
        # no per-class cap here: max_det applies to the merged cross-class
        # list below (keeps native and numpy backends output-identical
        # even when one class alone has > max_det survivors)
        kept_local = native_nms(bx[cand], sc[cand], iou_thresh,
                                score_thresh, len(cand))
        if kept_local is not None:
            kept = cand[kept_local]
        else:
            kept = []
            for i in cand:
                if all(_iou_single(bx[i], bx[j]) <= iou_thresh
                       for j in kept):
                    kept.append(i)
        for i in kept:
            out_b.append(bx[i]); out_s.append(sc[i]); out_c.append(c)
    if not out_b:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int32))
    order = np.argsort(-np.asarray(out_s), kind="stable")[:max_det]
    return (np.asarray(out_b, np.float32)[order],
            np.asarray(out_s, np.float32)[order],
            np.asarray(out_c, np.int32)[order])


def _iou_single(a, b) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    ua = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    ub = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
    return float(inter / max(ua + ub - inter, 1e-9))
