"""Quantization accuracy gate — the in-repo proxy for the <=0.5-mAP
north star (SURVEY.md Q4/section 4.3; BASELINE north_star accuracy).

Real VOC weights/images are unavailable in the zero-egress sandbox, so
the gate uses the FP32 model's own detections on synthetic images as
pseudo ground truth and asserts the W8A8 path reproduces them:

1. pseudo-GT mAP: w8a8 detections evaluated against fp32 detections
   via the standard VOC AP machinery must stay near-perfect;
2. box-level agreement: each fp32 box must have a matching (same-class,
   high-IoU) w8a8 box;
3. NEGATIVE CONTROL: a deliberately broken quantization (activation
   scales off by 16x) must FAIL the same gate — proving the gate can
   catch a real regression, which the per-layer RMS tolerance could not
   (VERDICT round 1, missing item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.eval.voc import voc_map
from dnn_inference_engine_tpu.runtime.engine import Engine

SIZE = 128          # small enough for CPU CI, large enough for a 4x4 grid
N_IMAGES = 8
SCORE_THRESH = 0.04   # detection threshold (low: keep ranked tails for AP)
GT_THRESH = 0.08      # pseudo-GT keeps only the fp32 model's confident boxes


def _engine(mode):
    cfg = EngineConfig(model="yolov2-tiny", mode=mode, kernel="xla",
                       batch=N_IMAGES, input_size=SIZE,
                       score_thresh=SCORE_THRESH)
    return Engine(cfg).load_weights(key=jax.random.PRNGKey(0)).prepare()


@pytest.fixture(scope="module")
def images():
    # structured inputs (blobs on background), not pure noise: gives the
    # random-weight detector stable, spatially varying responses
    rng = np.random.default_rng(42)
    imgs = rng.uniform(0.3, 0.5, (N_IMAGES, SIZE, SIZE, 3)).astype(np.float32)
    for i in range(N_IMAGES):
        for _ in range(4):
            cy, cx = rng.integers(16, SIZE - 16, 2)
            h, w = rng.integers(8, 32, 2)
            col = rng.uniform(0, 1, 3)
            imgs[i, max(0, cy - h):cy + h, max(0, cx - w):cx + w] = col
    return imgs


def _detections(eng, images, act_scales=None):
    if act_scales is not None:
        eng.act_scales = act_scales
        eng._detect_fn = None               # force recompile with new scales
    b, s, c = eng.detect(images)
    out = []
    for i in range(len(images)):
        keep = s[i] > 0
        out.append({"boxes": b[i][keep], "scores": s[i][keep],
                    "classes": c[i][keep]})
    return out


@pytest.fixture(scope="module")
def fp32_dets(images):
    return _detections(_engine("fp32"), images)


@pytest.fixture(scope="module")
def pseudo_gt(fp32_dets):
    gt = []
    for d in fp32_dets:
        k = d["scores"] > GT_THRESH
        gt.append({"boxes": d["boxes"][k], "classes": d["classes"][k]})
    return gt


@pytest.fixture(scope="module")
def w8a8_engine():
    return _engine("w8a8")


def test_fp32_produces_pseudo_gt(pseudo_gt):
    n = sum(len(d["classes"]) for d in pseudo_gt)
    assert n >= 50, f"pseudo-GT too sparse ({n} boxes) — raise blob count"


def test_w8a8_map_vs_fp32_pseudo_gt(images, pseudo_gt, w8a8_engine):
    """The headline accuracy gate: quantized mAP against the fp32 model's
    confident detections (detections kept at a lower threshold so the AP
    ranking sees the borderline tail). On real VOC the bar is <=0.5 mAP
    absolute drop; against pseudo-GT from the SAME model the healthy
    band is near-perfect agreement (measured 0.944 on this seed)."""
    dets = _detections(w8a8_engine, images)
    mAP, _ = voc_map(dets, pseudo_gt, num_classes=20)
    assert mAP > 0.90, f"w8a8 mAP vs fp32 pseudo-GT dropped to {mAP:.3f}"


def test_w8a8_box_level_agreement(images, pseudo_gt, w8a8_engine):
    """Every confident fp32 box must have a same-class w8a8 box at
    IoU >= 0.6 (box-level detection agreement, finer than mAP;
    measured 284/293 on this seed)."""
    from dnn_inference_engine_tpu.eval.voc import _iou_matrix
    dets = _detections(w8a8_engine, images)
    matched = total = 0
    for g, d_q in zip(pseudo_gt, dets):
        for box, cls in zip(g["boxes"], g["classes"]):
            total += 1
            same = d_q["classes"] == cls
            if not np.any(same):
                continue
            ious = _iou_matrix(box[None], d_q["boxes"][same])[0]
            if ious.size and ious.max() >= 0.6:
                matched += 1
    assert total >= 50
    assert matched / total > 0.93, (matched, total)


def test_gate_catches_broken_quantization(images, pseudo_gt):
    """Negative control: wreck the activation scales (16x too large ->
    severe quantization of small activations) and the SAME gate must
    fail decisively (measured 0.17 on this seed). A gate that can't
    fail is not a gate."""
    eng = _engine("w8a8")
    bad_scales = [s * 16.0 for s in eng.act_scales]
    dets = _detections(eng, images, act_scales=bad_scales)
    mAP, _ = voc_map(dets, pseudo_gt, num_classes=20)
    assert mAP < 0.5, (
        f"broken quantization still scored mAP {mAP:.3f} — the gate has "
        "no teeth; tighten the threshold or the corruption")
