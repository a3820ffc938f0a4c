"""Single source of truth for engine configuration and workload constants.

SURVEY.md section 7 ("hard parts", item 6) requires all reference-derived
constants (anchors, thresholds, quantization semantics) to live in one small
module so that backfilled facts from the real reference tree are a one-file
change. This is that module.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Workload constants (YOLOv2-tiny on VOC; SURVEY.md section 2.5)
# ---------------------------------------------------------------------------

# Standard darknet yolov2-tiny-voc anchors, in grid-cell units.
# SURVEY.md section 2.5 tags these [R - verify]; they are the public
# darknet defaults.
YOLOV2_TINY_ANCHORS: Tuple[Tuple[float, float], ...] = (
    (1.08, 1.19),
    (3.42, 4.41),
    (6.63, 11.38),
    (9.42, 5.11),
    (16.62, 10.52),
)

# Standard darknet yolov3-tiny COCO anchors in pixels (mask order:
# first head uses (81,82),(135,169),(344,319); second head the rest).
YOLOV3_TINY_ANCHORS: Tuple[Tuple[float, float], ...] = (
    (10, 14), (23, 27), (37, 58), (81, 82), (135, 169), (344, 319),
)

VOC_CLASSES: Tuple[str, ...] = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

INPUT_SIZE = 416          # YOLOv2-tiny input resolution (SURVEY.md section 2.5)
GRID_SIZE = 13            # output grid 13x13
NUM_ANCHORS = 5
NUM_CLASSES = 20

# Detection thresholds. SURVEY.md section 2.4 P3 tags the reference values
# [R ~0.3-0.5 - verify]; defaults here follow the public darknet demo values.
SCORE_THRESH_VIS = 0.3    # visualization / demo threshold
SCORE_THRESH_EVAL = 0.005  # low threshold for mAP evaluation
NMS_IOU_THRESH = 0.45
MAX_DETECTIONS = 128      # static top-K for on-device NMS (SURVEY.md section 7)
# Candidate pool for the fixpoint device NMS: the class-agnostic top-K
# boxes (by best class score) that enter suppression. 256 measured
# survivor-converged on an uncalibrated synthetic head at the 0.3
# serving threshold (tools/ab_nms.py round-5 sweep: 128 -> 41
# survivors, 256/512/845 -> 90), at +25 us on batch-1 detect.
# TRUNCATION IS A HIGH-THRESHOLD OPTIMIZATION: at low/eval thresholds
# (e.g. 0.005-0.04) far more than 256 candidates clear the bar and a
# capped pool costs recall (TPU-lane measurement: production-proxy mAP
# 0.758 capped at 256 vs 0.887 uncapped). EngineConfig therefore
# resolves the pool ADAPTIVELY unless nms_topk is set explicitly:
# NMS_TOPK when score_thresh >= NMS_TRUNCATION_MIN_THRESH, the full
# candidate set below it.
NMS_TOPK = 256
NMS_TRUNCATION_MIN_THRESH = 0.25

# Quantization semantics (SURVEY.md section 2.2 / hard part 5):
#  - symmetric int8, clip to [-127, 127] (no -128, keeps symmetry)
#  - weights: per-output-channel scale  s_c = max|W_c| / 127
#  - activations: per-tensor scale from calibration
#  - leaky-ReLU applied AFTER dequant, in f32 (reference semantics per
#    SURVEY.md hard part 5 [R - verify])
QMAX = 127.0
LEAKY_SLOPE = 0.1


# ---------------------------------------------------------------------------
# Engine configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EngineConfig:
    """Full engine configuration (SURVEY.md section 5, config/flag system).

    Replaces the reference's positional sys.argv parsing with one dataclass
    loadable from JSON or CLI flags.
    """

    model: str = "yolov2-tiny"          # yolov2-tiny | yolov3-tiny | resnet18
    mode: str = "fp32"                  # fp32 | w8 | w8a8
    kernel: str = "auto"                # auto | xla | pallas
    batch: int = 1
    input_size: int = INPUT_SIZE
    num_classes: int = NUM_CLASSES

    # Sharding (SURVEY.md section 2.6 / N2)
    mesh_shape: Tuple[int, int] = (1, 1)   # (data, model)
    sharding: str = "replicated"           # replicated | channel

    # Detection thresholds
    score_thresh: float = SCORE_THRESH_VIS
    nms_iou_thresh: float = NMS_IOU_THRESH
    max_detections: int = MAX_DETECTIONS
    # NMS candidate pool: None = adaptive (see NMS_TOPK — capped at
    # serving thresholds, uncapped at eval-grade thresholds where a cap
    # costs recall); an int caps it explicitly.
    nms_topk: Optional[int] = None

    # Serving (SURVEY.md N1)
    serve_max_batch: int = 32
    serve_timeout_ms: float = 5.0

    # Paths
    weights: Optional[str] = None
    calib: Optional[str] = None
    # Plan strategy: path to a `cli plan-sweep` artifact (or a bare
    # {layer: [kind, fold, opts?]} JSON). When set, the fused plan uses
    # the measured strategy instead of the built-in hand table.
    strategy: Optional[str] = None

    def resolved_nms_topk(self) -> int:
        """Candidate-pool size the detect path should compile with.
        Explicit nms_topk wins; otherwise NMS_TOPK at serving-grade
        score thresholds and "unbounded" (clamped to the candidate
        count by device_nms) at eval-grade thresholds, where a cap
        measurably costs recall (see NMS_TOPK)."""
        if self.nms_topk is not None:
            return self.nms_topk
        if self.score_thresh >= NMS_TRUNCATION_MIN_THRESH:
            return NMS_TOPK
        return 1 << 30

    @classmethod
    def from_json(cls, path: str) -> "EngineConfig":
        with open(path) as f:
            d = json.load(f)
        if "mesh_shape" in d:
            d["mesh_shape"] = tuple(d["mesh_shape"])
        return cls(**d)

    def to_json(self, path: str) -> None:
        d = dataclasses.asdict(self)
        with open(path, "w") as f:
            json.dump(d, f, indent=2)
