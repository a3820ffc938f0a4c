"""PASCAL VOC dataset loading + end-to-end engine evaluation (reference
Q4/E3; SURVEY.md sections 2.8, 3.4).

Expects the standard VOCdevkit layout:
  <voc_dir>/VOC2007/JPEGImages/*.jpg
  <voc_dir>/VOC2007/Annotations/*.xml
  <voc_dir>/VOC2007/ImageSets/Main/test.txt

No dataset ships in this sandbox (zero egress); the loader is exercised by
tests with synthetic annotations and runs against a real VOCdevkit when
one is present.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from dnn_inference_engine_tpu.config import VOC_CLASSES


def parse_voc_xml(path: str) -> Dict:
    """One annotation file -> {"boxes" (G,4) xyxy, "classes", "difficult"}."""
    root = ET.parse(path).getroot()
    boxes, classes, difficult = [], [], []
    for obj in root.findall("object"):
        name = obj.findtext("name")
        if name not in VOC_CLASSES:
            continue
        bb = obj.find("bndbox")
        boxes.append([float(bb.findtext(k))
                      for k in ("xmin", "ymin", "xmax", "ymax")])
        classes.append(VOC_CLASSES.index(name))
        difficult.append(obj.findtext("difficult", "0") == "1")
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "classes": np.asarray(classes, np.int32),
        "difficult": np.asarray(difficult, bool),
    }


def voc_image_list(voc_dir: str, split: str = "2007_test"):
    year, part = split.split("_")
    base = os.path.join(voc_dir, f"VOC{year}")
    with open(os.path.join(base, "ImageSets", "Main", f"{part}.txt")) as f:
        ids = [line.strip() for line in f if line.strip()]
    return [(i,
             os.path.join(base, "JPEGImages", f"{i}.jpg"),
             os.path.join(base, "Annotations", f"{i}.xml")) for i in ids]


def evaluate_voc(engine, voc_dir: str, split: str = "2007_test",
                 limit: Optional[int] = None, batch: Optional[int] = None,
                 use_07_metric: bool = True) -> Dict:
    """Run the engine over a VOC split and report mAP@0.5.

    Detection uses the low eval score threshold (SURVEY.md P3) regardless
    of the engine's display threshold.
    """
    from dnn_inference_engine_tpu.config import SCORE_THRESH_EVAL
    from dnn_inference_engine_tpu.eval.voc import voc_map
    from dnn_inference_engine_tpu.preprocess import (
        boxes_to_original, load_image, preprocess_image)

    items = voc_image_list(voc_dir, split)
    if limit:
        items = items[:limit]
    batch = batch or max(engine.config.batch, 1)
    size = engine.config.input_size

    # eval threshold override: rebuild the jitted detect fn if needed
    old_thresh = engine.config.score_thresh
    if old_thresh != SCORE_THRESH_EVAL:
        engine.config.score_thresh = SCORE_THRESH_EVAL
        engine._detect_fn = None

    detections: List[Dict] = []
    ground_truth: List[Dict] = []
    for i in range(0, len(items), batch):
        chunk = items[i:i + batch]
        xs, metas = [], []
        for _id, jpg, xml in chunk:
            x, meta = preprocess_image(load_image(jpg), size)
            xs.append(x)
            metas.append(meta)
            ground_truth.append(parse_voc_xml(xml))
        xb = np.zeros((batch, size, size, 3), np.float32)
        xb[:len(xs)] = np.stack(xs)
        boxes, scores, classes = engine.detect(xb)
        for j, meta in enumerate(metas):
            keep = scores[j] > 0
            detections.append({
                "boxes": boxes_to_original(boxes[j][keep], meta),
                "scores": scores[j][keep],
                "classes": classes[j][keep],
            })

    engine.config.score_thresh = old_thresh
    engine._detect_fn = None

    m, aps = voc_map(detections, ground_truth, len(VOC_CLASSES),
                     use_07_metric=use_07_metric)
    return {
        "mAP@0.5": m,
        "per_class": {VOC_CLASSES[c]: aps[c] for c in range(len(VOC_CLASSES))},
        "images": len(items),
        "mode": engine.config.mode,
    }
