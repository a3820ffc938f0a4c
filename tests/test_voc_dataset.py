"""VOC dataset loader + end-to-end eval harness tests (SURVEY.md 3.4)."""

import os

import numpy as np
import pytest

from dnn_inference_engine_tpu.eval.voc_dataset import (
    parse_voc_xml, voc_image_list, evaluate_voc,
)

XML_TMPL = """<annotation>
  <filename>{name}.jpg</filename>
  {objects}
</annotation>"""

OBJ_TMPL = """<object>
  <name>{cls}</name><difficult>{diff}</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>"""


def _make_voc(tmp_path, n_images=4):
    base = tmp_path / "VOC2007"
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(base / d, exist_ok=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    ids = []
    gts = []
    for i in range(n_images):
        name = f"{i:06d}"
        ids.append(name)
        img = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
        Image.fromarray(img).save(base / "JPEGImages" / f"{name}.jpg")
        objs = OBJ_TMPL.format(cls="dog", diff=0, x1=10 + i, y1=20,
                               x2=60 + i, y2=80)
        objs += OBJ_TMPL.format(cls="car", diff=1, x1=5, y1=5, x2=30, y2=30)
        with open(base / "Annotations" / f"{name}.xml", "w") as f:
            f.write(XML_TMPL.format(name=name, objects=objs))
        gts.append((10 + i, 20, 60 + i, 80))
    with open(base / "ImageSets" / "Main" / "test.txt", "w") as f:
        f.write("\n".join(ids))
    return str(tmp_path), gts


def test_parse_voc_xml(tmp_path):
    voc_dir, _ = _make_voc(tmp_path)
    items = voc_image_list(voc_dir, "2007_test")
    assert len(items) == 4
    gt = parse_voc_xml(items[0][2])
    assert gt["boxes"].shape == (2, 4)
    assert gt["classes"].tolist() == [11, 6]       # dog, car
    assert gt["difficult"].tolist() == [False, True]


class OracleEngine:
    """Fake engine that returns each image's GT dog box (detections are in
    network coords; evaluate_voc maps back through meta)."""

    def __init__(self, gts, input_size=64):
        from dnn_inference_engine_tpu.config import EngineConfig
        self.config = EngineConfig(input_size=input_size, batch=2)
        self._detect_fn = None
        self.gts = gts
        self.calls = 0

    def detect(self, x):
        n = x.shape[0]
        boxes = np.zeros((n, 8, 4), np.float32)
        scores = np.zeros((n, 8), np.float32)
        classes = np.zeros((n, 8), np.int32)
        for j in range(n):
            idx = self.calls * 2 + j  # batch=2
            if idx < len(self.gts):
                x1, y1, x2, y2 = self.gts[idx]
                # original 120x100 -> network 64x64
                sx, sy = 64 / 120, 64 / 100
                boxes[j, 0] = [x1 * sx, y1 * sy, x2 * sx, y2 * sy]
                scores[j, 0] = 0.9
                classes[j, 0] = 11  # dog
        self.calls += 1
        return boxes, scores, classes


def test_evaluate_voc_oracle(tmp_path):
    voc_dir, gts = _make_voc(tmp_path)
    eng = OracleEngine(gts)
    res = evaluate_voc(eng, voc_dir, split="2007_test", use_07_metric=False)
    assert res["images"] == 4
    assert res["per_class"]["dog"] > 0.99        # perfect detections
    # difficult 'car' GT boxes are excluded: no car detections, no penalty
    assert res["mAP@0.5"] > 0.99


def test_evaluate_voc_real_engine_smoke(tmp_path, rng):
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    voc_dir, _ = _make_voc(tmp_path, n_images=2)
    eng = Engine(EngineConfig(model="yolov2-tiny", mode="fp32",
                              input_size=64, batch=2)).load_weights().prepare()
    res = evaluate_voc(eng, voc_dir, split="2007_test", limit=2)
    assert 0.0 <= res["mAP@0.5"] <= 1.0          # random weights: ~0
