"""Native C++ host library tests (native/host_ops.cpp via ctypes bridge).

The library is built on demand by the bridge (make -C native); if the
toolchain is unavailable these tests skip and the numpy fallbacks cover
the same behavior (they are the oracle here).
"""

import numpy as np
import pytest

from dnn_inference_engine_tpu.runtime import native_bridge as nb

pytestmark = pytest.mark.skipif(not nb.native_available(),
                                reason="native lib not built")


def test_native_resize_matches_numpy(rng):
    from dnn_inference_engine_tpu.preprocess import _resize_bilinear_numpy
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    got = nb.native_resize(img, 16, 24)
    ref = _resize_bilinear_numpy(img, 16, 24)
    # FMA/ordering differences from -march=native: ~1e-3 on 0..255 values
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_native_preprocess_u8(rng):
    from dnn_inference_engine_tpu.preprocess import _resize_bilinear_numpy
    img = rng.integers(0, 256, (100, 120, 3)).astype(np.uint8)
    got = nb.native_preprocess_u8(img, 64, 64)
    ref = _resize_bilinear_numpy(img.astype(np.float32) / 255.0, 64, 64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_native_nms_matches_python(rng):
    m = 100
    boxes = np.stack([rng.uniform(0, 300, m), rng.uniform(0, 300, m),
                      rng.uniform(10, 60, m), rng.uniform(10, 60, m)],
                     axis=-1).astype(np.float32)
    boxes[:, 2] += boxes[:, 0]
    boxes[:, 3] += boxes[:, 1]
    scores = np.sort(rng.uniform(0, 1, m).astype(np.float32))[::-1].copy()

    kept = nb.native_nms(boxes, scores, 0.45, 0.1, 50)
    # python oracle
    ref = []
    for i in range(m):
        if scores[i] <= 0.1 or len(ref) >= 50:
            continue
        ok = True
        for j in ref:
            from dnn_inference_engine_tpu.postprocess import _iou_single
            if _iou_single(boxes[i], boxes[j]) > 0.45:
                ok = False
                break
        if ok:
            ref.append(i)
    np.testing.assert_array_equal(kept, ref)


def test_preprocess_image_uses_native(rng):
    """End-to-end: uint8 image through preprocess_image matches fallback."""
    from dnn_inference_engine_tpu.preprocess import (
        _resize_bilinear_numpy, preprocess_image)
    img = rng.integers(0, 256, (375, 500, 3)).astype(np.uint8)
    out, meta = preprocess_image(img, 416)
    ref = _resize_bilinear_numpy(img.astype(np.float32), 416, 416) / 255.0
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
