"""Decode + NMS tests (reference P2/P3; SURVEY.md hard part 1: device NMS
must be bit-compared against host NMS)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.postprocess import (
    cxcywh_to_xyxy, decode_yolov2, device_nms, host_nms,
)


def test_decode_shapes():
    head = jnp.zeros((2, 13, 13, 125))
    boxes, scores = decode_yolov2(head)
    assert boxes.shape == (2, 845, 4)
    assert scores.shape == (2, 845, 20)


def test_decode_numpy_parity(rng):
    """Decode matches an independent numpy implementation."""
    head = rng.standard_normal((1, 2, 2, 125)).astype(np.float32)
    boxes, scores = decode_yolov2(jnp.asarray(head), input_size=64)
    boxes, scores = np.asarray(boxes), np.asarray(scores)

    from dnn_inference_engine_tpu.config import YOLOV2_TINY_ANCHORS
    h = head.reshape(1, 2, 2, 5, 25)
    sig = lambda v: 1 / (1 + np.exp(-v))
    cell = 64 / 2
    for r in range(2):
        for c in range(2):
            for a in range(5):
                i = (r * 2 + c) * 5 + a
                t = h[0, r, c, a]
                np.testing.assert_allclose(
                    boxes[0, i, 0], (c + sig(t[0])) * cell, rtol=1e-5)
                np.testing.assert_allclose(
                    boxes[0, i, 1], (r + sig(t[1])) * cell, rtol=1e-5)
                np.testing.assert_allclose(
                    boxes[0, i, 2],
                    YOLOV2_TINY_ANCHORS[a][0] * np.exp(t[2]) * cell, rtol=1e-5)
                e = np.exp(t[5:] - t[5:].max())
                sm = e / e.sum()
                np.testing.assert_allclose(
                    scores[0, i], sig(t[4]) * sm, rtol=1e-4)


def test_device_nms_matches_host(rng):
    m, c = 200, 4
    boxes = np.stack([
        rng.uniform(50, 350, m), rng.uniform(50, 350, m),
        rng.uniform(10, 80, m), rng.uniform(10, 80, m)], axis=-1).astype(np.float32)
    scores = (rng.uniform(0, 1, (m, c)) ** 3).astype(np.float32)

    db, ds, dc = device_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                            iou_thresh=0.45, score_thresh=0.3,
                            topk=m, max_det=64)
    hb, hs, hc = host_nms(boxes, scores, iou_thresh=0.45, score_thresh=0.3,
                          max_det=64)
    ds, dc, db = np.asarray(ds[0]), np.asarray(dc[0]), np.asarray(db[0])
    n_dev = int((ds > 0).sum())
    assert n_dev == len(hs), (n_dev, len(hs))
    # same survivors in same score order
    np.testing.assert_allclose(ds[:n_dev], hs, rtol=1e-6)
    np.testing.assert_array_equal(dc[:n_dev], hc)
    np.testing.assert_allclose(db[:n_dev], hb, rtol=1e-5)


def test_device_nms_suppresses_overlaps():
    # two near-identical boxes + one distant box, one class
    boxes = np.array([[100, 100, 40, 40], [102, 102, 40, 40],
                      [300, 300, 40, 40]], np.float32)
    scores = np.array([[0.9], [0.8], [0.7]], np.float32)
    db, ds, dc = device_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                            iou_thresh=0.45, score_thresh=0.1,
                            topk=3, max_det=3)
    kept = np.asarray(ds[0]) > 0
    assert kept.sum() == 2
    np.testing.assert_allclose(np.sort(np.asarray(ds[0])[kept])[::-1],
                               [0.9, 0.7], rtol=1e-6)


def test_device_nms_fixpoint_matches_seq(rng):
    """The Jacobi-fixpoint formulation must be output-identical to the
    round-4 sequential formulation whenever no candidate truncation
    happens (both are exactly greedy then)."""
    from dnn_inference_engine_tpu.postprocess import device_nms_seq
    for trial in range(4):
        m, c = 150, 6
        boxes = np.stack([
            rng.uniform(50, 350, m), rng.uniform(50, 350, m),
            rng.uniform(10, 120, m), rng.uniform(10, 120, m)],
            axis=-1).astype(np.float32)
        scores = (rng.uniform(0, 1, (m, c)) ** 2).astype(np.float32)
        a = device_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                       iou_thresh=0.45, score_thresh=0.2, topk=m,
                       max_det=64)
        b = device_nms_seq(jnp.asarray(boxes)[None],
                           jnp.asarray(scores)[None],
                           iou_thresh=0.45, score_thresh=0.2, topk=m,
                           max_det=64)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"trial {trial}")


def test_device_nms_deep_suppression_chain():
    """Worst case for the fixpoint iteration: a long chain of boxes
    where each suppresses only its immediate neighbour (spacing 10,
    width 40: neighbour IoU 0.6 > 0.45, next-neighbour 0.33 < 0.45).
    Greedy keeps every other box; the fixpoint must reproduce that
    exactly (and agree with the host oracle)."""
    n = 24
    cx = 100 + 10 * np.arange(n, dtype=np.float32)
    boxes = np.stack([cx, np.full(n, 100, np.float32),
                      np.full(n, 40, np.float32),
                      np.full(n, 40, np.float32)], axis=-1)
    scores = np.linspace(0.9, 0.4, n, dtype=np.float32)[:, None]
    db, ds, dc = device_nms(jnp.asarray(boxes)[None],
                            jnp.asarray(scores)[None],
                            iou_thresh=0.45, score_thresh=0.1,
                            topk=n, max_det=n)
    hb, hs, hc = host_nms(boxes, scores, iou_thresh=0.45,
                          score_thresh=0.1, max_det=n)
    ds = np.asarray(ds[0])
    n_dev = int((ds > 0).sum())
    assert n_dev == len(hs) == n // 2, (n_dev, len(hs))
    np.testing.assert_allclose(ds[:n_dev], hs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(db[0])[:n_dev], hb, rtol=1e-5)


def test_decode_cols_matches_rowmajor(rng):
    """The columnar decode is the row-major decode under the
    anchor-major index permutation m' = a*S2 + cell."""
    from dnn_inference_engine_tpu.postprocess import decode_yolov2_cols
    head = rng.standard_normal((2, 13, 13, 125)).astype(np.float32)
    rb, rs = decode_yolov2(jnp.asarray(head))            # (N,845,4/20)
    cb, cs = decode_yolov2_cols(jnp.asarray(head))       # (N,4/20,845)
    s2, a = 169, 5
    cell = np.arange(845) // a
    anch = np.arange(845) % a
    perm = anch * s2 + cell                              # rowmajor->col
    np.testing.assert_allclose(np.asarray(cb)[:, :, perm],
                               np.asarray(rb).transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs)[:, :, perm],
                               np.asarray(rs).transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-5)


def test_device_nms_cols_matches_rowmajor(rng):
    """Columnar NMS on columnar decode == row-major NMS on row-major
    decode: same survivors in the same score order (no ties with
    random float scores), untruncated."""
    from dnn_inference_engine_tpu.postprocess import (
        decode_yolov2_cols, device_nms_cols)
    head = rng.standard_normal((2, 13, 13, 125)).astype(np.float32) * 2
    rb, rs = decode_yolov2(jnp.asarray(head))
    cb, cs = decode_yolov2_cols(jnp.asarray(head))
    kw = dict(iou_thresh=0.45, score_thresh=0.05, topk=845, max_det=64)
    ra = device_nms(rb, rs, **kw)
    ca = device_nms_cols(cb, cs, **kw)
    for i in range(2):
        n = int((np.asarray(ra[1][i]) > 0).sum())
        nc = int((np.asarray(ca[1][i]) > 0).sum())
        assert n == nc, (i, n, nc)
        np.testing.assert_allclose(np.asarray(ca[1][i])[:n],
                                   np.asarray(ra[1][i])[:n], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ca[2][i])[:n],
                                      np.asarray(ra[2][i])[:n])
        np.testing.assert_allclose(np.asarray(ca[0][i])[:n],
                                   np.asarray(ra[0][i])[:n],
                                   rtol=1e-4, atol=1e-4)


def test_nms_topk_policy():
    """Truncation is a serving-threshold optimization: adaptive pool =
    NMS_TOPK at serving thresholds, unbounded at eval-grade thresholds
    (TPU-lane measurement: capped 256 cost 0.13 proxy mAP at thresh
    0.04); an explicit nms_topk always wins."""
    from dnn_inference_engine_tpu.config import (
        EngineConfig, NMS_TOPK, NMS_TRUNCATION_MIN_THRESH)
    assert EngineConfig().resolved_nms_topk() == NMS_TOPK
    assert EngineConfig(score_thresh=0.04).resolved_nms_topk() >= 845
    assert EngineConfig(score_thresh=0.005).resolved_nms_topk() >= 845
    assert EngineConfig(score_thresh=NMS_TRUNCATION_MIN_THRESH
                        ).resolved_nms_topk() == NMS_TOPK
    assert EngineConfig(score_thresh=0.04,
                        nms_topk=128).resolved_nms_topk() == 128


def test_pack_bits(rng):
    """Bitset packing: bit b of word w == element w*32+b, zero-padded
    to a word multiple, exact for every shape the NMS uses."""
    from dnn_inference_engine_tpu.postprocess import _pack_bits
    for shape in ((7,), (3, 33), (2, 4, 64), (5, 150)):
        x = rng.uniform(0, 1, shape) > 0.5
        p = np.asarray(_pack_bits(jnp.asarray(x)))
        k = shape[-1]
        w = -(-k // 32)
        assert p.shape == shape[:-1] + (w,)
        for idx in np.ndindex(*shape[:-1]):
            for j in range(k):
                bit = (p[idx + (j // 32,)] >> np.uint32(j % 32)) & 1
                assert bool(bit) == bool(x[idx + (j,)]), (shape, idx, j)


def test_cxcywh_to_xyxy():
    b = np.array([[10, 20, 4, 8]], np.float32)
    np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(b)),
                               [[8, 16, 12, 24]])


def test_host_nms_backends_agree_over_max_det(rng, monkeypatch):
    """One class with > max_det mutually non-overlapping survivors: the
    native and numpy backends must return identical (merged, capped)
    results — the cap applies to the merged cross-class list only."""
    from dnn_inference_engine_tpu.postprocess import host_nms
    import dnn_inference_engine_tpu.runtime.native_bridge as nb

    m, max_det = 40, 8
    # non-overlapping boxes on a diagonal, all same class, all above thresh
    cx = np.arange(m, dtype=np.float32) * 50 + 20
    boxes = np.stack([cx, cx, np.full(m, 20, np.float32),
                      np.full(m, 20, np.float32)], axis=-1)
    scores = np.zeros((m, 3), np.float32)
    scores[:, 1] = np.linspace(0.9, 0.5, m)

    got_native = host_nms(boxes, scores, iou_thresh=0.45,
                          score_thresh=0.3, max_det=max_det)
    monkeypatch.setattr(nb, "native_nms", lambda *a, **k: None)
    got_numpy = host_nms(boxes, scores, iou_thresh=0.45,
                         score_thresh=0.3, max_det=max_det)
    for a, b in zip(got_native, got_numpy):
        np.testing.assert_array_equal(a, b)
    assert got_native[0].shape == (max_det, 4)
    assert (got_native[2] == 1).all()
