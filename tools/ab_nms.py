"""A/B the Jacobi-fixpoint device NMS against the round-4 sequential
formulation on the real chip (round-4 verdict task 1: batch-1 detect is
~70% postprocess; NMS while-loop 166 us + top-k 116 us + suppression
~120 us vs ~130 us forward).

Same-process interleaved measurement (axon relay pool varies +-15%
across processes; docs/RELAY.md), auto-scaled loop-difference timing
(runtime/benchlib.py). Also bit-compares the two formulations' outputs
on the live head to re-verify exactness on-device.

Run on the TPU box:  python tools/ab_nms.py [batch ...]
"""

import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [1, 32]
    import jax
    import jax.numpy as jnp
    from dnn_inference_engine_tpu import postprocess as pp
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time_stats
    from dnn_inference_engine_tpu.runtime.engine import Engine

    out = {}
    for batch in batches:
        eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=batch)
                     ).load_weights(key=jax.random.PRNGKey(0)).prepare()
        c = eng.config
        params = eng.exec_params
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, (batch, 416, 416, 3)),
                        jnp.uint8)

        def fwd(xx):
            return eng._fwd(params, xx)

        def detect_with(nms, xx):
            heads = eng._fwd(params, xx)
            boxes, scores = eng._decode(heads)
            # production candidate pool for the fixpoint formulation;
            # the seq baseline's topk is its per-class cap (128)
            topk = (c.resolved_nms_topk() if nms is pp.device_nms
                    else c.max_detections)
            return nms(boxes, scores, iou_thresh=c.nms_iou_thresh,
                       score_thresh=c.score_thresh,
                       topk=topk, max_det=c.max_detections)

        # exactness on the live head: SURVIVOR rows only (zero-score
        # slots carry arbitrary boxes in both formulations), at the
        # production topk. With truncation the candidate sets can
        # differ (global vs per-class top-K) — report, don't assert,
        # survivor agreement there; the untruncated comparison below is
        # the exactness check.
        def survivors(res):
            bx, sc, cl = (np.asarray(t) for t in res)
            out = []
            for i in range(bx.shape[0]):
                n = int((sc[i] > 0).sum())
                out.append((bx[i, :n], sc[i, :n], cl[i, :n]))
            return out

        a = survivors(detect_with(pp.device_nms, x))
        b = survivors(detect_with(pp.device_nms_seq, x))
        agree = all(
            sa[1].shape == sb[1].shape and np.array_equal(sa[1], sb[1])
            and np.array_equal(sa[0], sb[0]) and np.array_equal(sa[2], sb[2])
            for sa, sb in zip(a, b))
        print(f"b{batch} production-topk survivor agreement: {agree} "
              f"(counts {[s[1].size for s in a][:4]} vs "
              f"{[s[1].size for s in b][:4]})", flush=True)

        heads = eng._fwd(params, x)
        boxes0, scores0 = eng._decode(heads)
        full = dict(iou_thresh=c.nms_iou_thresh, score_thresh=c.score_thresh,
                    topk=boxes0.shape[1], max_det=c.max_detections)
        ua = survivors(pp.device_nms(boxes0, scores0, **full))
        ub = survivors(pp.device_nms_seq(boxes0, scores0, **full))
        for i, (sa, sb) in enumerate(zip(ua, ub)):
            for name, ta, tb in zip(("boxes", "scores", "classes"),
                                    sa, sb):
                np.testing.assert_array_equal(
                    ta, tb, err_msg=f"batch {batch} img {i} {name} "
                    "untruncated mismatch new-vs-seq")

        res = {}
        for name, fn in (("forward_only", fwd),
                         ("detect_fixpoint",
                          lambda xx: detect_with(pp.device_nms, xx)),
                         ("detect_seq",
                          lambda xx: detect_with(pp.device_nms_seq, xx))):
            s = per_iter_time_stats(fn, (x,))
            res[name] = {"ms": round(s["min"] * 1e3, 4),
                         "noise_pct": round(s["spread_pct"], 1),
                         "iters": list(s["iters"]),
                         "delta_work_s": round(s["delta_work_s"], 3)}
            print(f"b{batch} {name}: {res[name]}", flush=True)
        fx, sq = res["detect_fixpoint"]["ms"], res["detect_seq"]["ms"]
        fwd_ms = res["forward_only"]["ms"]
        res["post_ms_fixpoint"] = round(fx - fwd_ms, 4)
        res["post_ms_seq"] = round(sq - fwd_ms, 4)
        res["detect_speedup"] = round(sq / fx, 3)
        out[f"b{batch}"] = res
        print(f"b{batch}: detect {sq:.3f} -> {fx:.3f} ms "
              f"({res['detect_speedup']}x), post {res['post_ms_seq']:.3f} "
              f"-> {res['post_ms_fixpoint']:.3f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
