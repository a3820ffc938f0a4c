"""``engine`` CLI (reference L5 driver, SURVEY.md section 2.4 P5).

Replaces the reference's positional sys.argv parsing with subcommands:

  python -m dnn_inference_engine_tpu.cli detect --image img.jpg [--mode w8a8]
  python -m dnn_inference_engine_tpu.cli bench  --mode w8a8 --batch 32
  python -m dnn_inference_engine_tpu.cli eval   --voc-dir ... --mode w8a8
  python -m dnn_inference_engine_tpu.cli serve  --port 8000
  python -m dnn_inference_engine_tpu.cli calibrate --images dir --out ckpt.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _add_common(p):
    p.add_argument("--model", default="yolov2-tiny")
    p.add_argument("--mode", default="fp32", choices=["fp32", "w8", "w8a8"])
    p.add_argument("--kernel", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--weights", default=None,
                   help=".npz checkpoint / .pkl pytree / darknet .weights; "
                        "random weights if omitted")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--config", default=None, help="JSON EngineConfig file")
    p.add_argument("--score-thresh", type=float, default=None)
    p.add_argument("--nms-topk", type=int, default=None,
                   help="NMS candidate pool (default 256; 128 for "
                        "latency-critical serving — config.py NMS_TOPK)")
    p.add_argument("--mesh", default=None, metavar="DP,MP",
                   help="(data, model) mesh shape, e.g. 2,2 — shards the "
                        "whole pipeline over the devices (SURVEY.md N2)")
    p.add_argument("--sharding", default=None,
                   choices=["replicated", "channel"],
                   help="weight sharding policy for --mesh (channel = "
                        "int32-psum row-parallel conv pair)")
    p.add_argument("--calib-images", default=None, metavar="DIR",
                   help="calibration image dir for w8a8 with real weights")
    p.add_argument("--strategy", default=None, metavar="JSON",
                   help="measured plan strategy from `plan-sweep` "
                        "(overrides the built-in hand table)")


def _build_engine(args):
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    if args.config:
        cfg = EngineConfig.from_json(args.config)
    else:
        cfg = EngineConfig()
    cfg.model = args.model
    cfg.mode = args.mode
    cfg.kernel = args.kernel
    cfg.batch = args.batch
    cfg.weights = args.weights or cfg.weights
    if getattr(args, "score_thresh", None) is not None:
        cfg.score_thresh = args.score_thresh
    if getattr(args, "nms_topk", None) is not None:
        cfg.nms_topk = args.nms_topk
    if getattr(args, "strategy", None):
        cfg.strategy = args.strategy
    if getattr(args, "mesh", None):
        cfg.mesh_shape = tuple(int(v) for v in args.mesh.split(","))
        if getattr(args, "sharding", None):
            cfg.sharding = args.sharding
        from dnn_inference_engine_tpu.parallel.mesh import apply_overlap_flags
        apply_overlap_flags()          # before first backend init
    calib = None
    if getattr(args, "calib_images", None):
        from dnn_inference_engine_tpu.preprocess import load_calib_images
        calib = load_calib_images(args.calib_images, cfg.input_size)
    eng = Engine(cfg).load_weights()
    eng.prepare(calib_images=calib)
    return eng


def cmd_detect(args):
    from dnn_inference_engine_tpu.config import VOC_CLASSES
    from dnn_inference_engine_tpu.preprocess import (
        boxes_to_original, draw_boxes, load_image, preprocess_image)
    eng = _build_engine(args)
    img = load_image(args.image)
    x, meta = preprocess_image(img, eng.config.input_size)
    t0 = time.perf_counter()
    boxes, scores, classes = eng.detect(x[None])
    dt = time.perf_counter() - t0
    n = int((scores[0] > 0).sum())
    orig = boxes_to_original(boxes[0][:n], meta)
    for b, s, c in zip(orig, scores[0][:n], classes[0][:n]):
        name = VOC_CLASSES[c] if c < len(VOC_CLASSES) else str(c)
        print(f"{name:14s} {s:.3f}  [{b[0]:.0f}, {b[1]:.0f}, {b[2]:.0f}, {b[3]:.0f}]")
    print(f"# {n} detections in {dt*1e3:.1f} ms (incl. first-call compile)")
    if args.out:
        out = draw_boxes(img, orig, scores[0][:n], classes[0][:n], VOC_CLASSES)
        from PIL import Image
        Image.fromarray(out).save(args.out)
        print(f"# wrote {args.out}")


def cmd_bench(args):
    import bench as bench_mod
    result = bench_mod.run_bench(model=args.model, mode=args.mode,
                                 kernel=args.kernel, batch=args.batch,
                                 verbose=True)
    print(json.dumps(result))


def cmd_layer_times(args):
    eng = _build_engine(args)
    if eng._plan is not None:
        # fused-plan config: time the EXECUTED stages with roofline %
        # (SURVEY.md N4). layer_times would time the generic ops the
        # plan does not run.
        iters = (tuple(int(v) for v in args.iters.split(","))
                 if args.iters else None)
        print(f"# per-stage steady-state times of the executed plan, "
              f"batch={args.batch}"
              + (" (auto-scaled iteration counts)" if iters is None else ""))
        print(f"{'stage':>5s} {'name':18s} {'ms':>9s} {'GOP':>8s} "
              f"{'GOPexec':>8s} {'MFU%':>7s} {'HWutil%':>8s} "
              f"{'HBM MB':>7s} {'bind':>4s} {'bind%':>7s} {'noise%':>7s}")
        total = 0.0
        for r in eng.stage_times(batch=args.batch, iters=iters):
            mfu = ("  <res." if r["mfu_pct"] is None
                   else f"{r['mfu_pct']:7.2f}")
            hwu = ("   <res." if r["hw_util_pct"] is None
                   else f"{r['hw_util_pct']:8.2f}")
            bnd = ("  <res." if r["pct_of_binding"] is None
                   else f"{r['pct_of_binding']:7.2f}")
            sus = "  SUSPECT" if r["suspect"] else ""
            print(f"{r['stage']:5d} {r['name']:18s} {r['ms']:9.4f} "
                  f"{r['gop']:8.3f} {r['gop_exec']:8.3f} {mfu} {hwu} "
                  f"{r['hbm_mb']:7.2f} {r['binding']:>4s} {bnd} "
                  f"{r['noise_pct']:7.1f}{sus}")
            total += r["ms"]
        print(f"# TOTAL stages {total:.4f} ms")
        return
    print(f"# per-layer steady-state times, batch={args.batch}, "
          f"mode={args.mode}, kernel={args.kernel}")
    total = 0.0
    for name, t in eng.layer_times(batch=args.batch):
        print(f"{name:32s} {t*1e6:10.1f} us")
        total += t
    print(f"{'TOTAL conv':32s} {total*1e6:10.1f} us")


def cmd_eval(args):
    from dnn_inference_engine_tpu.eval.voc_dataset import evaluate_voc
    eng = _build_engine(args)
    res = evaluate_voc(eng, args.voc_dir, split=args.split,
                       limit=args.limit)
    print(json.dumps(res, indent=2))


def cmd_serve(args):
    from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher
    multi = bool(args.num_processes and args.num_processes > 1)
    if multi:
        # multi-host bring-up (BASELINE configs 4/5): overlap flags + the
        # jax.distributed runtime, one server process per host
        from dnn_inference_engine_tpu.parallel.mesh import init_distributed
        init_distributed(coordinator=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    eng = _build_engine(args)
    if multi:
        import jax
        from dnn_inference_engine_tpu.runtime.serve_distributed import (
            DistributedBatcher, follower_loop)
        if jax.process_index() != 0:
            # follower host: mirror the leader's lockstep steps forever
            print(f"# follower process {jax.process_index()}: serving "
                  "lockstep steps (no HTTP)", flush=True)
            served = follower_loop(eng)
            print(f"# follower exiting after {served} batches")
            return
        batcher = DistributedBatcher(eng).start()
    else:
        batcher = ContinuousBatcher(eng).start()
    batcher.serve_http(args.port)
    mesh_note = (f" mesh={eng.config.mesh_shape} {eng.config.sharding}"
                 if eng.mesh is not None else "")
    print(f"# serving {args.model} {args.mode}{mesh_note} on :{args.port} "
          f"(max_batch={batcher.max_batch}); POST /detect, GET /stats")
    try:
        while True:
            time.sleep(10)
            print(json.dumps(batcher.stats()))
    except KeyboardInterrupt:
        batcher.stop()


def cmd_dump_goldens(args):
    """E1: dump per-layer FP32 golden tensors for a (seeded or real) input."""
    from dnn_inference_engine_tpu.eval.golden import dump_goldens
    from dnn_inference_engine_tpu.preprocess import load_image, preprocess_image
    import jax.numpy as jnp
    args.mode = "fp32"                      # goldens are always FP32
    eng = _build_engine(args)
    if args.image:
        x, _ = preprocess_image(load_image(args.image), eng.config.input_size)
        x = x[None]
    else:
        rng = np.random.default_rng(args.seed)
        s = eng.config.input_size
        x = rng.uniform(0, 1, (1, s, s, 3)).astype(np.float32)
    dump_goldens(eng.model, eng.fp32_params, jnp.asarray(x), args.out)
    print(f"# dumped {len(eng.model.layers)} layer goldens -> {args.out}")


def cmd_check_goldens(args):
    """E1: run the configured mode and diff per-layer outputs vs goldens."""
    from dnn_inference_engine_tpu.eval.golden import (
        compare_goldens, load_goldens, quant_error_report)
    import jax.numpy as jnp
    eng = _build_engine(args)
    goldens = load_goldens(args.goldens)
    z = np.load(args.goldens)
    x = jnp.asarray(z["input"])
    _, outs = eng.model.forward(
        eng.params, x, mode=eng.config.mode, act_scales=eng.act_scales,
        capture_outputs=True)
    if eng.config.mode == "fp32":
        report = compare_goldens(outs, goldens, rtol=1e-4, atol=1e-4)
        print("# exact comparison passed; per-layer max abs diff:")
        for li, d in report.items():
            print(f"  layer{li:3d}: {d:.3e}")
    else:
        report = quant_error_report(outs, goldens)
        worst = max(report.values())
        print(f"# quantization path vs FP32 goldens (relative RMS/layer), "
              f"worst {worst:.4f}:")
        for li, d in report.items():
            print(f"  layer{li:3d}: {d:.4f}")
        if worst > args.tol:
            print(f"# FAIL: worst layer error {worst:.4f} > tol {args.tol}")
            return 1
    return 0


def cmd_plan_sweep(args):
    """Measure each conv layer's legal plan kinds and emit the fastest
    strategy as JSON (SURVEY.md section 2.1; consumed via --strategy)."""
    from dnn_inference_engine_tpu.runtime.plan_sweep import sweep
    iters = tuple(int(v) for v in args.iters.split(","))
    art = sweep(model_name=args.model, mode=args.mode, batch=args.batch,
                input_size=args.input_size, quick=args.quick,
                iters=iters, reps=args.reps, weights=args.weights,
                calib=getattr(args, "calib_images", None))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(art, f, indent=2)
        print(f"# wrote {args.out}")
    print(json.dumps({k: art[k] for k in
                      ("model", "mode", "batch", "input_size", "backend",
                       "whole_net_ms", "images_per_s", "strategy")}))


def cmd_trace(args):
    """xplane-trace the production forward and print per-stage DEVICE
    time (runtime/profiling.trace_attribution; see
    docs/FRONTEND_FLOORS.md for the methodology)."""
    import jax
    import jax.numpy as jnp

    from dnn_inference_engine_tpu.runtime.plan import plan_input_uint8_ok
    from dnn_inference_engine_tpu.runtime.profiling import trace_attribution
    eng = _build_engine(args)
    rng = np.random.default_rng(0)
    size = eng.config.input_size
    xf = rng.uniform(0, 1, (args.batch, size, size, 3)).astype(np.float32)
    if (eng.config.mode == "w8a8" and eng._plan is not None
            and plan_input_uint8_ok(eng._plan)):
        x = jnp.asarray(np.clip(np.round(xf * 255), 0, 255), np.uint8)
    else:
        x = jnp.asarray(xf)
    fn = eng.detect_fn() if args.detect else jax.jit(eng._fwd)
    art = trace_attribution(fn, eng.exec_params, x, runs=args.runs)
    print(f"# module device time {art['module_device_us_per_run']:.1f} us"
          f" over {art['runs_traced']} runs; ops sum "
          f"{art['sum_of_ops_us_per_run']:.1f} us")
    for k, v in art["by_scope_us"].items():
        print(f"{v:10.2f} us  {k}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"# wrote {args.out}")


def cmd_calibrate(args):
    from dnn_inference_engine_tpu.preprocess import load_calib_images
    eng = _build_engine(args)
    imgs = load_calib_images(args.images, eng.config.input_size,
                             limit=args.limit)
    eng.act_scales = None
    eng.prepare(calib_images=imgs)
    eng.save(args.out)
    print(f"# calibrated on {len(imgs)} images -> {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("detect", help="run detection on one image")
    _add_common(p)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default=None, help="write annotated image here")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("bench", help="throughput/latency benchmark")
    _add_common(p)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("layer-times", help="per-layer timing report (E2)")
    _add_common(p)
    p.add_argument("--iters", default=None, metavar="HI,LO",
                   help="fixed loop-difference counts (quick but noisy); "
                        "default auto-scales per stage for roofline-grade "
                        "fidelity")
    p.set_defaults(fn=cmd_layer_times)

    p = sub.add_parser("eval", help="VOC mAP evaluation")
    _add_common(p)
    p.add_argument("--voc-dir", required=True)
    p.add_argument("--split", default="2007_test")
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("serve", help="continuous-batching server")
    _add_common(p)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total server processes (one per host)")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("dump-goldens",
                       help="dump FP32 per-layer golden tensors (E1)")
    _add_common(p)
    p.add_argument("--image", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_dump_goldens)

    p = sub.add_parser("check-goldens",
                       help="diff the current mode's layers vs goldens (E1)")
    _add_common(p)
    p.add_argument("--goldens", required=True)
    p.add_argument("--tol", type=float, default=0.15,
                   help="max per-layer relative RMS for quantized modes")
    p.set_defaults(fn=cmd_check_goldens)

    p = sub.add_parser("plan-sweep",
                       help="measure per-layer kernel strategies, emit "
                            "the fastest as JSON (SURVEY.md 2.1)")
    _add_common(p)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--out", default=None, help="write the artifact here")
    p.add_argument("--quick", action="store_true",
                   help="skip the long-shot candidates (gemm tier, "
                        "unpadded folds, rs kinds)")
    p.add_argument("--iters", default="60,10", metavar="HI,LO",
                   help="loop-difference iteration counts per candidate")
    p.add_argument("--reps", type=int, default=3)
    p.set_defaults(fn=cmd_plan_sweep)

    p = sub.add_parser("trace",
                       help="xplane trace attribution: per-stage device "
                            "time of the production forward")
    _add_common(p)
    p.add_argument("--runs", type=int, default=30)
    p.add_argument("--detect", action="store_true",
                   help="trace the FULL detect program (forward + decode "
                        "+ NMS) instead of the forward; postprocess "
                        "phases appear as post_decode / nms_* scopes")
    p.add_argument("--out", default=None, metavar="JSON")
    p.set_defaults(fn=cmd_trace)

    p = sub.add_parser("calibrate", help="calibrate activation scales")
    _add_common(p)
    p.add_argument("--images", required=True)
    p.add_argument("--limit", type=int, default=64)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_calibrate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
