"""Round benchmark: YOLOv2-tiny W8A8 batch-32 images/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s/chip", "vs_baseline": N}

``vs_baseline``: speedup over the FP32 XLA path at the same batch — the
reference publishes no numbers (BASELINE.json published == {}), so the
in-repo FP32 golden model is the baseline, mirroring how the reference
coursework compared optimized kernels against its PR1 FP32 model.

Timing uses the loop-difference method (runtime/benchlib.py) because
block_until_ready is unreliable through the axon device relay.
"""

from __future__ import annotations

import json
import sys


def run_bench(model: str = "yolov2-tiny", mode: str = "w8a8",
              kernel: str = "auto", batch: int = 32,
              baseline_mode: str = "fp32", verbose: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time, wall_time
    from dnn_inference_engine_tpu.runtime.engine import Engine

    def log(*a):
        if verbose:
            print(*a, file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)

    def build(m):
        cfg = EngineConfig(model=model, mode=m, kernel=kernel, batch=batch)
        return Engine(cfg).load_weights(key=jax.random.PRNGKey(0)).prepare()

    eng = build(mode)
    x = jnp.asarray(rng.uniform(0, 1, (batch, eng.config.input_size,
                                       eng.config.input_size, 3)), jnp.float32)
    if mode != "fp32":
        # quantized engines consume the uint8 serving wire format (4x
        # less host->device transfer; the fused input stage normalizes
        # in-kernel — bit-exact vs the f32 path, tested)
        x = jnp.asarray(np.clip(np.round(np.asarray(x) * 255), 0, 255),
                        jnp.uint8)

    fwd = lambda xx: eng._fwd(eng.exec_params, xx)
    log(f"timing {model} {mode} kernel={kernel} batch={batch} on",
        jax.default_backend())
    t = per_iter_time(fwd, (x,), iters_hi=60, iters_lo=10)
    imgs_per_s = batch / t
    log(f"{mode}: {t*1e3:.3f} ms/batch -> {imgs_per_s:.0f} images/s")

    # p50 single-image latency (full detect incl. decode+NMS + host sync;
    # uint8 wire format — what the serving path ships). Decomposed so
    # regressions are attributable: the DEVICE time of the same program
    # (loop-difference, overheads cancel) is reported alongside the wall
    # time; their gap is dispatch + host<->device transport (the relay
    # round trip in this sandbox, PCIe/gRPC in production).
    cfg1 = EngineConfig(model=model, mode=mode, kernel=kernel, batch=1)
    eng1 = Engine(cfg1).load_weights(key=jax.random.PRNGKey(0)).prepare()
    x1 = jnp.asarray(np.clip(np.asarray(x[:1]) * 255, 0, 255), jnp.uint8)
    det = eng1.detect_fn()
    t_lat = wall_time(lambda xx: det(eng1.exec_params, xx), (x1,))
    # AUTO-scaled loop counts: fixed (40,8) resolve only ~32x the
    # per-iteration time — at batch-1 scale that is inside the relay-RTT
    # noise floor and min-of-reps then under-reports (the round-4 sweep
    # bug class); the auto-scaler resolves ~120 ms of device work
    t_dev = per_iter_time(lambda xx: det(eng1.exec_params, xx), (x1,))
    log(f"p50 single-image detect latency: {t_lat*1e3:.2f} ms wall "
        f"({t_dev*1e3:.2f} ms device; gap = dispatch + transport RTT)")

    # baseline: fp32 XLA forward, same batch
    engb = build(baseline_mode)
    fwdb = lambda xx: engb._fwd(engb.exec_params, xx)
    tb = per_iter_time(fwdb, (x,), iters_hi=60, iters_lo=10)
    log(f"{baseline_mode} baseline: {tb*1e3:.3f} ms/batch -> "
        f"{batch/tb:.0f} images/s")

    return {
        "metric": f"{model} {mode.upper()} images/sec/chip (batch {batch})",
        "value": round(imgs_per_s, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(t and tb / t, 3),
        "detail": {
            "ms_per_batch": round(t * 1e3, 3),
            "p50_single_image_ms": round(t_lat * 1e3, 2),
            "single_image_device_ms": round(t_dev * 1e3, 3),
            "fp32_images_per_s": round(batch / tb, 1),
            # the fp32 baseline requests HIGHEST matmul precision (true
            # f32 semantics — the TPU default multiplies f32 in bf16,
            # which is wrong for a golden reference). That is ~2x slower
            # than the bf16-mantissa default, so vs_baseline grew
            # accordingly in round 2; compare absolute img/s across
            # rounds, not the ratio.
            "fp32_precision": "HIGHEST",
            "kernel": kernel,
            "backend": jax.default_backend(),
        },
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov2-tiny")
    ap.add_argument("--mode", default="w8a8")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    result = run_bench(model=args.model, mode=args.mode, kernel=args.kernel,
                       batch=args.batch, verbose=args.verbose)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
