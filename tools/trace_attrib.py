"""Whole-net xplane trace attribution: per-op / per-stage DEVICE time.

Thin CLI wrapper around ``runtime.profiling.trace_attribution`` (the
engine-facing surface is ``python -m dnn_inference_engine_tpu.cli
trace``). Round-3's prefix-difference gap attribution
(tools/gap_attrib.py, docs/GAP_ATTRIB.json) measured per-stage boundary
overheads through the relay and produced numbers that did not add up
(negative overheads, a +0.27 ms claim the shift_s2d2 A/B disproved);
this answers the same question with device-side timestamps, and its
per-scope table sums to the device-measured module time. See
docs/FRONTEND_FLOORS.md for the round-4 findings built on it.

Usage:
    python tools/trace_attrib.py [--model yolov2-tiny] [--batch 32]
        [--mode w8a8] [--runs 30] [--out docs/TRACE_ATTRIB_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(model="yolov2-tiny", mode="w8a8", batch=32, runs=30,
            kernel="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.plan import plan_input_uint8_ok
    from dnn_inference_engine_tpu.runtime.profiling import trace_attribution

    eng = Engine(EngineConfig(model=model, mode=mode, kernel=kernel,
                              batch=batch)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    rng = np.random.default_rng(0)
    size = eng.config.input_size
    xf = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    if (mode == "w8a8" and eng._plan is not None
            and plan_input_uint8_ok(eng._plan)):
        x = jnp.asarray(np.clip(np.round(xf * 255), 0, 255), np.uint8)
    else:
        x = jnp.asarray(xf)
    art = trace_attribution(jax.jit(eng._fwd), eng.exec_params, x,
                            runs=runs)
    art.update({"model": model, "mode": mode, "batch": batch,
                "backend": jax.default_backend(),
                "note": "device-side xplane timestamps; by_scope_us sums "
                        "to the XLA-Ops total. Scopes are plan.py's "
                        "per-stage jax.named_scope labels via HLO "
                        "metadata op_name; 'unattributed/<kind>' = ops "
                        "XLA placed outside any stage scope (input "
                        "layout copies, prefetch, boundary relayouts)."})
    return art


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov2-tiny")
    ap.add_argument("--mode", default="w8a8")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    art = collect(model=args.model, mode=args.mode, batch=args.batch,
                  runs=args.runs)
    print(f"module device time: {art['module_device_us_per_run']:.1f} us; "
          f"sum of ops: {art['sum_of_ops_us_per_run']:.1f} us")
    for k, v in art["by_scope_us"].items():
        print(f"  {v:9.2f} us  {k}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
