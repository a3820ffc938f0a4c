"""Whole-net xplane trace attribution: per-op / per-stage DEVICE time.

Round-3's prefix-difference gap attribution (tools/gap_attrib.py,
docs/GAP_ATTRIB.json) measured per-stage boundary overheads through the
relay and produced numbers that did not add up (negative overheads,
a +0.27 ms claim the shift_s2d2 A/B then disproved). This tool answers
the same question — where does the whole-net time beyond the stage-sum
go? — with device-side timestamps, which the relay cannot distort:

1. jit + compile the engine's production forward; keep the HLO text and
   map every instruction -> its jax named_scope (metadata op_name, which
   carries plan.py's ``stageN_<kind>_L<li>`` scopes);
2. run N dispatches under jax.profiler.trace and parse the xplane proto
   (tensorflow.tsl.profiler.protobuf) — every XLA-op event on the device
   plane carries its own device duration;
3. aggregate per-run device microseconds by stage scope; ops with no
   stage scope (input layout copies, parameter prefetch, inter-stage
   relayouts XLA placed outside any scope) are bucketed by HLO kind.

The per-scope table sums EXACTLY to the device-measured module time
(XLA Modules line), unlike GAP_ATTRIB's self-refuting decomposition.

Usage:
    python tools/trace_attrib.py [--model yolov2-tiny] [--batch 32]
        [--mode w8a8] [--runs 30] [--out docs/TRACE_ATTRIB_r04.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_RE = re.compile(r"(stage\d+_[a-z0-9_]+?_L\d+(?:_fold\d+)?)")
NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\(")
OPNAME_RE = re.compile(r"op_name=\"([^\"]*)\"")


def hlo_scope_map(hlo_text: str):
    """instruction name -> (hlo kind, scope label or None, op_name)."""
    out = {}
    for line in hlo_text.splitlines():
        m = NAME_RE.match(line)
        if not m:
            continue
        name, kind = m.group(1), m.group(2)
        om = OPNAME_RE.search(line)
        op_name = om.group(1) if om else ""
        scope = None
        sm = STAGE_RE.search(op_name)
        if sm:
            scope = sm.group(1)
        # first definition wins (fusion bodies redefine names inside
        # computations; the entry computation lists the executed ops)
        out.setdefault(name, (kind, scope, op_name))
    return out


def collect(model="yolov2-tiny", mode="w8a8", batch=32, runs=30,
            kernel="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.plan import plan_input_uint8_ok

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
    params = eng.exec_params
    fwd = jax.jit(eng._fwd)
    lowered = fwd.lower(params, x)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    scope_map = hlo_scope_map(hlo)

    # warm (the jit cache now holds the same executable)
    np.asarray(jax.tree_util.tree_leaves(fwd(params, x))[0].ravel()[0])

    out_dir = tempfile.mkdtemp(prefix="trace_attrib_")
    with jax.profiler.trace(out_dir):
        outs = [fwd(params, x) for _ in range(runs)]
        for o in outs:
            jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)

    files = sorted(glob.glob(out_dir + "/**/*.xplane.pb", recursive=True))
    assert files, f"no xplane written under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    assert planes, [p.name for p in xs.planes]
    p = planes[0]
    em = p.event_metadata

    mod_line = next(ln for ln in p.lines if ln.name == "XLA Modules")
    # per-run module device time: median over the traced dispatches
    mod_us = sorted(ev.duration_ps / 1e6 for ev in mod_line.events)
    n_mod = len(mod_us)
    module_us = mod_us[n_mod // 2] if mod_us else 0.0

    ops_line = next(ln for ln in p.lines if ln.name == "XLA Ops")
    per_op = collections.Counter()
    op_count = collections.Counter()
    for ev in ops_line.events:
        md = em[ev.metadata_id]
        name = md.name.split(" = ")[0].lstrip("%")
        per_op[name] += ev.duration_ps / 1e6
        op_count[name] += 1

    by_scope = collections.Counter()
    rows = []
    for name, us_total in per_op.items():
        us = us_total / n_mod
        kind, scope, op_name = scope_map.get(name, ("?", None, ""))
        label = scope or f"unattributed/{kind}"
        by_scope[label] += us
        rows.append({"op": name, "us": round(us, 2), "hlo_kind": kind,
                     "scope": scope, "op_name": op_name[:160]})
    rows.sort(key=lambda r: -r["us"])

    return {
        "model": model, "mode": mode, "batch": batch, "runs_traced": n_mod,
        "backend": jax.default_backend(),
        "module_device_us_per_run": round(module_us, 2),
        "sum_of_ops_us_per_run": round(sum(by_scope.values()), 2),
        "by_scope_us": {k: round(v, 2)
                        for k, v in by_scope.most_common()},
        "top_ops": rows[:40],
        "note": "device-side xplane timestamps; by_scope_us sums to the "
                "XLA-Ops total (module time additionally contains "
                "inter-op gaps/launch overheads). Scopes are plan.py's "
                "per-stage jax.named_scope labels via HLO metadata "
                "op_name; 'unattributed/<kind>' = ops XLA placed outside "
                "any stage scope (input layout copies, prefetch, "
                "boundary relayouts).",
    }


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
