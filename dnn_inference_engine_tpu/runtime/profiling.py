"""Tracing/profiling (SURVEY.md section 5).

The reference prints per-layer wall-clock timings from the driver (E2).
Here the equivalents are:

- Engine.layer_times(): honest steady-state per-layer device timings
  (runtime/engine.py, loop-difference method);
- trace(): a jax.profiler xplane trace around any callable, viewable in
  TensorBoard / xprof — kernel-level visibility into the fused pipeline;
- named scopes: model forwards annotate each layer with jax.named_scope
  so traces and HLO dumps attribute ops to layers;
- debug_checks(): jax_debug_nans/jax_debug_infs toggles for CI runs
  (the engine is inference-only; XLA is data-race-free by construction,
  so there is no device-side race detection to run — SURVEY.md sec. 5).
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional

import jax


def trace(out_dir: str, fn: Callable, *args, **kw):
    """Run ``fn(*args)`` under a profiler trace; returns fn's result.

    View with: tensorboard --logdir <out_dir>  (or xprof).
    """
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        out = fn(*args, **kw)
        jax.tree_util.tree_map(
            lambda t: t.block_until_ready() if hasattr(t, "block_until_ready")
            else t, out)
    return out


@contextlib.contextmanager
def debug_checks(nans: bool = True, infs: bool = False):
    """Enable NaN/Inf checking inside the context (CI numerics guard)."""
    old_nan = jax.config.jax_debug_nans
    old_inf = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nan)
        jax.config.update("jax_debug_infs", old_inf)


def layer_scope(li: int, layer) -> "contextlib.AbstractContextManager":
    """Named scope labeling ops of one layer in traces/HLO."""
    return jax.named_scope(f"L{li}_{type(layer).__name__.lower()}")


# ---------------------------------------------------------------------------
# xplane trace attribution (round-4: replaces the prefix-difference gap
# attribution, whose numbers did not add up — docs/FRONTEND_FLOORS.md)
# ---------------------------------------------------------------------------

import re  # noqa: E402

_STAGE_RE = re.compile(
    r"(stage\d+_[a-z0-9_]+?_L\d+(?:_fold\d+)?"
    r"|post_decode|nms_candidates|nms_suppress|nms_merge)")
# the type between '=' and the opcode may be a TUPLE containing spaces
# and nested parens — '(f32[...]{...:T(8,128)S(1)}, f32[...])' — so
# scan non-greedily to the first space-preceded lowercase token before
# a '(' (HLO opcodes are lowercase; tile/space tags T(/S( are not
# space-preceded). Round-5 fix: tuple-typed fusions (e.g. the decode)
# were silently landing in unattributed/?.
_NAME_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*.*?\s([a-z][\w\-]*)\(")
_OPNAME_RE = re.compile(r"op_name=\"([^\"]*)\"")


def hlo_scope_map(hlo_text: str):
    """HLO instruction name -> (hlo kind, per-stage scope or None,
    op_name). Scopes are plan.py's ``stageN_<kind>_L<li>`` named scopes,
    carried by HLO metadata op_name."""
    out = {}
    for line in hlo_text.splitlines():
        m = _NAME_RE.match(line)
        if not m:
            continue
        om = _OPNAME_RE.search(line)
        op_name = om.group(1) if om else ""
        sm = _STAGE_RE.search(op_name)
        # first definition wins (the entry computation lists executed ops)
        out.setdefault(m.group(1),
                       (m.group(2), sm.group(1) if sm else None, op_name))
    return out


def trace_attribution(fwd_jitted, params, x, runs: int = 30) -> dict:
    """Per-op / per-scope DEVICE time of a jitted forward.

    Compiles ``fwd_jitted`` (keeping the HLO for scope mapping), runs
    ``runs`` dispatches under ``jax.profiler.trace``, parses the xplane
    proto (tensorflow.tsl.profiler.protobuf, an optional dependency —
    raises ImportError with remediation if TF is absent) and aggregates
    per-run device microseconds by stage scope. The by_scope table sums
    to the XLA-Ops total; device-side timestamps make it immune to the
    relay/RTT distortion that sank prefix-difference timing.
    """
    import collections
    import glob
    import tempfile

    import numpy as np

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:                      # pragma: no cover
        raise ImportError(
            "trace_attribution parses xplane protos via tensorflow's "
            "bundled schema; install tensorflow or use "
            "profiling.trace() + tensorboard instead") from e

    compiled = fwd_jitted.lower(params, x).compile()
    scope_map = hlo_scope_map(compiled.as_text())
    np.asarray(jax.tree_util.tree_leaves(fwd_jitted(params, x))[0]
               .ravel()[0])                       # warm: same executable

    out_dir = tempfile.mkdtemp(prefix="trace_attrib_")
    with jax.profiler.trace(out_dir):
        outs = [fwd_jitted(params, x) for _ in range(runs)]
        for o in outs:
            jax.tree_util.tree_map(lambda t: t.block_until_ready(), o)

    files = sorted(glob.glob(out_dir + "/**/*.xplane.pb", recursive=True))
    assert files, f"no xplane written under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:")]
    if not planes:
        raise RuntimeError(
            "trace_attribution needs an accelerator device plane; the "
            f"trace only has {[p.name for p in xs.planes]} (CPU backends "
            "emit host planes without per-op XLA timing) — run on TPU")
    p = planes[0]
    em = p.event_metadata

    mod_line = next(ln for ln in p.lines if ln.name == "XLA Modules")
    mod_us = sorted(ev.duration_ps / 1e6 for ev in mod_line.events)
    n_mod = max(len(mod_us), 1)
    module_us = mod_us[n_mod // 2] if mod_us else 0.0

    ops_line = next(ln for ln in p.lines if ln.name == "XLA Ops")
    per_op = collections.Counter()
    for ev in ops_line.events:
        name = em[ev.metadata_id].name.split(" = ")[0].lstrip("%")
        per_op[name] += ev.duration_ps / 1e6

    by_scope = collections.Counter()
    rows = []
    for name, us_total in per_op.items():
        us = us_total / n_mod
        kind, scope, op_name = scope_map.get(name, ("?", None, ""))
        by_scope[scope or f"unattributed/{kind}"] += us
        rows.append({"op": name, "us": round(us, 2), "hlo_kind": kind,
                     "scope": scope, "op_name": op_name[:160]})
    rows.sort(key=lambda r: -r["us"])
    return {
        "runs_traced": n_mod,
        "module_device_us_per_run": round(module_us, 2),
        "sum_of_ops_us_per_run": round(sum(by_scope.values()), 2),
        "by_scope_us": {k: round(v, 2) for k, v in by_scope.most_common()},
        "top_ops": rows[:40],
    }
