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
