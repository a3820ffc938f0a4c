"""Honest device timing (reference E2 timing report, SURVEY.md section 2.8).

Two environment hazards make naive timing lie here:
1. ``block_until_ready`` may return before execution finishes when the
   device is driven through a relay (observed on the axon v5e tunnel:
   8192^3 matmuls "finishing" in 40us).
2. A host fetch costs a full relay round trip (~25ms observed), dwarfing
   sub-ms kernels.

``per_iter_time`` therefore measures steady-state kernel time as a
difference of two single-executable ``lax.fori_loop`` runs with different
static trip counts, each chained (iteration i+1's input depends on
iteration i's output, via a scalar write into the input) so XLA can
neither hoist the body nor overlap iterations, and each synced by an
actual host scalar fetch. Constant overheads (dispatch, RTT, fetch)
cancel in the subtraction.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _chained_loop(fn: Callable, n_iters: int):
    """Build jit(loop) running ``fn(*args)`` n_iters times, serialized."""

    @jax.jit
    def loop(*args):
        def body(_i, carry):
            out = fn(*carry)
            first = jax.tree_util.tree_leaves(out)[0]
            scalar = first.reshape(-1)[0]
            a0 = carry[0]
            idx = (0,) * a0.ndim
            a0 = a0.at[idx].set(scalar.astype(a0.dtype))
            return (a0,) + tuple(carry[1:])
        final = jax.lax.fori_loop(0, n_iters, body, tuple(args))
        return final[0].reshape(-1)[0]

    return loop


def per_iter_time_stats(fn: Callable, args: Sequence, iters_hi: int = 0,
                        iters_lo: int = 0, reps: int = 3,
                        target_delta_s: float = 0.12,
                        max_iters: int = 2000) -> dict:
    """Steady-state seconds per invocation of ``fn(*args)``, with spread.

    When iteration counts are not given, auto-scales them so the timed
    loop-count difference is ~``target_delta_s`` of device work — keeps
    the measurement well above the multi-ms relay-RTT noise floor for
    us-scale kernels. Returns::

        {"min": s, "median": s, "spread_pct": 100*(max-min)/min,
         "iters": (hi, lo), "delta_work_s": min * (hi - lo)}

    ``delta_work_s`` is the amount of device work the subtraction
    resolved; when it is small relative to the relay RTT (~25 ms
    observed) the ratio min/median utilization numbers derived from this
    measurement are unreliable — callers should mark, not trust, them.
    """
    if not iters_hi:
        # two-point probe so constant overhead (RTT, dispatch) cancels
        p_lo, p_hi = _chained_loop(fn, 5), _chained_loop(fn, 105)
        np.asarray(p_lo(*args))                     # compile + first claim
        np.asarray(p_hi(*args))
        t0 = time.perf_counter(); np.asarray(p_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(p_hi(*args))
        t_hi = time.perf_counter() - t0
        est = max((t_hi - t_lo) / 100, 2e-7)
        delta_iters = int(min(max(100, target_delta_s / est), max_iters))
        iters_lo = max(delta_iters // 10, 2)
        iters_hi = iters_lo + delta_iters
    lo = _chained_loop(fn, iters_lo)
    hi = _chained_loop(fn, iters_hi)
    # warm both executables (compile + first claim)
    np.asarray(lo(*args))
    np.asarray(hi(*args))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(hi(*args))
        t_hi = time.perf_counter() - t0
        deltas.append((t_hi - t_lo) / (iters_hi - iters_lo))
    t_min = float(max(np.min(deltas), 1e-12))
    return {
        "min": t_min,
        "median": float(np.median(deltas)),
        "spread_pct": float(100.0 * (np.max(deltas) - t_min) / t_min),
        "iters": (iters_hi, iters_lo),
        "delta_work_s": t_min * (iters_hi - iters_lo),
    }


def per_iter_time(fn: Callable, args: Sequence, iters_hi: int = 0,
                  iters_lo: int = 0, reps: int = 3,
                  target_delta_s: float = 0.12, max_iters: int = 2000,
                  stat: str = "median") -> float:
    """Median (or min) steady-state seconds per invocation of ``fn``.

    'min' approximates uncontended kernel speed on a shared device pool.
    """
    s = per_iter_time_stats(fn, args, iters_hi=iters_hi, iters_lo=iters_lo,
                            reps=reps, target_delta_s=target_delta_s,
                            max_iters=max_iters)
    return s["min"] if stat == "min" else s["median"]


def wall_time(fn: Callable, args: Sequence, reps: int = 5) -> float:
    """Median wall-clock of one call incl. dispatch + host sync (latency
    metric — what a single-image client experiences)."""
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].reshape(-1)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


V5E_INT8_TOPS = 394.7e12   # per-chip peak (BASELINE.md)
V5E_BF16_FLOPS = 197.0e12
V5E_HBM_BPS = 819.0e9


def roofline_pct(flops: float, seconds: float,
                 peak: float = V5E_INT8_TOPS) -> float:
    return 100.0 * flops / seconds / peak


def binding_bound_s(flops: float, hbm_bytes: float,
                    peak_flops: float = V5E_INT8_TOPS,
                    hbm_bps: float = V5E_HBM_BPS):
    """(bound_seconds, "mxu"|"hbm"): the larger of the compute floor and
    the bandwidth floor — the BINDING roofline for an op that must
    execute ``flops`` ops and move at least ``hbm_bytes`` through HBM.
    ``pct_of_binding = bound / measured`` is auditable against 100% for
    every stage, unlike plain MFU which only makes sense for MXU-bound
    stages (round-3 verdict weak #6)."""
    t_mxu = flops / peak_flops
    t_hbm = hbm_bytes / hbm_bps
    return (t_mxu, "mxu") if t_mxu >= t_hbm else (t_hbm, "hbm")
