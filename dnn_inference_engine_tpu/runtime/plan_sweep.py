"""Measured per-layer kernel strategy generation (SURVEY.md section 2.1:
"measured-fastest per-layer strategy" as a repeatable CAPABILITY).

The hand-written tables in ``runtime/plan.py`` (``_YOLOV2_STRATEGY`` et
al.) were produced by whole-net min-of-reps A/B on one (device, batch,
input-size) point; a new model or resolution silently fell back to
defaults. This module ships that A/B machinery as a tool:

    python -m dnn_inference_engine_tpu.cli plan-sweep \
        --model yolov2-tiny --mode w8a8 --batch 32 --out strategy.json

It greedily coordinate-descends over the conv layers: starting from the
all-XLA plan, each layer tries every LEGAL kind (fold variants only
where a 2x2/s2 pool follows and nothing routes from the pre-pool
output; the one-kernel stem only at a 3-channel f=4 entry), keeps the
whole-net-fastest, and records every measurement. Candidates whose
plan fails to build/compile are recorded as ``null``; candidates whose
output diverges from the all-XLA reference head are rejected (a fast
wrong kernel must never win the sweep).

``EngineConfig.strategy`` (a path to the emitted JSON) makes
``Engine.prepare`` consume the result instead of the hand table.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dnn_inference_engine_tpu.models.layers import Conv, MaxPool

StrategyEntry = Tuple  # (kind, fold) or (kind, fold, opts)
Strategy = Dict[int, StrategyEntry]


def load_strategy(path: str) -> Strategy:
    """Read a strategy mapping from a sweep artifact (or a bare
    ``{li: [kind, fold, opts?]}`` JSON object)."""
    with open(path) as f:
        d = json.load(f)
    raw = d.get("strategy", d)
    out: Strategy = {}
    for k, v in raw.items():
        kind, fold = v[0], int(v[1])
        opts = v[2] if len(v) > 2 else {}
        out[int(k)] = (kind, fold, opts) if opts else (kind, fold)
    return out


def _strategy_jsonable(strategy: Strategy) -> Dict[str, list]:
    return {str(k): list(v) for k, v in sorted(strategy.items())}


def _cand_name(c: StrategyEntry) -> str:
    kind, fold = c[0], c[1]
    opts = c[2] if len(c) > 2 else {}
    s = f"{kind}:{fold}"
    if opts:
        s += ":" + ",".join(f"{k}={v}" for k, v in sorted(opts.items()))
    return s


def candidate_entries(model, li: int, mode: str,
                      quick: bool = False) -> List[StrategyEntry]:
    """Legal strategy entries for conv layer ``li``.

    Mirrors ``runtime.plan.build_plan``'s constraints: folds need the
    following 2x2/s2 MaxPool and an unreferenced pre-pool output; the
    fused stem (stem_rs) and f=4 entry folds need the 3-channel network
    input; the int8 Pallas kinds (rs/rs2/stem_rs) have no w8 variant.
    """
    from dnn_inference_engine_tpu.runtime.plan import _referenced_layers
    layers = model.layers
    layer = layers[li]
    assert isinstance(layer, Conv), li
    cands: List[StrategyEntry] = [("xla", 1)]
    int8_ok = mode == "w8a8"
    plain = layer.ksize == 3 and layer.stride == 1 and layer.padding == "SAME"
    if not quick:
        cands.append(("gemm", 1))
    nxt = li + 1
    pooled = (nxt < len(layers) and isinstance(layers[nxt], MaxPool)
              and layers[nxt].stride == 2 and layers[nxt].size == 2)
    if pooled and li not in _referenced_layers(model) and plain:
        first = li == 0 and model.in_ch == 3
        if first:
            # entry folds: f=4 absorbs the first pool at 1/4 resolution
            cands += [("fold_xla_k2", 4, {"cin_pad": 64}),
                      ("fold_xla", 4, {"cin_pad": 64})]
            if int8_ok:
                cands.append(("stem_rs", 4, {"cin_pad": 64}))
                cands.append(("stem_dg", 4))
            if not quick:
                cands.append(("fold_xla_k2", 4))
        else:
            cands += [("fold_xla", 2), ("fold_xla_k2", 2)]
            if int8_ok:
                # legal only when the NEXT conv runs fold_xla_k2 f=2
                # (build_plan rejects other chains) — discoverable on
                # the second greedy pass once that layer has settled
                cands.append(("fold_xla_s2", 2))
            if int8_ok and not quick:
                cands += [("rs", 2), ("rs2", 2)]
    return cands


def _conv_indices(model) -> List[int]:
    return [li for li, l in enumerate(model.layers) if isinstance(l, Conv)]


class _SweepContext:
    """One quantized model + input batch, shared across all candidate
    plans (calibration runs once)."""

    def __init__(self, model_name: str, mode: str, batch: int,
                 input_size: Optional[int], seed: int = 0,
                 weights: Optional[str] = None,
                 calib: Optional[str] = None):
        import jax
        import jax.numpy as jnp
        from dnn_inference_engine_tpu.config import EngineConfig
        from dnn_inference_engine_tpu.runtime.engine import Engine
        kw = dict(model=model_name, mode=mode, kernel="xla", batch=batch,
                  weights=weights, calib=calib)
        if input_size:
            kw["input_size"] = input_size
        # kernel="xla" skips plan construction; we build candidate plans
        # ourselves from the same quantized params + scales
        self.eng = Engine(EngineConfig(**kw)).load_weights(
            key=jax.random.PRNGKey(0)).prepare()
        self.model = self.eng.model
        self.mode = mode
        self.batch = batch
        s = self.eng.config.input_size
        rng = np.random.default_rng(seed)
        xf = rng.uniform(0, 1, (batch, s, s, 3)).astype(np.float32)
        self.x_f32 = jnp.asarray(xf)
        self.x_u8 = jnp.asarray(np.clip(np.round(xf * 255), 0, 255),
                                np.uint8)
        self.ref_head = None        # all-XLA plan output, parity anchor

    def build(self, strategy: Strategy):
        """(jitted forward, params, input) for a candidate strategy, or
        None when the plan is unbuildable."""
        import jax
        from dnn_inference_engine_tpu.runtime.plan import (
            build_plan, plan_forward_w8, plan_forward_w8a8,
            plan_input_uint8_ok, prepare_plan_params)
        plan = build_plan(self.model, strategy)
        if plan is None:
            return None
        if self.mode == "w8" and any(st.kind in ("rs", "s0")
                                     for st in plan):
            return None
        pp = prepare_plan_params(self.model, self.eng.params, plan)
        if self.mode == "w8":
            fwd = jax.jit(lambda params, xx: plan_forward_w8(
                self.model, plan, params, xx))
        else:
            scales = self.eng.act_scales
            fwd = jax.jit(lambda params, xx: plan_forward_w8a8(
                self.model, plan, params, scales, xx))
        x = (self.x_u8 if self.mode == "w8a8"
             and plan_input_uint8_ok(plan) else self.x_f32)
        return fwd, pp, x

    @staticmethod
    def _flat(heads) -> np.ndarray:
        if isinstance(heads, (tuple, list)):
            return np.concatenate([np.asarray(h).ravel() for h in heads])
        return np.asarray(heads).ravel()

    def check_parity(self, heads, tol: float = 0.06) -> Optional[float]:
        """Rel RMS vs the all-XLA reference head; None if beyond tol.

        The u8 wire entry stages quantize layer 0's input at the exact
        1/255 scale vs the reference's calibrated scale, so small
        nonzero RMS is expected; anything past quantization-grade
        divergence disqualifies the candidate.
        """
        got = self._flat(heads)
        if self.ref_head is None:
            return 0.0
        ref = self.ref_head
        rms = float(np.sqrt(np.mean((got - ref) ** 2))
                    / (np.sqrt(np.mean(ref ** 2)) + 1e-12))
        return rms if rms < tol else None

    def measure(self, strategy: Strategy,
                iters: Tuple[int, int] = (60, 10), reps: int = 3,
                ) -> Tuple[Optional[float], Optional[float], Optional[str]]:
        """(whole-net seconds/batch, parity rel RMS, error) for a
        candidate. Error strings distinguish the failure classes so a
        crashing production kernel is never silently indistinguishable
        from an illegal candidate in the artifact (a sweep that records
        null for both would emit an all-XLA strategy on a kernel
        regression without anyone noticing):

          (None, None, None)            plan unbuildable (illegal entry)
          (None, rms, "PARITY...")      compiled but diverged: rejected
          (None, None, "CRASHED: ...")  raised while compiling/running
        """
        from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
        built = self.build(strategy)
        if built is None:
            return None, None, None
        fwd, pp, x = built
        try:
            heads = fwd(pp, x)
            rms = self.check_parity(heads)
            if rms is None:                    # fast-but-wrong: reject
                return None, None, "PARITY: diverged from all-XLA head"
            t = per_iter_time(lambda xx: fwd(pp, xx), (x,),
                              iters_hi=iters[0], iters_lo=iters[1],
                              reps=reps, stat="min")
            return float(t), rms, None
        except Exception as e:                 # noqa: BLE001 — candidate
            return None, None, f"CRASHED: {repr(e)[:200]}"


def _iters_for(t_s: float, base: Tuple[int, int] = (60, 10),
               target_delta_s: float = 0.12,
               max_iters: int = 2000) -> Tuple[int, int]:
    """Iteration counts resolving ~``target_delta_s`` of device work at
    per-iteration time ``t_s`` — the same auto-scaling stage_times uses.
    Fixed (60, 10) counts resolve only 50*t of work: at batch 8 that is
    ~25 ms, INSIDE the relay-RTT noise floor, and min-of-reps then
    selects the most optimistic error — the round-4 b1/b8 sweeps first
    emitted physically impossible results (112k img/s, 2x above the MXU
    ceiling) exactly this way."""
    delta = int(min(max(base[0] - base[1],
                        target_delta_s / max(t_s, 1e-6)), max_iters))
    lo = max(delta // 10, base[1])
    return (lo + delta, lo)


def sweep(model_name: str = "yolov2-tiny", mode: str = "w8a8",
          batch: int = 32, input_size: Optional[int] = None,
          iters: Tuple[int, int] = (60, 10), reps: int = 3,
          quick: bool = False, verbose: bool = True,
          weights: Optional[str] = None,
          calib: Optional[str] = None,
          auto_iters: bool = True) -> Dict:
    """Greedy whole-net strategy sweep; returns the artifact dict.

    ``auto_iters`` scales each measurement's loop counts from the
    current best time (re-measuring any candidate that comes out
    suspiciously faster than the context it was scaled for), so every
    recorded number resolves ~120 ms of device work regardless of
    batch size; ``iters`` is the floor."""
    import jax
    if mode not in ("w8", "w8a8"):
        raise ValueError(
            f"plan-sweep measures the fused quantized plans; mode={mode!r} "
            "has no plan (use --mode w8a8 or w8)")

    def log(*a):
        if verbose:
            import sys
            print(*a, file=sys.stderr, flush=True)

    ctx = _SweepContext(model_name, mode, batch, input_size,
                        weights=weights, calib=calib)
    convs = _conv_indices(ctx.model)
    base: Strategy = {li: ("xla", 1) for li in convs}

    # parity anchor: the all-XLA plan's head(s)
    fwd, pp, x = ctx.build(base)
    ctx.ref_head = ctx._flat(fwd(pp, ctx.x_f32))

    measurements: Dict[str, Dict[str, object]] = {}
    crashed = 0
    best_t, _, err = ctx.measure(base, iters, reps)
    assert best_t is not None, f"all-XLA baseline plan failed to run: {err}"
    if auto_iters:
        # re-resolve the baseline at full delta-work before anything
        # is compared against it
        t2, _, _ = ctx.measure(base, _iters_for(best_t, iters), reps)
        if t2 is not None:
            best_t = t2
    log(f"[sweep] {model_name} {mode} batch={batch}: all-xla baseline "
        f"{best_t*1e3:.3f} ms/batch")
    # coordinate descent until stable (max 3 passes): chain-coupled
    # kinds (e.g. fold_xla_s2, legal only when the NEXT conv is
    # fold_xla_k2) are invalid on pass 1 but discoverable on pass 2
    # once the neighbor has settled; a single greedy pass froze them out
    passes = 0
    # rel_loss[(li, cand)] = candidate time / contemporaneous best when
    # it was last measured — context-RELATIVE, so later passes can skip
    # clear losers without mistaking "the whole net got faster since"
    # for "this candidate is worse" (absolute comparisons skip
    # everything once early passes improve the net a lot)
    rel_loss: Dict[Tuple, float] = {}
    for pass_no in range(3):
        passes += 1
        changed = False
        for li in convs:
            row: Dict[str, object] = measurements.get(str(li), {})
            row[_cand_name(base[li])] = round(best_t * 1e3, 4)
            for cand in candidate_entries(ctx.model, li, mode, quick=quick):
                if cand == base[li]:
                    continue
                if pass_no > 0 and rel_loss.get((li, _cand_name(cand)),
                                                0.0) > 1.15:
                    continue  # >15% worse than its contemporaneous
                              # best: don't pay a recompile to
                              # re-reject. Near-misses, illegal and
                              # crashed entries (no rel_loss recorded —
                              # default 0.0, never skipped) DO re-run:
                              # context/neighbors may have changed.
                trial = dict(base)
                trial[li] = cand
                it = _iters_for(best_t, iters) if auto_iters else iters
                t, rms, err = ctx.measure(trial, it, reps)
                if auto_iters and t is not None and t < best_t / 2:
                    # much faster than the time its counts were scaled
                    # for -> under-resolved; re-measure at its own scale
                    t2, rms2, _ = ctx.measure(trial, _iters_for(t, iters),
                                              reps)
                    if t2 is not None:
                        t, rms = t2, rms2
                # row: ms | "CRASHED: ..."/"PARITY..." | null (illegal)
                row[_cand_name(cand)] = (round(t * 1e3, 4)
                                         if t is not None else err)
                if t is not None:
                    rel_loss[(li, _cand_name(cand))] = t / min(best_t, t)
                if err is not None and err.startswith("CRASHED"):
                    crashed += 1
                    log(f"[sweep] WARNING L{li} {_cand_name(cand)}: {err}")
                if t is not None and t < best_t:
                    base, best_t = trial, t
                    changed = True
                log(f"[sweep] p{pass_no} L{li} {_cand_name(cand):24s} "
                    + ((err or "illegal") if t is None else
                       f"{t*1e3:.3f} ms (rms {rms:.4f})"))
            measurements[str(li)] = row
            log(f"[sweep] p{pass_no} L{li} -> {_cand_name(base[li])}  "
                f"(whole-net {best_t*1e3:.3f} ms)")
        if not changed:
            break
    if crashed:
        log(f"[sweep] WARNING: {crashed} candidate(s) CRASHED (recorded "
            "in measurements) — a production kernel may be broken")

    dev = jax.devices()[0]
    return {
        "model": model_name, "mode": mode, "batch": batch,
        "input_size": ctx.eng.config.input_size,
        "backend": jax.default_backend(),
        "device": getattr(dev, "device_kind", str(dev)),
        "whole_net_ms": round(best_t * 1e3, 4),
        "images_per_s": round(batch / best_t, 1),
        "strategy": _strategy_jsonable(base),
        "measurements": measurements,
        "crashed_candidates": crashed,
        "passes": passes,
        "note": "greedy coordinate descent, whole-net min-of-reps "
                "loop-difference timing"
                + (" with auto-scaled loop counts (~120 ms resolved "
                   "device work per measurement)" if auto_iters else "")
                + "; null = plan illegal/unbuildable; "
                "'CRASHED: ...' = raised while compiling/running; "
                "'PARITY...' = failed the parity check vs all-XLA",
    }
