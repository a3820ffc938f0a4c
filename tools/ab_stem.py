"""A/B stem_dg vs stem_rs on the real chip: standalone kernel + whole-net."""
# Committed A/B record (round 3): stem_rs 0.724/0.725 ms stage-0, whole-net
# 2.179-2.192 ms; stem_dg 0.762 ms, whole-net 2.220-2.253 ms (v5e, batch 32,
# uint8 wire, interleaved min-of-reps). stem_rs stays the default.
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
from dnn_inference_engine_tpu.runtime.engine import Engine
from dnn_inference_engine_tpu.runtime.plan import (
    build_plan, plan_forward_w8a8, prepare_plan_params, _YOLOV2_STRATEGY)

batch = 32
eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=batch)
             ).load_weights(key=jax.random.PRNGKey(0)).prepare()
rng = np.random.default_rng(0)
xu = jnp.asarray(rng.integers(0, 256, (batch, 416, 416, 3)), jnp.uint8)

results = {}
for kind in ("stem_rs", "stem_dg", "stem_rs", "stem_dg"):  # interleaved
    strat = dict(_YOLOV2_STRATEGY)
    strat[0] = (kind, 4, {"cin_pad": 64}) if kind == "stem_rs" else (kind, 4)
    plan = build_plan(eng.model, strat)
    pp = prepare_plan_params(eng.model, eng.params, plan)
    fwd = jax.jit(lambda p, x: plan_forward_w8a8(eng.model, plan, p, eng.act_scales, x))
    t = per_iter_time(lambda x: fwd(pp, x), (xu,), iters_hi=60, iters_lo=10,
                      reps=3, stat="min")
    results.setdefault(kind, []).append(t * 1e3)
    print(f"whole-net {kind}: {t*1e3:.3f} ms ({batch/t:.0f} img/s)", flush=True)

# standalone stage-0 A/B via stage_times on each variant
for kind in ("stem_rs", "stem_dg"):
    strat = dict(_YOLOV2_STRATEGY)
    strat[0] = (kind, 4, {"cin_pad": 64}) if kind == "stem_rs" else (kind, 4)
    e = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=batch)
               ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    e._plan = build_plan(e.model, strat)
    e._plan_params = prepare_plan_params(e.model, e.params, e._plan)
    rep = e.stage_times(batch=batch)
    r0 = rep[0]
    print(f"stage0 {kind}: {r0['ms']} ms, hw_util {r0['hw_util_pct']}%, "
          f"noise {r0['noise_pct']}%", flush=True)
print("RESULTS", {k: [round(v,3) for v in vs] for k, vs in results.items()})
