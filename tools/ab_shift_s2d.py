"""A/B the one-pass Pallas shift-s2d(2) vs the XLA pad+s2d chain feeding
the chained fold_xla_k2 f=2 stage (yolov2 whole-net, v5e batch 32)."""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime import plan as planmod
from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time
from dnn_inference_engine_tpu.runtime.engine import Engine

batch = 32
eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=batch)
             ).load_weights(key=jax.random.PRNGKey(0)).prepare()
rng = np.random.default_rng(0)
xu = jnp.asarray(rng.integers(0, 256, (batch, 416, 416, 3)), jnp.uint8)

ref_out = None
results = {}
for use in (False, True, False, True):   # interleaved
    planmod.USE_SHIFT_S2D2_KERNEL = use
    fwd = jax.jit(lambda p, x: planmod.plan_forward_w8a8(
        eng.model, eng._plan, p, eng.act_scales, x))
    out = np.asarray(fwd(eng._plan_params, xu))
    if ref_out is None:
        ref_out = out
    else:
        np.testing.assert_array_equal(out, ref_out)   # exact relayout
    t = per_iter_time(lambda x: fwd(eng._plan_params, x), (xu,),
                      iters_hi=60, iters_lo=10, reps=3, stat="min")
    results.setdefault(use, []).append(t * 1e3)
    print(f"shift_s2d2_kernel={use}: {t*1e3:.3f} ms ({batch/t:.0f} img/s)",
          flush=True)
print("RESULTS", {k: [round(v, 3) for v in vs] for k, vs in results.items()})
