"""Timing-harness unit tests (runtime/benchlib.py): the loop-difference
measurement must recover a known per-iteration cost."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.runtime.benchlib import (
    per_iter_time, roofline_pct, wall_time,
)


def test_per_iter_time_positive_and_finite(rng):
    a = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    f = lambda x, y: x @ y
    t = per_iter_time(f, (a, b), iters_hi=50, iters_lo=10, reps=3)
    assert np.isfinite(t)
    # a 256^2 matmul on CPU takes > 1us and < 50ms
    assert 1e-7 < abs(t) < 0.05


import pytest

# The two loop-scaling probes below validate the HARNESS LOGIC (loop
# difference cancels overheads; the chained dependency forces
# per-iteration execution) — platform-independent properties fully
# covered on CPU. Through the axon TPU relay the bare-matmul probe is
# not a usable signal (a 40-iter 4096^2 chain measures the same wall
# time as 10 iters: the 67 MB result transfer dominates and the relay
# pipelines dispatch), while the real whole-model benches remain
# self-consistent. Keep these CPU-only rather than asserting on noise.
_tpu_relay = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="bare-matmul timing probe is relay-noise-dominated on TPU; "
           "harness logic is covered on CPU")


@_tpu_relay
def test_per_iter_time_scales_with_work(rng):
    d = 1024
    a1 = jnp.asarray(rng.standard_normal((d // 8, d // 8)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
    f = lambda x: x @ x
    t1 = per_iter_time(f, (a1,), iters_hi=60, iters_lo=10, reps=3)
    t2 = per_iter_time(f, (a2,), iters_hi=60, iters_lo=10, reps=3)
    # 512x the FLOPs: must measure at least ~10x slower
    assert t2 > 5 * abs(t1), (t1, t2)


@_tpu_relay
def test_chained_loop_prevents_hoisting(rng):
    """The chained dependency must force per-iteration execution: doubling
    the iteration count roughly doubles wall time."""
    import time
    from dnn_inference_engine_tpu.runtime.benchlib import _chained_loop
    d = 1024
    a = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
    f = lambda x: x @ x
    lo, hi = _chained_loop(f, 10), _chained_loop(f, 40)
    np.asarray(lo(a)); np.asarray(hi(a))
    t0 = time.perf_counter(); np.asarray(lo(a)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(hi(a)); th = time.perf_counter() - t0
    assert th > 1.8 * tl, (tl, th)


def test_per_iter_time_stats_fields(rng):
    from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time_stats
    a = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    s = per_iter_time_stats(lambda x: x @ x, (a,), iters_hi=30, iters_lo=6,
                            reps=3)
    assert s["min"] > 0
    assert s["spread_pct"] >= 0
    assert s["iters"] == (30, 6)
    assert abs(s["delta_work_s"] - s["min"] * 24) < 1e-12
    if s["delta_work_s"] >= 0.02:
        # only a resolved measurement orders its statistics: a 24-iter
        # difference of a tiny matmul is microseconds of device work —
        # relay RTT noise can push the median subtraction negative on
        # the TPU lane, which is exactly why production timing
        # auto-scales its counts (the clamped "min" stays positive)
        assert s["median"] >= s["min"]


def test_wall_time_includes_sync(rng):
    x = jnp.ones((64, 64))
    t = wall_time(lambda a: a + 1, (x,), reps=3)
    assert 0 < t < 1.0


def test_roofline_pct():
    assert roofline_pct(394.7e12, 1.0) == 100.0
