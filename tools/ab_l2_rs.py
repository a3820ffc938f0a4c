"""Microbench: WHY is the rs kernel slow at the conv2-fold shape?

Round-2 recorded conv3x3_rs at (32,104,104,64)->128 (the folded conv2
shape) as 1.15 ms vs 0.10-0.17 for XLA — which currently blocks every
"fuse conv2 into a Pallas kernel" plan (round-4 verdict task 1). This
tool decomposes the rs cost at that shape: kernel vs its XLA input prep
(pad + halo stack), pool vs no pool, cin 64 vs lane-padded 128, ht.

Run on the chip:  python tools/ab_l2_rs.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.ops.pallas_conv import conv3x3_rs
from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time

N, H, W, CIN, COUT = 32, 104, 104, 64, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-127, 128, (N, H, W, CIN), dtype=np.int8))
x128 = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
w = jnp.asarray(rng.integers(-127, 128, (3, 3, CIN, COUT), dtype=np.int8))
w128 = jnp.concatenate([w, jnp.zeros_like(w)], axis=2)
scale = jnp.full((COUT,), 1e-4, jnp.float32)
bias = jnp.zeros((COUT,), jnp.float32)


def t(fn, *args):
    return per_iter_time(fn, args, iters_hi=200, iters_lo=40, reps=3,
                         stat="min") * 1e6


def xla_chain(xx):
    y = jax.lax.conv_general_dilated(
        xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale + bias
    y = jnp.where(y > 0, y, 0.1 * y)
    y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    go = 32
    return jnp.maximum(
        jnp.maximum(y[..., :go], y[..., go:2 * go]),
        jnp.maximum(y[..., 2 * go:3 * go], y[..., 3 * go:]))


cases = [
    ("xla conv+epi+gmax (isolated)", lambda: t(jax.jit(xla_chain), x)),
    ("rs gmaxm cin64 (as swept)",
     lambda: t(lambda xx: conv3x3_rs(xx, w, scale, bias,
                                     pool=("gmaxm", 2, 32)), x)),
    ("rs nopool cin64",
     lambda: t(lambda xx: conv3x3_rs(xx, w, scale, bias, pool=None), x)),
    ("rs gmaxm cin128 (lane-pad)",
     lambda: t(lambda xx: conv3x3_rs(xx, w128, scale, bias,
                                     pool=("gmaxm", 2, 32)), x128)),
    ("rs gmaxm cin64 ht4",
     lambda: t(lambda xx: conv3x3_rs(xx, w, scale, bias,
                                     pool=("gmaxm", 2, 32), ht=4), x)),
    ("rs gmaxm cin64 ht26",
     lambda: t(lambda xx: conv3x3_rs(xx, w, scale, bias,
                                     pool=("gmaxm", 2, 32), ht=26), x)),
    ("rs gmaxm+s2d_out cin64",
     lambda: t(lambda xx: conv3x3_rs(xx, w, scale, bias,
                                     pool=("gmaxm", 2, 32), s2d_out=True,
                                     ht=8), x)),
]

print(f"shape ({N},{H},{W},{CIN})->{COUT}, backend={jax.default_backend()}")
for name, fn in cases:
    try:
        us = fn()
        print(f"{us:9.1f} us  {name}", flush=True)
    except Exception as e:
        print(f"   FAILED  {name}: {repr(e)[:120]}", flush=True)
