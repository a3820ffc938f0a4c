"""Prototype: 3x3 int8 conv with DMA-assembled A_cat (+ fused gmax).

conv3x3_rs assembles the implicit-im2col matrix with vector-op ref
writes; at the conv2-fold shape (32,104,104,64)->128 that measures
~1000 us vs 141 us for isolated XLA (tools/ab_l2_rs.py) — the sliced-
then-reshaped VMEM writes issue on the VPU and dominate. This prototype
assembles A_cat with `pltpu.make_async_copy` (the DMA engines) instead:
9 async tap copies that bypass the vector unit entirely.

Variants measured:
  dense   A_cat (ht, W, 9*64=576->640) — tap dests at 64-lane offsets
          (sub-tile: tests whether DMA handles non-tile-aligned lanes)
  aligned A_cat (ht, W, 9*128=1152) — tile-aligned dests, zero gap
          lanes pre-set once (scratch persists across grid cells);
          GEMM K doubles (287 us MXU floor vs 143)

Run on chip: python tools/proto_conv_dma.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnn_inference_engine_tpu.runtime.benchlib import per_iter_time

N, H, W, CIN, COUT = 32, 104, 104, 64, 128
GO = 32          # gmax output channels (pool-major f=2)


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, o_ref,
            win, acat, sem_in, sem_a, *, ht, wp, cin, kstride, kpad, cout):
    n = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _init():
        # zero once: gap lanes (aligned variant) / K-pad tail (dense)
        # persist across grid cells (scratch is not re-initialized)
        acat[...] = jnp.zeros_like(acat)

    din = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * ht, ht + 2)], win, sem_in)
    din.start()
    din.wait()

    dmas = []
    for dh in range(3):
        for dw in range(3):
            j = dh * 3 + dw
            d = pltpu.make_async_copy(
                win.at[pl.ds(dh, ht), pl.ds(dw, W), :],
                acat.at[:, :, pl.ds(j * kstride, cin)],
                sem_a.at[j])
            d.start()
            dmas.append(d)
    for d in dmas:
        d.wait()

    acc = jnp.dot(acat[...].reshape(ht * W, kpad), w_ref[...],
                  preferred_element_type=jnp.int32)
    mt = ht * W
    acc = jnp.maximum(
        jnp.maximum(jax.lax.slice(acc, (0, 0), (mt, GO)),
                    jax.lax.slice(acc, (0, GO), (mt, 2 * GO))),
        jnp.maximum(jax.lax.slice(acc, (0, 2 * GO), (mt, 3 * GO)),
                    jax.lax.slice(acc, (0, 3 * GO), (mt, 4 * GO))))
    y = acc.astype(jnp.float32) * scale_ref[...] + bias_ref[...]
    y = jnp.where(y > 0, y, 0.1 * y)
    y = jnp.clip(jnp.round(y), -127, 127)
    o_ref[...] = y.reshape(ht, W, GO).astype(jnp.int8)[None]


@functools.partial(jax.jit, static_argnames=("ht", "aligned"))
def conv_dma(x, w, scale, bias, ht=13, aligned=False):
    n, h, wd, cin = x.shape
    cout = w.shape[3]
    kstride = 128 if aligned else cin
    kpad = 9 * kstride if aligned else -(-9 * cin // 128) * 128
    wp = -(-(wd + 2) // 8) * 8          # sublane-aligned slice extents
    # SAME halo rows/cols baked into the HBM-side tensor
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    wmat = jnp.zeros((kpad, cout), jnp.int8)
    wr = w.reshape(9, cin, cout)
    for j in range(9):
        wmat = wmat.at[j * kstride:j * kstride + cin].set(wr[j])
    return pl.pallas_call(
        functools.partial(_kernel, ht=ht, wp=wp, cin=cin, kstride=kstride,
                          kpad=kpad, cout=cout),
        grid=(n, h // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kpad, cout), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GO), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GO), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wd, GO), lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, GO), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, wp, cin), jnp.int8),
            pltpu.VMEM((ht, wd, kpad), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * kpad * cout,
            bytes_accessed=int(xp.size + wmat.size + n * h * wd * GO),
            transcendentals=0),
    )(xp, wmat, scale.reshape(1, GO), bias.reshape(1, GO))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (N, H, W, CIN), dtype=np.int8))
    w = jnp.asarray(rng.integers(-20, 21, (3, 3, CIN, COUT), dtype=np.int8))
    scale = jnp.full((GO,), 1e-4, jnp.float32)
    bias = jnp.zeros((GO,), jnp.float32)

    # reference: gmax-first on i32 commutes with the epilogue
    def ref2(xx):
        y = jax.lax.conv_general_dilated(
            xx, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        m = jnp.maximum(
            jnp.maximum(y[..., :GO], y[..., GO:2 * GO]),
            jnp.maximum(y[..., 2 * GO:3 * GO], y[..., 3 * GO:]))
        z = m.astype(jnp.float32) * scale + bias
        z = jnp.where(z > 0, z, 0.1 * z)
        return jnp.clip(jnp.round(z), -127, 127).astype(jnp.int8)

    want = np.asarray(jax.jit(ref2)(x))
    for name, fn in [
        ("dma dense k640", lambda xx: conv_dma(xx, w, scale, bias,
                                               aligned=False)),
        ("dma aligned k1152", lambda xx: conv_dma(xx, w, scale, bias,
                                                  aligned=True)),
        ("dma dense ht26", lambda xx: conv_dma(xx, w, scale, bias, ht=26,
                                               aligned=False)),
        ("dma dense ht8", lambda xx: conv_dma(xx, w, scale, bias, ht=8,
                                              aligned=False)),
    ]:
        try:
            got = np.asarray(fn(x))
            ok = np.array_equal(got, want)
            us = per_iter_time(fn, (x,), iters_hi=200, iters_lo=40,
                               reps=3, stat="min") * 1e6
            print(f"{us:9.1f} us  exact={ok}  {name}", flush=True)
        except Exception as e:
            print(f"   FAILED  {name}: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
