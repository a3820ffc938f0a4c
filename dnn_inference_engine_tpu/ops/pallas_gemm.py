"""Flagship Pallas MXU GEMM kernels with fused quantized epilogue.

This is the TPU-native replacement for the reference's hand-written kernel
ladder (SURVEY.md section 2.1, K3 AVX GEMM / K5 CUDA GEMM / K7 epilogue /
Q3 quantized conv): one pass over HBM computing

    out = act( acc * scale[col] + bias[col] )      (+ optional int8 requant)

where ``acc`` is the int8 x int8 -> int32 (or f32) MXU matmul accumulator.
Per [B] (BASELINE.json north_star) the dequant + bias + leaky-ReLU epilogue
is fused into the GEMM so quantized conv is a single kernel launch.

Scale folding done by callers (ops/conv_lowering.py): for W8A8 the
per-column scale is ``s_in * s_w[c]`` (divided by ``s_out`` when
requantizing, with bias divided likewise — exact because leaky-ReLU
commutes with positive per-column scaling).

Grid is (M/TM, N/TN, K/TK) with K innermost; the int32 accumulator lives
in VMEM scratch across K steps and the epilogue runs on the last K step.
Runs compiled on TPU (Mosaic), interpreter mode elsewhere (CPU tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnn_inference_engine_tpu.config import LEAKY_SLOPE, QMAX


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(dim: int, cap: int, unit: int = 128) -> int:
    """Largest multiple of ``unit`` <= cap that keeps padding waste low."""
    padded = _round_up(dim, unit)
    return min(cap, padded)


def _epilogue(acc, scale, bias, act, quantize_out, out_ref, raw_acc=False):
    if raw_acc:
        out_ref[:] = acc          # raw accumulator out (sharded psum path)
        return
    y = acc.astype(jnp.float32) * scale + bias
    if act == "leaky":
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    if quantize_out:
        y = jnp.clip(jnp.round(y), -QMAX, QMAX)
        out_ref[:] = y.astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_ref.dtype)


def _gemm_kernel_flat(a_ref, b_ref, scale_ref, bias_ref, out_ref,
                      *, acc_dtype, act, quantize_out, raw_acc=False):
    """Weights-resident schedule: the full (K, N) weight block stays in
    VMEM across the whole grid; activations stream through in one HBM
    pass. This is the speed-of-light layout for the late YOLO layers
    (K*N int8 <= ~8 MB; SURVEY.md hard part 2)."""
    av = a_ref[:]
    bv = b_ref[:]
    if bv.dtype != av.dtype:
        bv = bv.astype(av.dtype)
    acc = jnp.dot(av, bv, preferred_element_type=acc_dtype,
                  precision=(jax.lax.Precision.HIGHEST
                             if av.dtype == jnp.float32 else None))
    _epilogue(acc, scale_ref[:], bias_ref[:], act, quantize_out, out_ref,
              raw_acc)


def _gemm_kernel(a_ref, b_ref, scale_ref, bias_ref, out_ref, acc_ref,
                 *, acc_dtype, act, quantize_out, raw_acc=False):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    av = a_ref[:]
    bv = b_ref[:]
    if bv.dtype != av.dtype:
        # weight-only (w8) path: f32 activations x int8 weights — dequant
        # codes to f32 in VMEM (the HBM copy of weights stays int8)
        bv = bv.astype(av.dtype)
    acc_ref[:] += jnp.dot(av, bv, preferred_element_type=acc_dtype,
                          precision=(jax.lax.Precision.HIGHEST
                                     if av.dtype == jnp.float32 else None))

    @pl.when(k == nk - 1)
    def _():
        _epilogue(acc_ref[:], scale_ref[:], bias_ref[:], act, quantize_out,
                  out_ref, raw_acc)


@functools.partial(
    jax.jit,
    static_argnames=("act", "quantize_out", "raw_acc", "tm", "tn", "tk",
                     "interpret"))
def gemm_fused(
    a: jnp.ndarray,            # (M, K) int8 | f32 | bf16
    b: jnp.ndarray,            # (K, N) int8 | f32 | bf16  (same class as a)
    scale: jnp.ndarray,        # (N,) f32 per-column scale (epilogue)
    bias: jnp.ndarray,         # (N,) f32 per-column bias
    act: str = "leaky",
    quantize_out: bool = False,
    raw_acc: bool = False,
    tm: int = 256,
    tn: int = 256,
    tk: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """act(a @ b * scale + bias) with MXU-tiled Pallas; optional int8 out.

    Pads M/N/K to tile multiples with zeros (exact for the matmul) and
    slices the result back. int8 inputs accumulate in int32 (bit-exact);
    float inputs accumulate in f32.

    ``raw_acc``: skip the epilogue and return the raw int32 (or f32)
    accumulator — the tensor-parallel row-sharded conv psums this across
    chips BEFORE dequant so sharded execution stays bit-exact
    (parallel/shard_map_forward.py).
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    if raw_acc:
        assert not quantize_out
        out_dtype = acc_dtype
    else:
        out_dtype = jnp.int8 if quantize_out else jnp.float32
    bytesize = lambda t: t.size * t.dtype.itemsize

    # --- schedule selection ------------------------------------------------
    # Weights-resident fast path: the padded (K, N) weight block fits in
    # VMEM, so activations make exactly one HBM pass and the GEMM is
    # compute-bound. Measured on v5e: 3D-tiled 256^2 blocks are HBM-bound
    # at ~33% of int8 peak on conv8 shapes; weights-resident reaches the
    # compute roofline.
    kp_flat = _round_up(k, 128)
    np_flat = _round_up(n, 128)
    b_bytes = kp_flat * np_flat * b.dtype.itemsize
    flat = b_bytes <= 10 * 1024 * 1024
    if flat:
        np_ = np_flat
        kp = kp_flat
        # pick tm so streamed blocks + resident weights fit in ~14 MB VMEM
        out_item = 1 if quantize_out else 4
        # measured on v5e (conv8 shape): tm 256 = 209us, 512 = 306us (VMEM
        # pressure), 128 = 371us (grid overhead) — cap the flat tile at 256
        tm_fit = min(tm, 256)
        while tm_fit > 128:
            # double-buffered a blocks + double-buffered out + int32 acc
            stream = (2 * tm_fit * kp * a.dtype.itemsize
                      + 2 * tm_fit * np_ * out_item + tm_fit * np_ * 4)
            if b_bytes + stream <= 14 * 1024 * 1024:
                break
            tm_fit //= 2
        tm = _pick_tile(m, tm_fit)
        mp = _round_up(m, tm)

        a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
        b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
        scale = jnp.pad(scale.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
        bias = jnp.pad(bias.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)

        kernel = functools.partial(
            _gemm_kernel_flat, acc_dtype=acc_dtype, act=act,
            quantize_out=quantize_out, raw_acc=raw_acc)
        out = pl.pallas_call(
            kernel,
            grid=(mp // tm,),
            in_specs=[
                pl.BlockSpec((tm, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, np_), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * np_ * kp,
                bytes_accessed=bytesize(a) + bytesize(b) + mp * np_,
                transcendentals=0),
            interpret=interpret,
        )(a, b, scale, bias)
        return out[:m, :n]

    # --- general 3D-tiled schedule ----------------------------------------
    tm = _pick_tile(m, tm)
    tn = _pick_tile(n, tn)
    tk = _pick_tile(k, tk)
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)

    a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    scale = jnp.pad(scale.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
    bias = jnp.pad(bias.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)

    grid = (mp // tm, np_ // tn, kp // tk)
    kernel = functools.partial(
        _gemm_kernel, acc_dtype=acc_dtype, act=act, quantize_out=quantize_out,
        raw_acc=raw_acc)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=bytesize(a) + bytesize(b) + mp * np_ * 4,
            transcendentals=0),
        interpret=interpret,
    )(a, b, scale, bias)
    return out[:m, :n]


def int8_gemm_fused(a_q, b_q, scale, bias, act="leaky", s_out=None, **kw):
    """Quantized GEMM: int8 x int8 -> int32 -> f32 epilogue (or int8 out).

    ``scale`` is the already-folded per-column dequant scale; when
    ``s_out`` is given the output is requantized to int8 by folding
    1/s_out into scale and bias (exact: leaky commutes with scaling).
    """
    if s_out is not None:
        inv = 1.0 / s_out
        return gemm_fused(a_q, b_q, scale * inv, bias * inv, act=act,
                          quantize_out=True, **kw)
    return gemm_fused(a_q, b_q, scale, bias, act=act, quantize_out=False, **kw)
