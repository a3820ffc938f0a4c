"""Convolution ops — the XLA tier (reference K1/K6; SURVEY.md section 2.1).

The reference lowers conv to im2col + GEMM and provides a ladder of kernels
(naive C -> AVX -> threaded -> CUDA -> cuBLAS). On TPU the ladder is:

- this module: XLA's ``lax.conv_general_dilated`` — the "vendor library"
  tier (cuBLAS-equivalent, K6) and the correctness baseline (K1)
- ops/pallas_gemm.py + ops/conv_lowering.py: the hand-written kernel tier
  (K3/K5/K7/Q3 equivalent) with fused dequant + bias + leaky-ReLU

All activations are NHWC, weights HWIO. Quantization semantics per
SURVEY.md section 2.2: symmetric int8, per-output-channel weight scales,
per-tensor activation scales, f32 epilogue then optional requantize.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dnn_inference_engine_tpu.ops.activations import apply_activation

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, stride: int, padding, **kw):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMNUMS,
        **kw,
    )


def conv2d_fp32(
    x: jnp.ndarray,          # (N,H,W,Cin) f32
    w: jnp.ndarray,          # (kh,kw,Cin,Cout) f32
    b: jnp.ndarray,          # (Cout,) f32  (BN pre-folded at load)
    act: str = "leaky",
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """FP32 golden path (reference PR1 model; SURVEY.md section 3.1).

    HIGHEST precision: on TPU the MXU's default f32 path multiplies in
    bf16 (~1e-3 relative error) — unacceptable for the golden-reference
    role (quantization error it measures is ~1e-2; goldens/calibration
    must not be polluted by the baseline's own multiply error). HIGHEST
    selects the exact 6-pass bf16 decomposition.
    """
    y = _conv(x, w, stride, padding,
              precision=jax.lax.Precision.HIGHEST) + b
    return apply_activation(y, act)


def conv2d_w8(
    x: jnp.ndarray,          # (N,H,W,Cin) f32 activations
    wq: jnp.ndarray,         # (kh,kw,Cin,Cout) int8
    s_w: jnp.ndarray,        # (Cout,) f32 per-output-channel scales
    b: jnp.ndarray,          # (Cout,) f32
    act: str = "leaky",
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """INT8 weight-only conv (reference PR3 weight-only mode; SURVEY.md Q1).

    The per-output-channel dequant commutes with the convolution, so we
    convolve f32 activations against the raw int8 codes (converted on the
    fly — XLA fuses the convert, never materializing f32 weights in HBM)
    and apply ``s_w`` to the output channels.

    HIGHEST precision: this is the accurate f32-activation tier (same
    contract as conv2d_fp32); the FAST weight-only path is the bf16 tier
    (conv2d_w8_bf16 / the w8 fold plan), which trades mantissa for 2x MXU
    throughput explicitly.
    """
    y = _conv(x, wq.astype(jnp.float32), stride, padding,
              precision=jax.lax.Precision.HIGHEST)
    y = y * s_w + b
    return apply_activation(y, act)


def conv2d_w8_bf16(
    x: jnp.ndarray,          # (N,H,W,Cin) f32 activations
    wq: jnp.ndarray,         # (kh,kw,Cin,Cout) int8
    s_w: jnp.ndarray,        # (Cout,) f32 per-output-channel scales
    b: jnp.ndarray,          # (Cout,) f32
    act: str = "leaky",
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    """Weight-only conv on the MXU's bf16 path (the fast w8 tier).

    int8 codes are EXACT in bf16 (|code| <= 127 needs 7 mantissa bits);
    activations round to bf16 (<= 2^-8 relative input error — the same
    order as W8A8's int8 activation quantization, and covered by the
    same accuracy gates). Accumulation in f32, per-channel dequant on
    the output. ~2x the f32 conv's MXU rate on v5e; the epilogue stays
    f32 like every other tier.
    """
    acc = _conv(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16), stride,
                padding, preferred_element_type=jnp.float32)
    y = acc * s_w + b
    return apply_activation(y, act)


def conv2d_w8a8(
    xq: jnp.ndarray,         # (N,H,W,Cin) int8 quantized activations
    s_in: jnp.ndarray,       # scalar f32 input activation scale
    wq: jnp.ndarray,         # (kh,kw,Cin,Cout) int8
    s_w: jnp.ndarray,        # (Cout,) f32
    b: jnp.ndarray,          # (Cout,) f32
    act: str = "leaky",
    stride: int = 1,
    padding="SAME",
    s_out: Optional[jnp.ndarray] = None,  # scalar f32: requant scale for next layer
) -> jnp.ndarray:
    """Full W8A8 conv (reference PR3 W8A8 mode; SURVEY.md Q3, section 3.3).

    int8 x int8 -> int32 accumulate on the MXU, then the f32 epilogue:
    dequant (acc * s_in * s_w), bias, activation, and optional requantize
    to int8 for the next layer. XLA fuses the epilogue into the conv.
    """
    acc = _conv(xq, wq, stride, padding, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_in * s_w) + b
    y = apply_activation(y, act)
    if s_out is None:
        return y
    from dnn_inference_engine_tpu.quant.quantize import quantize_act
    return quantize_act(y, s_out)
