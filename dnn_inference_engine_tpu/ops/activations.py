"""Activation functions (reference L1 / K7 epilogue; SURVEY.md section 2.1).

The reference applies bias + leaky-ReLU (alpha=0.1) after each conv GEMM,
fused into the GEMM epilogue in its optimized variants. Here the f32
epilogue lives either in XLA (which fuses it into the conv) or inside the
Pallas kernel epilogue (ops/pallas_gemm.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from dnn_inference_engine_tpu.config import LEAKY_SLOPE


def leaky_relu(x: jnp.ndarray, slope: float = LEAKY_SLOPE) -> jnp.ndarray:
    return jnp.where(x > 0, x, slope * x)


def apply_activation(x: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "leaky":
        return leaky_relu(x)
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "linear":
        return x
    raise ValueError(f"unknown activation: {act}")
