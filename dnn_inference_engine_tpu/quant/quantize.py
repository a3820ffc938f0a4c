"""Quantization: per-channel weight quant, activation calibration, requant.

Reference components Q1/Q2 (SURVEY.md section 2.2):
- Q1 weight quantizer: per-output-channel symmetric int8,
  ``s_c = max|W_c| / 127``, ``Wq = round(W / s_c)``.
- Q2 activation calibration: run the FP32 model over calibration images,
  record per-layer max-abs activation ranges -> per-tensor scales.

All math is symmetric int8 clipped to [-127, 127] (config.QMAX).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from dnn_inference_engine_tpu.config import QMAX


def quantize_weights_per_channel(w: jnp.ndarray):
    """Q1: (..., Cout) f32 -> int8 codes + (Cout,) f32 scales.

    Works for conv HWIO (kh,kw,Cin,Cout) and dense (Cin,Cout) weights —
    scale is per output channel (last axis) in both.
    """
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))   # (Cout,)
    s_w = jnp.maximum(absmax, 1e-12) / QMAX
    wq = jnp.clip(jnp.round(w / s_w), -QMAX, QMAX).astype(jnp.int8)
    return wq, s_w.astype(jnp.float32)


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """f32 -> int8 with a per-tensor scale (scale maps int units to f32)."""
    return jnp.clip(jnp.round(x / scale), -QMAX, QMAX).astype(jnp.int8)


def dequantize(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


def calibrate(model, params, images: np.ndarray, batch: int = 8) -> List[float]:
    """Q2: per-layer input activation scales for W8A8.

    Runs the FP32 model over calibration images and records the max-abs of
    every conv layer's *input* (which is what gets quantized in the W8A8
    chain, SURVEY.md section 3.3). Returns one f32 scale per model layer
    (non-conv layers get a scale too — harmless — indexed by layer id).

    ``model`` is a Model (models/model.py); ``params`` its fp32 pytree.
    """
    n_layers = len(model.layers)
    absmax = np.zeros((n_layers + 1,), np.float64)  # +1 for the network input

    fwd = jax.jit(lambda p, x: model.forward_fp32(p, x, capture_inputs=True)[1])
    for i in range(0, len(images), batch):
        chunk = jnp.asarray(images[i:i + batch], jnp.float32)
        captured = fwd(params, chunk)
        for li, t in enumerate(captured):
            absmax[li] = max(absmax[li], float(jnp.max(jnp.abs(t))))
    scales = np.maximum(absmax, 1e-12) / QMAX
    return [float(s) for s in scales]


def quantize_model_params(params: List[Dict], layers) -> List[Dict]:
    """Quantize every conv layer's weights (Q1) in a model params pytree.

    Returns a new per-layer list where conv layers hold
    ``{"wq": int8, "s_w": f32 (Cout,), "b": f32}`` and other layers pass
    through unchanged.
    """
    out = []
    for layer, p in zip(layers, params):
        if p and "w" in p:
            wq, s_w = quantize_weights_per_channel(p["w"])
            q = {"wq": wq, "s_w": s_w}
            if "b" in p:
                q["b"] = p["b"]
            out.append(q)
        else:
            out.append(p)
    return out
