"""Per-layer kernel-tier selection: Pallas fused GEMM vs XLA conv.

The reference exposes its kernel ladder as a CLI mode choice (naive / AVX /
CUDA / cuBLAS, SURVEY.md P5); here the tiers are 'xla' (stock lowering,
the vendor-library tier K6) and 'pallas' (hand-written tier K3/K5), with
'auto' picking per layer:

- Pallas im2col+GEMM is profitable when the patch matrix is compact and
  the GEMM is MXU-shaped: small spatial output, wide K = kh*kw*cin.
  These are exactly the late layers that carry ~69% of YOLOv2-tiny FLOPs
  (SURVEY.md section 2.5).
- Early large-spatial layers keep XLA's native conv (no 9x patch blowup).

Thresholds are deliberately simple and benchmark-tuned on v5e (bench.py
reports per-layer tier choices).
"""

from __future__ import annotations

import jax.numpy as jnp

from dnn_inference_engine_tpu.ops import conv as conv_xla
from dnn_inference_engine_tpu.ops import conv_lowering as conv_pl

# auto-policy thresholds
_MAX_SPATIAL = 32 * 32      # output positions per image
_MIN_K = 1024               # contraction depth kh*kw*cin


def _conv_out_hw(h, w, stride):
    return -(-h // stride), -(-w // stride)


def use_pallas(x_shape, w_shape, stride) -> bool:
    kh, kw, cin, cout = w_shape
    _, h, w, _ = x_shape
    ho, wo = _conv_out_hw(h, w, stride)
    return (ho * wo <= _MAX_SPATIAL) and (kh * kw * cin >= _MIN_K)


def conv2d_w8a8_dispatch(xq, s_in, wq, s_w, b, act="leaky", stride=1,
                         padding="SAME", s_out=None, force_pallas=False):
    if force_pallas or use_pallas(xq.shape, wq.shape, stride):
        return conv_pl.conv2d_w8a8_pallas(xq, s_in, wq, s_w, b, act=act,
                                          stride=stride, padding=padding,
                                          s_out=s_out)
    return conv_xla.conv2d_w8a8(xq, s_in, wq, s_w, b, act=act, stride=stride,
                                padding=padding, s_out=s_out)


def conv2d_w8_dispatch(x, wq, s_w, b, act="leaky", stride=1, padding="SAME",
                       force_pallas=False):
    if force_pallas:
        return conv_pl.conv2d_w8_pallas(x, wq, s_w, b, act=act, stride=stride,
                                        padding=padding)
    # auto tier for w8: the bf16 MXU path everywhere (int8 codes are
    # exact in bf16, activations round to bf16 — see conv2d_w8_bf16;
    # XLA's native conv beats the im2col+GEMM tier in-graph at every
    # yolov2 shape, measured round 2). The strict f32 path stays
    # available as kernel='xla'.
    return conv_xla.conv2d_w8_bf16(x, wq, s_w, b, act=act, stride=stride,
                                   padding=padding)


def conv2d_fp32_dispatch(x, w, b, act="leaky", stride=1, padding="SAME",
                         force_pallas=False):
    if force_pallas or use_pallas(x.shape, w.shape, stride):
        return conv_pl.conv2d_fp32_pallas(x, w, b, act=act, stride=stride,
                                          padding=padding)
    return conv_xla.conv2d_fp32(x, w, b, act=act, stride=stride,
                                padding=padding)


def tier_report(model, batch: int = 1, mode: str = "w8a8"):
    """Which tier 'auto' picks for every conv layer (for bench/debug)."""
    from dnn_inference_engine_tpu.models.layers import (
        Conv, MaxPool, Route, Upsample)
    chans = model.out_channels()
    report = []
    sizes = []                      # (h, w) of each layer's output
    h = w = model.input_size
    prev_c = model.in_ch
    for li, layer in enumerate(model.layers):
        if isinstance(layer, Conv):
            wshape = (layer.ksize, layer.ksize, prev_c, layer.out_ch)
            tier = ("pallas" if use_pallas((batch, h, w, prev_c), wshape,
                                           layer.stride) else "xla")
            report.append((li, f"conv{layer.ksize}x{layer.ksize}"
                           f" {prev_c}->{layer.out_ch} @{h}x{w}", tier))
            h, w = _conv_out_hw(h, w, layer.stride)
        elif isinstance(layer, MaxPool) and layer.stride > 1:
            h, w = -(-h // layer.stride), -(-w // layer.stride)
        elif isinstance(layer, Upsample):
            h, w = h * layer.stride, w * layer.stride
        elif isinstance(layer, Route):
            h, w = sizes[layer.layers[0]]
        sizes.append((h, w))
        prev_c = chans[li]
    return report
