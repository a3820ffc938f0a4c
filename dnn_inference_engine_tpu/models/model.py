"""Generic layer-list model with fp32 / w8 / w8a8 forward passes.

Reference M1 (SURVEY.md section 2.3): the model is an explicit sequential
layer list whose ``forward`` chains layer ops; we keep the per-layer
structure (it is also the golden-dump mechanism, E1) but the whole forward
is one jitted, fused XLA program — no per-layer host round-trips
(SURVEY.md section 3.2 names those as the reference inefficiency to avoid).

Params are a plain pytree: a list with one dict per layer
  Conv/Dense fp32:  {"w": f32, "b": f32}
  Conv/Dense int8:  {"wq": int8, "s_w": f32 (Cout,), "b": f32}
  everything else:  {}

W8A8 activation-scale tracking (SURVEY.md section 3.3): ``act_scales`` is a
list of per-tensor scales, ``act_scales[li]`` = calibrated scale of the
tensor *entering* layer li (``act_scales[n_layers]`` = final output). The
forward keeps tensors int8 between convs; maxpool/upsample are
scale-preserving (max and nearest-neighbour commute with the monotone
round/clip), while route/shortcut rescale to a common scale in f32.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dnn_inference_engine_tpu.models.layers import (
    Conv, Dense, GlobalAvgPool, MaxPool, Route, Shortcut, Upsample,
)
from dnn_inference_engine_tpu.ops.activations import apply_activation
from dnn_inference_engine_tpu.ops.conv import conv2d_fp32, conv2d_w8, conv2d_w8a8
from dnn_inference_engine_tpu.ops.pool import maxpool
from dnn_inference_engine_tpu.quant.quantize import dequantize, quantize_act
from dnn_inference_engine_tpu.runtime.profiling import layer_scope


def _upsample_nearest(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    x = jnp.repeat(x, stride, axis=1)
    return jnp.repeat(x, stride, axis=2)


class Model:
    """A named tuple-of-layers model (see models/yolov2_tiny.py etc.)."""

    def __init__(self, name: str, layers: Sequence, in_ch: int = 3,
                 input_size: int = 416,
                 out_layers: Optional[Tuple[int, ...]] = None):
        """``out_layers``: indices of the layers whose outputs form the
        model result (multi-head detectors like YOLOv3-tiny have two
        detection heads); None means the last layer's output."""
        self.name = name
        self.layers = tuple(layers)
        self.in_ch = in_ch
        self.input_size = input_size
        self.out_layers = tuple(out_layers) if out_layers is not None else None
        for li, layer in enumerate(self.layers):
            if isinstance(layer, Route):
                assert all(0 <= j < li for j in layer.layers), (li, layer)
            if isinstance(layer, Shortcut):
                assert 0 <= layer.frm < li, (li, layer)

    # ------------------------------------------------------------------
    # Channel bookkeeping / init
    # ------------------------------------------------------------------

    def out_channels(self) -> List[int]:
        """Output channel count of every layer."""
        chans: List[int] = []
        prev = self.in_ch
        for layer in self.layers:
            if isinstance(layer, Conv):
                prev = layer.out_ch
            elif isinstance(layer, Route):
                prev = sum(chans[j] for j in layer.layers)
            elif isinstance(layer, Dense):
                prev = layer.out
            # MaxPool / Shortcut / Upsample / GlobalAvgPool keep channels
            chans.append(prev)
        return chans

    def init_params(self, key: jax.Array) -> List[Dict]:
        """Random fp32 params (He init) — the synthetic-weights path used
        when no reference weight file is available (SURVEY.md section 0)."""
        chans = self.out_channels()
        params: List[Dict] = []
        prev = self.in_ch
        for li, layer in enumerate(self.layers):
            if isinstance(layer, Conv):
                key, k1, k2 = jax.random.split(key, 3)
                fan_in = layer.ksize * layer.ksize * prev
                w = jax.random.normal(
                    k1, (layer.ksize, layer.ksize, prev, layer.out_ch),
                    jnp.float32) * jnp.sqrt(2.0 / fan_in)
                b = 0.01 * jax.random.normal(k2, (layer.out_ch,), jnp.float32)
                params.append({"w": w, "b": b})
            elif isinstance(layer, Dense):
                key, k1, k2 = jax.random.split(key, 3)
                w = jax.random.normal(k1, (prev, layer.out), jnp.float32)
                w = w * jnp.sqrt(2.0 / prev)
                b = 0.01 * jax.random.normal(k2, (layer.out,), jnp.float32)
                params.append({"w": w, "b": b})
            else:
                params.append({})
            prev = chans[li]
        return params

    # ------------------------------------------------------------------
    # Forward passes
    # ------------------------------------------------------------------

    def forward_fp32(self, params, x, capture_inputs: bool = False,
                     capture_outputs: bool = False, kernel: str = "xla"):
        """FP32 forward (reference PR1 golden path, SURVEY.md section 3.1).

        capture_inputs: also return the tensor entering every layer plus the
        final output (length n_layers+1) — feeds calibration (Q2) and the
        golden-dump mechanism (E1).
        """
        conv_fn = _get_conv_fn("fp32", kernel)
        outs: List[jnp.ndarray] = []
        captured_in: List[jnp.ndarray] = []
        for li, layer in enumerate(self.layers):
            captured_in.append(x)
            p = params[li]
            if isinstance(layer, Conv):
                with layer_scope(li, layer):
                    x = conv_fn(x, p["w"], p["b"], act=layer.act,
                                stride=layer.stride, padding=layer.padding)
            elif isinstance(layer, MaxPool):
                x = maxpool(x, layer.size, layer.stride, layer.padding)
            elif isinstance(layer, Route):
                x = jnp.concatenate([outs[j] for j in layer.layers], axis=-1)
            elif isinstance(layer, Shortcut):
                x = apply_activation(x + outs[layer.frm], layer.act)
            elif isinstance(layer, Upsample):
                x = _upsample_nearest(x, layer.stride)
            elif isinstance(layer, GlobalAvgPool):
                x = jnp.mean(x, axis=(1, 2))
            elif isinstance(layer, Dense):
                # HIGHEST: golden path must not multiply in bf16 (see
                # ops/conv.py::conv2d_fp32)
                y = jnp.dot(x, p["w"],
                            precision=jax.lax.Precision.HIGHEST)
                x = apply_activation(y + p["b"], layer.act)
            else:
                raise TypeError(layer)
            outs.append(x)
        captured_in.append(x)
        result = self._select_outputs(outs, x)
        if capture_inputs:
            return result, tuple(captured_in)
        if capture_outputs:
            return result, tuple(outs)
        return result

    def forward_w8(self, qparams, x, capture_outputs: bool = False,
                   kernel: str = "xla"):
        """INT8 weight-only forward: f32 activations, int8 weights."""
        conv_fn = _get_conv_fn("w8", kernel)
        outs: List[jnp.ndarray] = []
        for li, layer in enumerate(self.layers):
            p = qparams[li]
            if isinstance(layer, Conv):
                with layer_scope(li, layer):
                    x = conv_fn(x, p["wq"], p["s_w"], p["b"], act=layer.act,
                                stride=layer.stride, padding=layer.padding)
            elif isinstance(layer, MaxPool):
                x = maxpool(x, layer.size, layer.stride, layer.padding)
            elif isinstance(layer, Route):
                x = jnp.concatenate([outs[j] for j in layer.layers], axis=-1)
            elif isinstance(layer, Shortcut):
                x = apply_activation(x + outs[layer.frm], layer.act)
            elif isinstance(layer, Upsample):
                x = _upsample_nearest(x, layer.stride)
            elif isinstance(layer, GlobalAvgPool):
                x = jnp.mean(x, axis=(1, 2))
            elif isinstance(layer, Dense):
                w = p["wq"].astype(jnp.float32) * p["s_w"]
                x = apply_activation(x @ w + p["b"], layer.act)
            else:
                raise TypeError(layer)
            outs.append(x)
        result = self._select_outputs(outs, x)
        if capture_outputs:
            return result, tuple(outs)
        return result

    def forward_w8a8(self, qparams, act_scales, x,
                     capture_outputs: bool = False, kernel: str = "xla"):
        """Full W8A8 forward (reference PR3 path, SURVEY.md section 3.3).

        x enters as f32; it is quantized once with the first conv's input
        scale and stays int8 across the conv chain (requantize fused into
        each conv epilogue). Returns f32.
        """
        conv_fn = _get_conv_fn("w8a8", kernel)
        n = len(self.layers)
        # scale of the tensor currently held in ``x`` (None => f32 tensor)
        cur_scale: Optional[jnp.ndarray] = None
        outs: List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = []

        def to_f32(t, s):
            return t if s is None else dequantize(t, s)

        for li, layer in enumerate(self.layers):
            s_next = jnp.float32(act_scales[li + 1])
            if isinstance(layer, Conv):
                p = qparams[li]
                if cur_scale is None:
                    cur_scale = jnp.float32(act_scales[li])
                    x = quantize_act(x, cur_scale)
                # last-layer / linear convs emit f32 (no requant)
                requant = not _is_final_f32_layer(self.layers, li)
                with layer_scope(li, layer):
                    x = conv_fn(
                        x, cur_scale, p["wq"], p["s_w"], p["b"],
                        act=layer.act, stride=layer.stride,
                        padding=layer.padding,
                        s_out=s_next if requant else None)
                cur_scale = s_next if requant else None
            elif isinstance(layer, MaxPool):
                x = maxpool(x, layer.size, layer.stride, layer.padding)  # scale-preserving
            elif isinstance(layer, Upsample):
                x = _upsample_nearest(x, layer.stride)    # scale-preserving
            elif isinstance(layer, Route):
                pieces = [to_f32(*outs[j]) for j in layer.layers]
                x = jnp.concatenate(pieces, axis=-1)
                x = quantize_act(x, s_next)
                cur_scale = s_next
            elif isinstance(layer, Shortcut):
                x = to_f32(x, cur_scale) + to_f32(*outs[layer.frm])
                x = apply_activation(x, layer.act)
                x = quantize_act(x, s_next)
                cur_scale = s_next
            elif isinstance(layer, GlobalAvgPool):
                x = jnp.mean(to_f32(x, cur_scale), axis=(1, 2))
                cur_scale = None
            elif isinstance(layer, Dense):
                p = qparams[li]
                w = p["wq"].astype(jnp.float32) * p["s_w"]
                x = apply_activation(to_f32(x, cur_scale) @ w + p["b"],
                                     layer.act)
                cur_scale = None
            else:
                raise TypeError(layer)
            outs.append((x, cur_scale))

        x = to_f32(x, cur_scale)
        if self.out_layers is not None:
            result = tuple(to_f32(*outs[j]) for j in self.out_layers)
        else:
            result = x
        if capture_outputs:
            return result, tuple(to_f32(*o) for o in outs)
        return result

    def _select_outputs(self, outs, x):
        if self.out_layers is not None:
            return tuple(outs[j] for j in self.out_layers)
        return x

    def forward(self, params, x, mode: str = "fp32", act_scales=None,
                kernel: str = "xla", **kw):
        if mode == "fp32":
            return self.forward_fp32(params, x, kernel=kernel, **kw)
        if mode == "w8":
            return self.forward_w8(params, x, kernel=kernel, **kw)
        if mode == "w8a8":
            assert act_scales is not None, "w8a8 needs calibration scales"
            return self.forward_w8a8(params, act_scales, x, kernel=kernel, **kw)
        raise ValueError(f"unknown mode {mode!r}")


def _is_final_f32_layer(layers, li: int) -> bool:
    """A conv whose output is consumed by no further quantized conv keeps
    f32 output (e.g. the detection-head 1x1 conv). Heuristic: linear
    activation convs that feed postprocess (act == 'linear')."""
    return isinstance(layers[li], Conv) and layers[li].act == "linear"


def _get_conv_fn(mode: str, kernel: str):
    if kernel in ("xla",):
        return {"fp32": conv2d_fp32, "w8": conv2d_w8, "w8a8": conv2d_w8a8}[mode]
    if kernel in ("pallas", "auto"):
        from dnn_inference_engine_tpu.ops.dispatch import (
            conv2d_fp32_dispatch, conv2d_w8_dispatch, conv2d_w8a8_dispatch)
        import functools
        table = {"fp32": conv2d_fp32_dispatch, "w8": conv2d_w8_dispatch,
                 "w8a8": conv2d_w8a8_dispatch}
        return functools.partial(table[mode], force_pallas=(kernel == "pallas"))
    raise ValueError(f"unknown kernel tier {kernel!r}")
