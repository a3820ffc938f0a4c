"""Weight serialization: pickle pytrees, darknet .weights, BN folding.

Reference M2 (SURVEY.md section 2.3): the reference deserializes a pickle
of numpy arrays; whether batch-norm is pre-folded is unverified ([R]).
We support both: raw per-layer BN params (gamma/beta/mean/var) folded once
at load, or pre-folded (w, b) pairs. We additionally parse the public
darknet ``.weights`` binary format so real YOLO checkpoints drop in.

Checkpoint format (SURVEY.md section 5, checkpoint/resume): a single
``.npz`` holding the (possibly quantized) params pytree plus calibration
scales — the engine's persisted state.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from dnn_inference_engine_tpu.models.layers import Conv, Dense
from dnn_inference_engine_tpu.models.model import Model

BN_EPS = 1e-6  # darknet's batch_norm epsilon [R - verify per SURVEY.md 0.1]


def fold_bn(w: np.ndarray, bias: np.ndarray, gamma: np.ndarray,
            mean: np.ndarray, var: np.ndarray,
            eps: float = BN_EPS):
    """Fold conv+BN into (w', b').  w is HWIO; BN params are (Cout,).

    y = gamma * (conv(x,w) - mean) / sqrt(var+eps) + beta
      = conv(x, w * gamma/sqrt(var+eps)) + (beta - gamma*mean/sqrt(var+eps))
    (darknet's conv 'bias' with BN enabled is the BN beta.)
    """
    scale = gamma / np.sqrt(var + eps)
    return (w * scale).astype(np.float32), (bias - mean * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# Pickle pytree (reference-style)
# ---------------------------------------------------------------------------

def save_params(params: List[Dict], path: str) -> None:
    host = [{k: np.asarray(v) for k, v in p.items()} for p in params]
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_params(path: str, fold: bool = True) -> List[Dict]:
    """Load a pickled per-layer param list.

    Accepts either pre-folded layers ``{"w","b"}`` or raw BN layers
    ``{"w","b","gamma","mean","var"}`` (folded here when ``fold``).
    """
    with open(path, "rb") as f:
        raw = pickle.load(f)
    out: List[Dict] = []
    for p in raw:
        if fold and "gamma" in p:
            w, b = fold_bn(np.asarray(p["w"]), np.asarray(p["b"]),
                           np.asarray(p["gamma"]), np.asarray(p["mean"]),
                           np.asarray(p["var"]))
            out.append({"w": w, "b": b})
        else:
            out.append({k: np.asarray(v) for k, v in p.items()})
    return out


# ---------------------------------------------------------------------------
# Darknet .weights binary
# ---------------------------------------------------------------------------

def load_darknet_weights(model: Model, path: str) -> List[Dict]:
    """Parse darknet's binary format into a folded params pytree.

    Layout: int32 major, minor, revision; then int64 'seen' when
    major*10+minor >= 2 else int32; then per conv layer (file order):
      with BN:  beta(C), gamma(C), mean(C), var(C), W(Cout,Cin,kh,kw)
      no BN:    bias(C), W(Cout,Cin,kh,kw)
    Weights transpose to HWIO = (kh,kw,Cin,Cout) via (2,3,1,0).
    """
    with open(path, "rb") as f:
        major, minor, _rev = np.fromfile(f, np.int32, 3)
        if major * 10 + minor >= 2:
            np.fromfile(f, np.int64, 1)
        else:
            np.fromfile(f, np.int32, 1)
        buf = np.fromfile(f, np.float32)

    pos = 0

    def take(n):
        nonlocal pos
        out = buf[pos:pos + n]
        assert out.size == n, "weights file truncated"
        pos += n
        return out

    chans = model.out_channels()
    params: List[Dict] = []
    prev = model.in_ch
    for li, layer in enumerate(model.layers):
        if isinstance(layer, Conv):
            c, k = layer.out_ch, layer.ksize
            if layer.use_bn:
                beta = take(c); gamma = take(c); mean = take(c); var = take(c)
            else:
                bias = take(c)
            w = take(c * prev * k * k).reshape(c, prev, k, k).transpose(2, 3, 1, 0)
            if layer.use_bn:
                w, b = fold_bn(w, beta, gamma, mean, var)
            else:
                b = bias.astype(np.float32)
            params.append({"w": np.ascontiguousarray(w), "b": b})
        elif isinstance(layer, Dense):
            raise NotImplementedError("darknet format has no dense layers here")
        else:
            params.append({})
        prev = chans[li]
    assert pos == buf.size, f"weights file has {buf.size - pos} unread floats"
    return params


# ---------------------------------------------------------------------------
# Engine checkpoint (.npz): params + quantization state
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, params: List[Dict],
                    act_scales: Optional[Sequence[float]] = None) -> None:
    flat = {}
    for li, p in enumerate(params):
        for k, v in p.items():
            flat[f"l{li}.{k}"] = np.asarray(v)
    flat["n_layers"] = np.int64(len(params))
    if act_scales is not None:
        flat["act_scales"] = np.asarray(act_scales, np.float32)
    np.savez(path, **flat)


def load_checkpoint(path: str):
    z = np.load(path)
    n = int(z["n_layers"])
    params: List[Dict] = [{} for _ in range(n)]
    for key in z.files:
        if key.startswith("l") and "." in key:
            li, name = key.split(".", 1)
            params[int(li[1:])][name] = z[key]
    scales = z["act_scales"].tolist() if "act_scales" in z.files else None
    return params, scales
