"""Golden-tensor machinery (reference E1; SURVEY.md section 2.8).

The reference's grading mechanism: the PR1 FP32 model dumps every layer's
output, and optimized/quantized implementations are diffed against those
dumps within a tolerance. Here the FP32 JAX model is the in-repo golden
generator; every kernel tier (XLA int8, Pallas fused) is tested against it.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import numpy as np


def dump_goldens(model, params, x, path: str) -> Tuple:
    """Run the FP32 model, dump every layer output (+ final) to ``path``.npz."""
    out, layer_outs = jax.jit(
        lambda p, xx: model.forward_fp32(p, xx, capture_outputs=True)
    )(params, x)
    arrs = {f"layer{li}": np.asarray(t) for li, t in enumerate(layer_outs)}
    arrs["input"] = np.asarray(x)
    np.savez_compressed(path, **arrs)
    return out, layer_outs


def load_goldens(path: str) -> Dict[int, np.ndarray]:
    z = np.load(path)
    return {int(k[len("layer"):]): z[k] for k in z.files if k.startswith("layer")}


def compare_goldens(layer_outs: Sequence, goldens: Dict[int, np.ndarray],
                    rtol: float = 1e-5, atol: float = 1e-5):
    """Per-layer max-abs-diff report; raises on tolerance violation."""
    report = {}
    for li, t in enumerate(layer_outs):
        g = goldens[li]
        t = np.asarray(t)
        diff = np.max(np.abs(t - g))
        report[li] = float(diff)
        np.testing.assert_allclose(t, g, rtol=rtol, atol=atol,
                                   err_msg=f"layer {li} mismatch")
    return report


def quant_error_report(layer_outs: Sequence, goldens: Dict[int, np.ndarray]):
    """For quantized paths: per-layer relative RMS error vs the FP32 golden
    (asserted against quantization-error bounds by the tests, not exact)."""
    report = {}
    for li, t in enumerate(layer_outs):
        g = np.asarray(goldens[li], np.float64)
        t = np.asarray(t, np.float64)
        denom = np.sqrt(np.mean(g * g)) + 1e-12
        report[li] = float(np.sqrt(np.mean((t - g) ** 2)) / denom)
    return report
