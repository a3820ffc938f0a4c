"""Conv -> GEMM lowering for the Pallas kernel tier (reference K2 im2col).

The reference materializes an im2col patch matrix and GEMMs it (SURVEY.md
K2/K3). Here patch extraction is expressed as XLA pad + strided slices +
concat (fused by XLA, symmetric-int8 zero padding is exact) and the GEMM
runs the fused Pallas epilogue kernel. Patch layout matches a plain
``w.reshape(kh*kw*cin, cout)`` of HWIO weights: patches ordered
(kh-major, kw, cin) along the K axis.

This tier is profitable for the late small-spatial / wide-channel layers
(conv5-conv9 carry most FLOPs, SURVEY.md section 2.5); early large-spatial
layers would blow up HBM traffic 9x, so the auto policy (ops/dispatch.py)
routes them to XLA's native conv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from dnn_inference_engine_tpu.ops.pallas_gemm import gemm_fused, int8_gemm_fused


def _same_pads(h: int, k: int, s: int) -> Tuple[int, int]:
    """XLA 'SAME' padding (lo, hi) for one spatial dim."""
    out = -(-h // s)
    total = max((out - 1) * s + k - h, 0)
    lo = total // 2
    return lo, total - lo


def extract_patches(x: jnp.ndarray, kh: int, kw: int, stride: int,
                    padding="SAME") -> jnp.ndarray:
    """(N,H,W,C) -> (N,Ho,Wo,kh*kw*C) patch tensor (im2col, K2).

    Zero padding is exact for both f32 and symmetric int8 (zero-point 0).
    """
    n, h, w, c = x.shape
    if padding == "SAME":
        ph = _same_pads(h, kh, stride)
        pw = _same_pads(w, kw, stride)
    elif padding == "VALID":
        ph = pw = (0, 0)
    else:
        ph, pw = padding
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    hp = xp.shape[1]
    wp = xp.shape[2]
    ho = (hp - kh) // stride + 1
    wo = (wp - kw) // stride + 1
    pieces = []
    for i in range(kh):
        for j in range(kw):
            pieces.append(
                xp[:, i:i + (ho - 1) * stride + 1:stride,
                   j:j + (wo - 1) * stride + 1:stride, :])
    return jnp.concatenate(pieces, axis=-1)


def _as_gemm(x_p: jnp.ndarray):
    n, ho, wo, kc = x_p.shape
    return x_p.reshape(n * ho * wo, kc), (n, ho, wo)


def conv2d_w8a8_pallas(xq, s_in, wq, s_w, b, act="leaky", stride=1,
                       padding="SAME", s_out=None):
    """W8A8 conv via im2col + fused int8 Pallas GEMM (flagship path, Q3)."""
    kh, kw, cin, cout = wq.shape
    a, (n, ho, wo) = _as_gemm(extract_patches(xq, kh, kw, stride, padding))
    bmat = wq.reshape(kh * kw * cin, cout)
    scale = (s_in * s_w).astype(jnp.float32)
    out = int8_gemm_fused(a, bmat, scale, b, act=act, s_out=s_out)
    return out.reshape(n, ho, wo, cout)


def conv2d_int8_acc(xq, wq, stride=1, padding="SAME"):
    """int8 conv -> raw int32 accumulator, no epilogue (Pallas GEMM).

    Used by the tensor-parallel row-sharded conv: each chip computes its
    Cin-shard's partial accumulator, psums in int32 (bit-exact), then the
    dequant/bias/act epilogue runs once on the summed accumulator
    (parallel/shard_map_forward.py).
    """
    kh, kw, cin, cout = wq.shape
    a, (n, ho, wo) = _as_gemm(extract_patches(xq, kh, kw, stride, padding))
    bmat = wq.reshape(kh * kw * cin, cout)
    dummy = jnp.zeros((cout,), jnp.float32)
    acc = gemm_fused(a, bmat, dummy, dummy, act="linear", raw_acc=True)
    return acc.reshape(n, ho, wo, cout)


def conv2d_w8_pallas(x, wq, s_w, b, act="leaky", stride=1, padding="SAME"):
    """Weight-only conv: f32 activations x int8 codes, dequant in-kernel."""
    kh, kw, cin, cout = wq.shape
    a, (n, ho, wo) = _as_gemm(extract_patches(x, kh, kw, stride, padding))
    bmat = wq.reshape(kh * kw * cin, cout)
    out = gemm_fused(a, bmat, s_w.astype(jnp.float32), b, act=act)
    return out.reshape(n, ho, wo, cout)


def conv2d_fp32_pallas(x, w, b, act="leaky", stride=1, padding="SAME"):
    """FP32 conv via Pallas GEMM (K1-tier parity check / benchmarking)."""
    kh, kw, cin, cout = w.shape
    a, (n, ho, wo) = _as_gemm(extract_patches(x, kh, kw, stride, padding))
    bmat = w.reshape(kh * kw * cin, cout)
    ones = jnp.ones((cout,), jnp.float32)
    out = gemm_fused(a, bmat, ones, b, act=act)
    return out.reshape(n, ho, wo, cout)
