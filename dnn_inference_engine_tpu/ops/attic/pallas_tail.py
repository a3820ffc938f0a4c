"""Batched implicit-im2col Pallas conv for the small-spatial tail layers.

Motivation (VERDICT round 1, weak #2): conv5-conv9 carry ~69% of
YOLOv2-tiny's FLOPs (SURVEY.md 2.5) but run 13x13/26x26 spatial — too
small for the row-streaming kernel's (H-rows x W32-columns) M-geometry
(13 -> 32 columns = 2.46x junk MXU work), and the im2col+GEMM tier
materializes the 9x patch matrix through HBM. This kernel does neither:

- the batch is FOLDED INTO M: all N*H*W output pixels of the whole
  batch form one flat GEMM M-axis (32*13*13 = 5408 rows — MXU-dense);
- conv3x3 = sum over the 9 taps of shift(x) @ W[tap]: per M-block the
  kernel takes 9 dynamically-offset row slices of the RESIDENT flat
  activation tensor (implicit im2col in VMEM, nothing through HBM) and
  accumulates 9 int8 MXU GEMMs in int32;
- rows whose tap crosses an image/row boundary are killed AFTER the dot
  by a per-(row, tap) mask (zeroing row r of A zeroes row r of A@W, so
  post-dot masking on the int32 accumulator is exact and keeps the int8
  A slices untouched);
- the epilogue fuses dequant + bias + leaky-ReLU + requantize;
- weights stay VMEM-resident across the M grid (Cout is split into
  blocks when 9*Cin*Cout int8 alone would blow VMEM — conv8's 9.4 MB).

Exact: int32 accumulation is order-independent, masked taps contribute
exactly the zeros SAME padding demands, and M-padding rows are sliced
off. MAC count = the useful work (no fold inflation, no column junk).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnn_inference_engine_tpu.config import LEAKY_SLOPE, QMAX


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _bt_kernel(x_ref, w_ref, mask_ref, scale_ref, bias_ref, o_ref,
               *, tm, c, pad, offs, act, quantize_out):
    i = pl.program_id(1)
    base = pad + i * tm
    # ONE aligned dynamic read per block (Mosaic proves base-32 is a
    # multiple of 32: pad and tm both are); the 9 tap shifts are then
    # STATIC unaligned slices of the window (vector shifts in-register)
    win = x_ref[pl.ds(base - 32, tm + 64), :]
    acc = None
    for j, off in enumerate(offs):
        a = jax.lax.slice(win, (32 + off, 0), (32 + off + tm, c))
        p = jnp.dot(a, w_ref[j], preferred_element_type=jnp.int32)
        mk = mask_ref[:, j:j + 1]                    # (tm, 1) int32 0/1
        p = p * mk
        acc = p if acc is None else acc + p
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if act == "leaky":
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    if quantize_out:
        y = jnp.clip(jnp.round(y), -QMAX, QMAX)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "quantize_out", "tm", "tn", "interpret"))
def conv3x3_bt(
    x: jnp.ndarray,            # (N, H, W, Cin) int8, stride-1 SAME
    w: jnp.ndarray,            # (3, 3, Cin, Cout) int8
    scale: jnp.ndarray,        # (Cout,) f32 folded dequant scale
    bias: jnp.ndarray,         # (Cout,) f32 (already includes /s_out)
    act: str = "leaky",
    quantize_out: bool = True,
    tm: int = 256,
    tn: int = 0,               # Cout block (0 = auto from VMEM budget)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batch-folded implicit-im2col 3x3/s1/SAME conv with fused epilogue."""
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, c = x.shape
    assert w.shape[:3] == (3, 3, c), (w.shape, x.shape)
    assert c % 128 == 0, f"tail kernel wants lane-tiled Cin, got {c}"
    cout = int(w.shape[3])

    m = n * h * wd
    tm = min(tm, _round_up(m, 32))
    mp = _round_up(m, tm)
    pad = wd + 1                                   # max |tap row offset|
    assert pad <= 32, f"tail kernel supports W <= 31, got {wd}"
    pad_lo = 32                                    # aligned window margin
    xf = x.reshape(m, c)
    xf = jnp.pad(xf, ((pad_lo, 32 + (mp - m)), (0, 0)))

    # per-(row, tap) validity: tap (dh, dw) at output pixel (y, xc) reads
    # inside the image iff 0 <= y+dh < H and 0 <= xc+dw < W. Built once
    # in XLA (int32 0/1), lane-padded to 16.
    g = np.arange(mp)
    yy = (g // wd) % h
    xx = g % wd
    offs = []
    masks = np.zeros((mp, 16), np.int32)
    jj = 0
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            offs.append(dh * wd + dw)
            masks[:, jj] = (((yy + dh) >= 0) & ((yy + dh) < h)
                            & ((xx + dw) >= 0) & ((xx + dw) < wd)
                            & (g < m)).astype(np.int32)
            jj += 1
    mask = jnp.asarray(masks)

    w9 = w.reshape(9, c, cout)

    # Cout split: resident x + streamed weights must fit VMEM (~13 MB)
    if not tn:
        tn = cout
        while (xf.shape[0] * c                      # resident activations
               + 9 * c * tn                         # weight block
               + tm * tn * 4                        # int32 accumulator
               + 3 * tm * tn) > 13_000_000 and tn > 128:
            tn //= 2
    assert cout % tn == 0, (cout, tn)

    scale2 = scale.astype(jnp.float32).reshape(1, cout)
    bias2 = bias.astype(jnp.float32).reshape(1, cout)
    out_dtype = jnp.int8 if quantize_out else jnp.float32

    kernel = functools.partial(
        _bt_kernel, tm=tm, c=c, pad=pad_lo, offs=offs, act=act,
        quantize_out=quantize_out)

    out = pl.pallas_call(
        kernel,
        grid=(cout // tn, mp // tm),               # j outer, m inner:
        in_specs=[                                  # x fetched ONCE
            pl.BlockSpec(xf.shape, lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, tn), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 16), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * 9 * c * cout,
            bytes_accessed=int(xf.size + w.size + mp * cout),
            transcendentals=0),
        interpret=interpret,
    )(xf, w9, mask, scale2, bias2)

    return out[:m].reshape(n, h, wd, cout)


def conv2d_w8a8_bt(xq, s_in, wq, s_w, b, act="leaky", stride=1,
                   padding="SAME", s_out=None):
    """W8A8 tail conv via conv3x3_bt. Same numerics as ops.conv.conv2d_w8a8
    (int8 MXU matmul -> int32 -> f32 epilogue -> optional requant)."""
    assert stride == 1 and padding == "SAME", (stride, padding)
    scale = (s_in * s_w).astype(jnp.float32)
    bias = b.astype(jnp.float32)
    if s_out is not None:
        scale = scale / s_out
        bias = bias / s_out
    return conv3x3_bt(xq, wq, scale, bias, act=act,
                      quantize_out=s_out is not None)
