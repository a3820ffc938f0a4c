"""Fused first-layer kernel: quantize + conv1 + maxpool + fold-2 emit.

The first YOLO layer (3x3, Cin=3) is MXU-hostile and, executed as XLA
ops, the chain quantize -> space_to_depth -> int8 conv -> requant ->
group-max costs ~1.8 ms/iter at batch 32 on v5e — ~40% of the whole
network, almost all of it XLA layout-assignment copies around the
s8 reshapes/transposes (measured via xplane: copies at 6-17% of HBM
bandwidth; see runtime/plan.py notes). The bandwidth floor of the stage
is ~90 us (read the f32 batch once, write the pooled int8 output once).

This kernel does the whole stage in ONE pass over HBM (reference analog:
the fused quantized conv kernels of SURVEY.md K3/K5/K7/Q3, applied to
the stem):

  raw f32 rows (N, H, W*3)
    -> quantize (VPU, in VMEM)
    -> transpose to (W*3, rows)                 [Mosaic 2D transpose]
    -> materialize the 18 (col-offset, x-shift) stride-12 sublane
       gathers into a B scratch (104, 18*rows)  [once per block]
    -> ONE int8 MXU GEMM  B @ Wb (18*rows, ht*256) per block; Wb holds
       a copy of the 144-row true weight matrix band-shifted by 4y for
       every output row y of the block (expand_stage0_weights) — no
       per-row data movement at all, the row window selection is baked
       into the weights' zero structure
    -> 2x2/s2 maxpool as a 4-way int32 max over pool-major position
       groups (exact: scale>0, epilogue monotone per channel)
    -> f32 epilogue: scale*acc + bias, leaky, requant (x 1/s_out)
    -> emit (N, 104, 104, 64) int8 — exactly space_to_depth(2) of the
       pooled conv1 output, i.e. the fold-2 input the conv2 stage reads
       with NO relayout between the stages.

Dense-K formulation: every pooled output (y, x) needs only the 6x6x3 raw
patch at (4y-1, 4x-1); all 16 conv positions of the 4x4 block share it.
K_true = 6*6*3 = 108, presented to the MXU as 18 pieces x (4*ht+8) row
lanes (only the 8-lane band of each output row is nonzero in Wb).

Mosaic lessons baked in (measured on v5e):
- VMEM writes sourced from a strided 3D-reshape view re-materialize the
  gather on every use (76x slower); materialize each gather into a
  scratch ref once and source everything from the ref.
- Interleaving small scratch writes with dependent dots serializes VPU
  and MXU; the rolled-weight formulation removes the per-row writes.

Exactness: identical int32 accumulation set as conv1 (reassociation
only), identical f32 epilogue ops, max commutes with the monotone
epilogue/round/clip — bit-exact vs the fold_xla stage it replaces
(tested on CPU interpret and on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnn_inference_engine_tpu.config import LEAKY_SLOPE, QMAX


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# piece list: (s, m') pairs in a fixed order; piece p covers raw columns
# 12*(x+s) + m' = 3*jc + c + 12*x  =>  flat col offset d = 12*s + m',
# d = 3*jc + c for jc in {-1..4}, c in {0..2}  (d in {-3..14}, bijective)
_PIECES: Tuple[Tuple[int, int], ...] = tuple(
    ((d // 12), (d % 12)) for d in range(-3, 15)
)
_N_PIECES = len(_PIECES)          # 18
_BAND = 8                         # nonzero rows per piece: o_r in {-1..4} + 2


def build_stage0_weights(wq: np.ndarray, s_w: np.ndarray, b: np.ndarray,
                         s_in: float, s_out: float):
    """(3,3,3,16) int8 conv1 params -> (Wk (144,256) int8, scale, bias).

    Wk[p*8 + (o_r+1), g*16 + co] = wq[o_r-r+1, jc-q+1, c, co] where the
    piece p encodes (jc, c) via d = 12*s + m' = 3*jc + c, and the output
    group g is pool-major over the 4x4 position block: (r, q) = (2a+u,
    2b+v), g = (u*2+v)*4 + (a*2+b) — so the fused maxpool is a max over
    4 contiguous 64-channel slices and the surviving group order
    (a*2+b, co) is exactly the fold-2 (space_to_depth(2)) channel order
    conv2's folded stage consumes.
    """
    wq = np.asarray(wq)
    assert wq.shape == (3, 3, 3, 16), wq.shape
    cout = 16
    wk = np.zeros((_N_PIECES * _BAND, 256), np.int8)
    for p_idx, (s, m) in enumerate(_PIECES):
        d = 12 * s + m
        jc, c = divmod(d + 3, 3)
        jc -= 1
        for o_r in range(-1, 5):
            lane = p_idx * _BAND + (o_r + 1)
            for r in range(4):
                dh = o_r - r
                if dh not in (-1, 0, 1):
                    continue
                for q in range(4):
                    dw = jc - q
                    if dw not in (-1, 0, 1):
                        continue
                    a, u = r // 2, r % 2
                    bcol, v = q // 2, q % 2
                    g = (u * 2 + v) * 4 + (a * 2 + bcol)
                    wk[lane, g * cout:(g + 1) * cout] = wq[dh + 1, dw + 1, c]
    # per-column epilogue: groups all share the per-co scale/bias
    scale = np.tile(np.asarray(s_w, np.float32), 4) * (s_in / s_out)
    bias = np.tile(np.asarray(b, np.float32), 4) / s_out
    return wk, scale.astype(np.float32), bias.astype(np.float32)


def expand_stage0_weights(wk: np.ndarray, ht: int) -> np.ndarray:
    """Band-roll Wk into the per-block GEMM operand Wb (18*rows, ht*256):

    Wb[p*rows + 4*y + j, y*256 + n] = Wk[p*8 + j, n]

    i.e. output row y of the block reads its 8-lane window of every
    piece via the weights' zero structure — the kernel runs ONE GEMM per
    block with no per-row operand assembly.
    """
    rows = 4 * ht + 8
    wb = np.zeros((_N_PIECES * rows, ht * 256), np.int8)
    for y in range(ht):
        for p in range(_N_PIECES):
            wb[p * rows + 4 * y:p * rows + 4 * y + _BAND,
               y * 256:(y + 1) * 256] = wk[p * _BAND:(p + 1) * _BAND]
    return wb


def _stage0_kernel(xb_ref, halo_ref, w_ref, scale_ref, bias_ref, s_ref,
                   out_ref, bmat, tsc, *, ht, wlanes, act):
    rows = 4 * ht + 8
    # window: above-halo row + block rows + below-halo row  (4*ht+2, W*3)
    xwin = jnp.concatenate(
        [halo_ref[0, 0, 0:1], xb_ref[0], halo_ref[0, 0, 1:2]], axis=0)
    xq = jnp.clip(jnp.round(xwin / s_ref[0, 0]), -QMAX, QMAX)
    xq = xq.astype(jnp.int8)
    # pad: 6 junk rows complete the last output row's 8-lane band (they
    # hit all-zero weight rows); 12 cols each side = x-block shift halo
    # (SAME padding).
    xq = jnp.pad(xq, ((0, 6), (12, 12)))
    # materialize the transpose through a scratch: strided gathers from
    # the lazy transposed layout re-derive it per extract otherwise
    tsc[:] = xq.T                                   # (12+W*3+12, rows)
    v = tsc[:].reshape(wlanes // 12 + 2, 12, rows)  # (106, 12, rows)
    for p, (s, m) in enumerate(_PIECES):
        bmat[:, rows * p:rows * (p + 1)] = v[1 + s:105 + s, m, :]

    acc = jnp.dot(bmat[:], w_ref[:],
                  preferred_element_type=jnp.int32)  # (104, ht*256)
    for y in range(ht):
        ay = jax.lax.slice(acc, (0, 256 * y), (104, 256 * y + 256))
        # 2x2/s2 maxpool first, on int32 (exact: scale > 0 and the f32
        # epilogue + round/clip are monotone per channel): 4 pool-major
        # position groups of 64 channels
        am = jnp.maximum(
            jnp.maximum(jax.lax.slice(ay, (0, 0), (104, 64)),
                        jax.lax.slice(ay, (0, 64), (104, 128))),
            jnp.maximum(jax.lax.slice(ay, (0, 128), (104, 192)),
                        jax.lax.slice(ay, (0, 192), (104, 256))))
        yf = am.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        if act == "leaky":
            yf = jnp.where(yf > 0, yf, LEAKY_SLOPE * yf)
        elif act == "relu":
            yf = jnp.maximum(yf, 0.0)
        yf = jnp.clip(jnp.round(yf), -QMAX, QMAX)
        out_ref[0, y] = yf.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("act", "ht", "interpret"))
def stage0_fused(
    x: jnp.ndarray,             # (N, 416, 416, 3) f32 raw input
    wb: jnp.ndarray,            # (18*(4*ht+8), ht*256) expand_stage0_weights
    scale: jnp.ndarray,         # (64,) f32 (includes s_in/s_out)
    bias: jnp.ndarray,          # (64,) f32 (includes 1/s_out)
    s_in,                       # f32 scalar: input activation scale
    act: str = "leaky",
    ht: int = 4,                # output rows per grid block (104 % ht == 0;
                                # 4*ht % 8 == 0)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One-HBM-pass stage 0; returns (N, 104, 104, 64) int8 = fold-2
    layout of maxpool2x2(conv1(x)) requantized to s_out."""
    if interpret is None:
        interpret = _interpret_default()
    n, h, w, c = x.shape
    assert (h, w, c) == (416, 416, 3), x.shape
    rows = 4 * ht + 8
    assert wb.shape == (_N_PIECES * rows, ht * 256), (wb.shape, ht)
    wl = w * c                                       # 1248 lanes
    xr = x.reshape(n, h, wl)
    nb = 104 // ht
    rblk = 4 * ht                                    # raw rows per block
    # halo rows: [block_start - 1] and [block_end] (zero at the edges)
    xp = jnp.pad(xr, ((0, 0), (1, 1), (0, 0)))       # rows -1 and 416
    top = xp[:, 0:416:rblk][:, :nb]                  # (N, nb) row -1 of blk
    bot = xp[:, rblk + 1::rblk][:, :nb]              # (N, nb) row end of blk
    halo = jnp.stack([top, bot], axis=2)             # (N, nb, 2, wl)

    s = jnp.asarray(s_in, jnp.float32).reshape(1, 1)
    scale2 = scale.reshape(1, 64)
    bias2 = bias.reshape(1, 64)

    kernel = functools.partial(_stage0_kernel, ht=ht, wlanes=wl, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, rblk, wl), lambda nn, ii: (nn, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, wl), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_PIECES * rows, ht * 256),
                         lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda nn, ii: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, 104, 64),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 104, 104, 64), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((104, _N_PIECES * rows), jnp.int8),
            pltpu.VMEM((wl + 24, rows), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 104 * 104 * _N_PIECES * rows * 256,
            bytes_accessed=int(xr.size * 4 + n * 104 * 104 * 64),
            transcendentals=0),
        interpret=interpret,
    )(xr, halo, wb, scale2, bias2, s)
    return out


def stage0_params(wq, s_w, b, s_in: float, s_out: float, ht: int = 4):
    """Host-side one-shot: conv1 qparams -> kernel operands."""
    wk, scale, bias = build_stage0_weights(
        np.asarray(wq), np.asarray(s_w), np.asarray(b), s_in, s_out)
    wb = expand_stage0_weights(wk, ht)
    return (jnp.asarray(wb), jnp.asarray(scale), jnp.asarray(bias))


# ---------------------------------------------------------------------------
# v2: shuffle-free formulation (transposed-LHS GEMMs over a row-interleaved
# XLA-side layout) — every in-kernel access is a contiguous slice.
# ---------------------------------------------------------------------------

def build_stage0_weights_v2(wq: np.ndarray, s_w: np.ndarray, b: np.ndarray,
                            s_in: float, s_out: float):
    """conv1 params -> (W (3,128,256) int8, scale (64,), bias (64,)).

    The input is pre-transformed to sublanes (r*12 + m) with m = 3*u + c
    (u = column-within-4-block, c = channel) and lanes = x. For output
    row y the kernel takes the contiguous sublane window starting at
    48*y (72 true K entries + zero-weighted tail to 128) and runs one
    transposed-LHS GEMM per lane shift sigma = s-1 in {-1,0,1}:

      W[s, (o_r+1)*12 + 3*u + c, g*16 + co] = wq[dh+1, dw+1, c, co]
        with dh = o_r - r, dw = (4*(s-1) + u) - q, both in {-1,0,1};
        g pool-major: (r%2*2 + q%2)*4 + (r//2*2 + q//2)

    so the fused 2x2/s2 maxpool is a max over 4 contiguous 64-channel
    slices and the surviving (a*2+b, co) order is the fold-2 layout
    conv2's folded stage consumes.
    """
    wq = np.asarray(wq)
    assert wq.shape == (3, 3, 3, 16), wq.shape
    cout = 16
    w = np.zeros((3, 128, 256), np.int8)
    for s in range(3):
        for o_r in range(-1, 5):
            for u in range(4):
                for c in range(3):
                    krow = (o_r + 1) * 12 + 3 * u + c
                    jc = 4 * (s - 1) + u
                    for r in range(4):
                        dh = o_r - r
                        if dh not in (-1, 0, 1):
                            continue
                        for q in range(4):
                            dw = jc - q
                            if dw not in (-1, 0, 1):
                                continue
                            g = ((r % 2) * 2 + q % 2) * 4 \
                                + (r // 2) * 2 + q // 2
                            w[s, krow, g * cout:(g + 1) * cout] = \
                                wq[dh + 1, dw + 1, c]
    scale = np.tile(np.asarray(s_w, np.float32), 4) * (s_in / s_out)
    bias = np.tile(np.asarray(b, np.float32), 4) / s_out
    return w, scale.astype(np.float32), bias.astype(np.float32)


def _stage0_v2_kernel(xb_ref, halo_ref, w_ref, scale_ref, bias_ref, s_ref,
                      out_ref, *, ht, w4, act):
    # window: 12 halo sublanes (row above) + block + 12 (row below)
    xwin = jnp.concatenate(
        [halo_ref[0, 0, 0], xb_ref[0], halo_ref[0, 0, 1]], axis=0)
    xq = jnp.clip(jnp.round(xwin / s_ref[0, 0]), -QMAX, QMAX)
    xq = xq.astype(jnp.int8)
    # rows: slice window for the last y is [48*(ht-1) .. +128]; pad
    # tail rows (zero weights there) and 1+23 lane cols (SAME padding +
    # lane shifts; x=0's left neighbor and x=w4-1's right are zeros)
    need = 48 * (ht - 1) + 128
    xq = jnp.pad(xq, ((0, need - (48 * ht + 24)), (1, 23)))
    for y in range(ht):
        acc = None
        for s in range(3):
            a = jax.lax.slice(xq, (48 * y, s), (48 * y + 128, s + w4))
            d = jax.lax.dot_general(
                a, w_ref[s], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        # 2x2/s2 maxpool on the int32 accumulator (in VMEM — free of the
        # XLA-side i32 materialization concern; exact: scale > 0 and the
        # epilogue + round/clip are monotone per channel), then the f32
        # epilogue touches only the surviving 64 channels
        am = jnp.maximum(
            jnp.maximum(jax.lax.slice(acc, (0, 0), (w4, 64)),
                        jax.lax.slice(acc, (0, 64), (w4, 128))),
            jnp.maximum(jax.lax.slice(acc, (0, 128), (w4, 192)),
                        jax.lax.slice(acc, (0, 192), (w4, 256))))
        yf = am.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        if act == "leaky":
            yf = jnp.where(yf > 0, yf, LEAKY_SLOPE * yf)
        elif act == "relu":
            yf = jnp.maximum(yf, 0.0)
        yf = jnp.clip(jnp.round(yf), -QMAX, QMAX)
        out_ref[0, y] = yf.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("act", "ht", "interpret"))
def stage0_fused_v2(
    x: jnp.ndarray,             # (N, 416, 416, 3) f32 raw input
    w: jnp.ndarray,             # (3, 128, 256) int8, build_stage0_weights_v2
    scale: jnp.ndarray,         # (64,) f32 (includes s_in/s_out)
    bias: jnp.ndarray,          # (64,) f32 (includes 1/s_out)
    s_in,
    act: str = "leaky",
    ht: int = 8,                # output rows per grid block (104 % ht == 0)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Shuffle-free stage 0; returns (N, 104, 104, 64) int8 = fold-2
    layout of maxpool2x2(conv1(x)) requantized to s_out.

    XLA pre-transform: (N,416,416,3) -> (N, 416*12, 104) with sublane
    (r*12 + 3*u + c) and lane x for raw pixel (r, 4x+u, c) — one f32
    transpose; everything after is contiguous slices + MXU dots.
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, c = x.shape
    assert c == 3 and h % 8 == 0 and wd % 8 == 0, x.shape
    h4, w4 = h // 4, wd // 4
    while h4 % ht:
        ht //= 2
    xt = x.reshape(n, h, w4, 12).transpose(0, 1, 3, 2).reshape(n, h * 12, w4)
    nb = h4 // ht
    sblk = 48 * ht                                   # sublanes per block
    xp = jnp.pad(xt, ((0, 0), (12, 12), (0, 0)))     # halo rows -1 and h
    # halo sublane windows: [block_start - 12, ..) and [block_end, +12)
    top = jnp.stack([xp[:, i * sblk:i * sblk + 12] for i in range(nb)], 1)
    bot = jnp.stack(
        [xp[:, (i + 1) * sblk + 12:(i + 1) * sblk + 24] for i in range(nb)],
        1)
    halo = jnp.stack([top, bot], axis=2)             # (N, nb, 2, 12, w4)

    s = jnp.asarray(s_in, jnp.float32).reshape(1, 1)
    scale2 = scale.reshape(1, 64)
    bias2 = bias.reshape(1, 64)

    kernel = functools.partial(_stage0_v2_kernel, ht=ht, w4=w4, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, sblk, w4), lambda nn, ii: (nn, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 12, w4), lambda nn, ii: (nn, ii, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, 256), lambda nn, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda nn, ii: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w4, 64),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h4, w4, 64), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h4 * w4 * 3 * 128 * 256,
            bytes_accessed=int(xt.size * 4 + n * h4 * w4 * 64),
            transcendentals=0),
        interpret=interpret,
    )(xt, halo, w, scale2, bias2, s)
    return out


def stage0_params_v2(wq, s_w, b, s_in: float, s_out: float):
    """Host-side one-shot: conv1 qparams -> v2 kernel operands."""
    w, scale, bias = build_stage0_weights_v2(
        np.asarray(wq), np.asarray(s_w), np.asarray(b), s_in, s_out)
    return jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias)
