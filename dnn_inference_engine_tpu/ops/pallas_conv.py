"""Row-streaming implicit-im2col Pallas conv kernel + space-to-depth folding.

Motivation (measured on v5e, batch 32): XLA's int8 conv emitter is fast
only at isolated shapes ((52,52,64)->128: 38us) and falls off a cliff
elsewhere (conv1 416x416x3->16: ~7.8ms vs a ~130us bandwidth floor;
conv2 208x208x16->32: ~4.4ms). The reference's answer at this tier was a
hand-written AVX/CUDA GEMM (SURVEY.md K3/K5); ours is this kernel plus an
exact space-to-depth reformulation of the early layers.

The kernel (conv3x3_rs):
- NHWC int8 activations, spatially pre-padded: W rounded up to a
  sublane-tileable width, channels padded to a lane-tileable multiple of
  128 (zero channels multiply zero weight rows — exact);
- the grid streams row-tiles; the 2 halo rows each tile needs beyond its
  block are delivered as a second, pre-extracted input (BlockSpec cannot
  express overlapping blocks; a (nblocks, 2, W, C) side tensor can) —
  the standard pallas pipeline double-buffers both;
- the 3x3 patch matrix A_cat (Ht*W32, 9*C) is assembled in VMEM (lane
  offsets are 128-aligned because C is), then hits the MXU as ONE int8
  GEMM against the resident (9*C, Cout) weight matrix;
- the epilogue fuses dequant + bias + leaky-ReLU + requantize AND the
  following maxpool: 'pool2' (spatial 2x2/s2) or 'gmax' (the pooling of
  a folded layer = max over position-channel groups).

Space-to-depth folding (fold_conv3x3_weights, fold f): conv3x3/s1 on
(H, W, Cin) becomes conv3x3/s1 on (H/f, W/f, f^2*Cin) with f^2*Cout
outputs (one per output position in the f x f block). EXACT in int8:
the same multiply-accumulate set reassociated (int32 accumulation is
order-independent); folded SAME padding references only zero rows.
Folds COMPOSE through pooling: pooling a fold-f layer's output by 2x2/s2
(as channel group-max) yields exactly the fold-(f/2) layout of the
pooled tensor — so YOLOv2-tiny's conv1(f=8) -> pool -> conv2(f=4) ->
pool -> conv3(f=2) -> pool all run at a constant 52x52 spatial grid with
MXU-dense channel counts. See runtime/plan.py for the pipeline assembly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

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


# ---------------------------------------------------------------------------
# Space-to-depth fold transforms (exact; host/XLA side)
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H/f,W/f,f*f*C), channel order (p, q, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    n, h, w, c = x.shape
    c0 = c // (f * f)
    x = x.reshape(n, h, w, f, f, c0)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * f, w * f, c0)


def _fold_group(r: int, s: int, f: int, pool_major: bool) -> int:
    """Output channel group for position (r, s).

    pool_major orders groups (u, v, a, b) where r = 2a+u, s = 2b+v: the 4
    pooling operands of every (a, b) become 4 large contiguous channel
    slices, so the fused group-max is 3 wide vector maxes instead of many
    sub-tile lane slices (measured: the small-co slice form dominated the
    kernel on conv1/conv2 shapes).
    """
    if not pool_major:
        return r * f + s
    fo = f // 2
    a, u = r // 2, r % 2
    b, v = s // 2, s % 2
    return (u * 2 + v) * fo * fo + a * fo + b


def fold_conv3x3_weights(w: np.ndarray, f: int = 2,
                         pool_major: bool = False) -> np.ndarray:
    """(3,3,Cin,Cout) -> (3,3,f^2*Cin,f^2*Cout) folded weights.

    Wf[di+1, dj+1, (p*f+q)*Cin+c, (r*f+s)*Cout+co] = W[dh+1, dw+1, c, co]
    with dh = f*di + p - r, dw = f*dj + q - s when both lie in {-1,0,1}
    (zero otherwise). Output channel group (r*f+s) holds the conv output
    at position (r, s) inside each f x f block.
    """
    assert w.shape[0] == w.shape[1] == 3
    cin, cout = int(w.shape[2]), int(w.shape[3])
    w = np.asarray(w)
    wf = np.zeros((3, 3, f * f * cin, f * f * cout), w.dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for p in range(f):
                for q in range(f):
                    for r in range(f):
                        for s in range(f):
                            dh = f * di + p - r
                            dw = f * dj + q - s
                            if dh in (-1, 0, 1) and dw in (-1, 0, 1):
                                g = _fold_group(r, s, f, pool_major)
                                wf[di + 1, dj + 1,
                                   (p * f + q) * cin:(p * f + q + 1) * cin,
                                   g * cout:(g + 1) * cout] \
                                    = w[dh + 1, dw + 1]
    return wf


def shift_space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Shifted s2d for the k=2 folded formulation: pad 1 row/col of the
    SAME halo on the top/left (and f-1 zeros bottom/right to complete the
    blocks), then fold. Output (N, H/f+1, W/f+1, f*f*C); block i holds
    original rows f*i-1 .. f*i+f-2."""
    x = jnp.pad(x, ((0, 0), (1, f - 1), (1, f - 1), (0, 0)))
    return space_to_depth(x, f)


def fold_conv3x3_k2_weights(w: np.ndarray, f: int,
                            pool_major: bool = False) -> np.ndarray:
    """(3,3,Cin,Cout) -> (2,2,f^2*Cin,f^2*Cout) folded weights for the
    shifted layout (shift_space_to_depth): with block i starting at
    original row f*i-1, tap (di,dj) in {0,1}^2 uses
    dh = f*di + p - 1 - r (valid when in {-1,0,1}).

    A 2x2 folded kernel covers 2f rows >= f+2 needed (f >= 2), cutting
    the fold's MAC inflation from (3f)^2/9/f^2 = f^2... to 4f^2/9 per
    f^2 outputs — i.e. k2 computes 4*f^2*Cin MACs per output vs 9*f^2*Cin
    for k3: a 2.25x reduction.
    """
    assert w.shape[0] == w.shape[1] == 3 and f >= 2
    cin, cout = int(w.shape[2]), int(w.shape[3])
    w = np.asarray(w)
    wf = np.zeros((2, 2, f * f * cin, f * f * cout), w.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for p in range(f):
                for q in range(f):
                    for r in range(f):
                        for s in range(f):
                            dh = f * di + p - 1 - r
                            dw = f * dj + q - 1 - s
                            if dh in (-1, 0, 1) and dw in (-1, 0, 1):
                                g = _fold_group(r, s, f, pool_major)
                                wf[di, dj,
                                   (p * f + q) * cin:(p * f + q + 1) * cin,
                                   g * cout:(g + 1) * cout] \
                                    = w[dh + 1, dw + 1]
    return wf


def fold_group_pool_channels(y: jnp.ndarray, f: int, cout: int) -> jnp.ndarray:
    """Pool a fold-f layer's output by the original 2x2/s2 maxpool.

    y: (..., f*f*cout) with groups (r*f+s). Positions (r,s)=(2a+u,2b+v)
    pool over (u,v), giving (..., (f/2)^2*cout) in fold-(f/2) layout
    (groups (a*(f/2)+b)) — exactly s2d(f/2) of the pooled tensor.
    """
    fo = f // 2
    lead = y.shape[:-1]
    y = y.reshape(*lead, fo, 2, fo, 2, cout)
    y = jnp.max(y, axis=(-4, -2))
    return y.reshape(*lead, fo * fo * cout)


def _qs2d_kernel(xb_ref, s_ref, o_ref, *, ht, w4, c_out):
    # divide by the scale (NOT multiply by a precomputed reciprocal): this
    # matches quantize_act bit-for-bit for every scale, not only scales
    # whose reciprocal is exactly representable
    xv = xb_ref[0]
    if xv.dtype == jnp.uint8:
        # serving wire format: normalize in-kernel exactly like the host
        # path (u.astype(f32) / 255.0, then quantize) — 4x less HBM
        # traffic than shipping f32. Mosaic has no direct u8->f32 cast:
        # bitcast to i8 and undo the wrap (exact for all 256 values).
        iv = xv.view(jnp.int8).astype(jnp.int32)
        iv = jnp.where(iv < 0, iv + 256, iv)
        xv = iv.astype(jnp.float32) / 255.0
    xq = jnp.clip(jnp.round(xv / s_ref[0, 0]),
                  -QMAX, QMAX).astype(jnp.int8)
    # each output row y is exactly the transpose of the contiguous
    # 48-sublane window starting at 48*y of the row-interleaved input:
    # out[y, x, 12p + 3q + c] = raw[4y+p, 4x+q, c] = xt[48y + (12p+3q+c), x]
    for y in range(ht):
        t = jax.lax.slice(xq, (48 * y, 0), (48 * y + 48, w4)).T
        if c_out > 48:
            # lane-pad: zero channels feed zero folded-weight rows (the
            # conv stage wants 64-aligned Cin; see plan.Stage.cin_pad)
            t = jnp.pad(t, ((0, 0), (0, c_out - 48)))
        o_ref[0, y] = t


@functools.partial(jax.jit, static_argnames=("ht", "pad_to", "interpret"))
def quant_space_to_depth4(x: jnp.ndarray, s_in, ht: int = 8,
                          pad_to: int = 0,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused quantize + space_to_depth(4): (N,H,W,3) f32 -> (N,H/4,W/4,48)
    int8, one HBM pass after an XLA f32 row-interleave transpose.

    Replaces the XLA chain quantize_act -> space_to_depth whose s8
    layout-assignment copies cost ~0.7 ms/iter at batch 32 on v5e
    (xplane-measured); this path A/B'd at ~0.5x that, bit-exact.

    ``pad_to``: emit this many channels (>48), the extra lanes zero —
    feeds conv stages that want 64-aligned Cin without a separate pad.
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, c = x.shape
    assert c == 3 and h % 8 == 0 and wd % 8 == 0, x.shape
    assert x.dtype in (jnp.float32, jnp.uint8), x.dtype
    c_out = max(pad_to, 48)
    h4, w4 = h // 4, wd // 4
    while h4 % ht:
        ht //= 2
    xt = x.reshape(n, h, w4, 12).transpose(0, 1, 3, 2).reshape(n, h * 12, w4)
    s = jnp.asarray(s_in, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_qs2d_kernel, ht=ht, w4=w4, c_out=c_out),
        grid=(n, h4 // ht),
        in_specs=[
            pl.BlockSpec((1, 48 * ht, w4), lambda nn, ii: (nn, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda nn, ii: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w4, c_out),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h4, w4, c_out), jnp.int8),
        interpret=interpret,
    )(xt, s)


def _stem_k2_kernel(xb_ref, halo_ref, w_ref, scale_ref, bias_ref, s_ref,
                    o_ref, acat, *, ht, w4, wout, cin, kpad, cout, act, go,
                    exact_u8=False, tw=1):
    """Fused stage-0: quantize (u8/f32) + shifted s2d(4) + 2x2 folded conv
    + dequant/bias/act/requant + pool-major group-max, one HBM pass.

    xb_ref (1, 48*ht, w4): row-interleaved input block — sublane 48*y+l
    holds folded row y's packed (p*12+q*3+c) element l (the same layout
    quant_space_to_depth4 consumes). halo_ref: folded row ht of this
    block (2x2 VALID conv needs ht+1 input rows per ht output rows).

    exact_u8: EXACT uint8 ingestion — layer-0 input scale is fixed at
    1/255 so the codes are u - 128 with zero quantization error (no
    divide/round/clip at all); the +128 offset times the per-channel
    weight row-sums is folded into ``bias`` by the caller. Zero-padded
    halo pixels are exact too: u=0 contributes (v+128) = 0.
    """
    def quant(xv):
        if exact_u8:
            # u - 128 == int8-bitcast(u XOR 0x80), one VPU op
            return jnp.bitwise_xor(xv, jnp.uint8(0x80)).view(jnp.int8)
        if xv.dtype == jnp.uint8:
            # wire format: normalize in-kernel (see _qs2d_kernel)
            iv = xv.view(jnp.int8).astype(jnp.int32)
            iv = jnp.where(iv < 0, iv + 256, iv)
            xv = iv.astype(jnp.float32) / 255.0
        return jnp.clip(jnp.round(xv / s_ref[0, 0]),
                        -QMAX, QMAX).astype(jnp.int8)

    xq = jnp.concatenate([quant(xb_ref[0]), quant(halo_ref[0, 0])], axis=0)

    k = 4 * cin
    if kpad != k:
        acat[:, k:] = jnp.zeros((ht * wout, kpad - k), jnp.int8)
    # ``tw`` folded rows per transpose; each transposed window feeds up
    # to 4 A_cat taps per row it contains. (One whole-block transpose
    # was A/B'd and LOSES: 0.78 vs 0.52-0.66 ms at batch 32 — Mosaic
    # handles small/medium transposes better than one (48*(ht+1), w4).)
    assert (ht + 1) % tw == 0, (ht, tw)
    ts = {}
    for g in range((ht + 1) // tw):
        ts[g] = jax.lax.slice(xq, (48 * tw * g, 0),
                              (48 * tw * (g + 1), w4)).T  # (w4, 48*tw)
    for y in range(ht + 1):
        g, o = y // tw, (y % tw) * 48
        for dh in (0, 1):
            yo = y - dh
            if not 0 <= yo < ht:
                continue
            for dw in (0, 1):
                j = dh * 2 + dw
                acat[yo * wout:(yo + 1) * wout,
                     j * cin:j * cin + 48] = \
                    jax.lax.slice(ts[g], (dw, o), (dw + wout, o + 48))
    if cin > 48:
        for j in range(4):
            acat[:, j * cin + 48:(j + 1) * cin] = jnp.zeros(
                (ht * wout, cin - 48), jnp.int8)

    acc = jnp.dot(acat[:, :], w_ref[:],
                  preferred_element_type=jnp.int32)     # (ht*wout, cout)
    # group-max FIRST, on the int32 accumulator: the epilogue params are
    # identical across the 4 pool groups (pool-major fold tiles the same
    # per-channel s_w/bias into each go-slice) and dequant+bias+leaky+
    # round+clip is monotonic non-decreasing (scale > 0), so max commutes
    # with the epilogue EXACTLY — and the f32 VPU work drops 4x (the
    # epilogue over the pre-gmax tensor dominated this kernel: ~0.9 ms
    # serialized after a ~0.12 ms matmul at batch 32 on v5e).
    # (Splitting the GEMM into two 128-lane halves maxed as they land —
    # so the full (M,256) i32 acc never materializes — measured NEUTRAL:
    # 0.71-0.73 vs 0.72-0.76 ms; Mosaic already register-blocks this.)
    mt = ht * wout
    acc = jnp.maximum(
        jnp.maximum(jax.lax.slice(acc, (0, 0), (mt, go)),
                    jax.lax.slice(acc, (0, go), (mt, 2 * go))),
        jnp.maximum(jax.lax.slice(acc, (0, 2 * go), (mt, 3 * go)),
                    jax.lax.slice(acc, (0, 3 * go), (mt, 4 * go))))
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if act == "leaky":
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -QMAX, QMAX)
    o_ref[:] = y.reshape(ht, wout, go).astype(jnp.int8)[None]


@functools.partial(jax.jit,
                   static_argnames=("act", "ht", "exact_u8", "tw",
                                    "interpret"))
def stem_fused_k2(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray, s_in,
                  act: str = "leaky", ht: int = 0, exact_u8: bool = False,
                  tw: int = 0,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """Whole stage-0 pipeline in ONE Pallas kernel for a 3x3/s1 conv +
    2x2/s2 maxpool stem at fold f=4 (YOLOv2/v3-tiny conv1).

    x: (N, H, W, 3) uint8 (serving wire) or f32 in [0,1], H, W % 8 == 0.
    w: (2, 2, C, 16*Cout1) int8 — fold_conv3x3_k2_weights(w1, 4,
       pool_major=True), Cin lane-padded to C (48 or 64).
    scale: (16*Cout1,) f32 = s_in * tile(s_w) / s_out;
    bias:  (16*Cout1,) f32 = tile(b) / s_out.
    Returns (N, H/4, W/4, 4*Cout1) int8 — the requantized, pooled output
    in pool-major fold-2 layout, exactly what the fold_xla_k2 stage emits.

    Vs the fold_xla_k2 XLA chain (pad + quant_space_to_depth4 + int8 conv
    + f32 epilogue + requant + gmax) this reads the raw input once and
    writes only the folded pooled output: the folded s8 input (23 MB at
    batch 32) and the pre-gmax s8 tensor (89 MB) never touch HBM.
    """
    if interpret is None:
        interpret = _interpret_default()
    f = 4
    n, h, wd, c = x.shape
    assert c == 3 and h % 8 == 0 and wd % 8 == 0, x.shape
    assert x.dtype in (jnp.float32, jnp.uint8), x.dtype
    assert not exact_u8 or x.dtype == jnp.uint8, (
        "exact_u8 ingestion needs the uint8 wire format")
    cin, coutf = int(w.shape[2]), int(w.shape[3])
    assert w.shape[:2] == (2, 2) and cin >= 48 and coutf % 4 == 0
    go = coutf // 4
    hout, wout = h // f, wd // f
    # shifted-fold halo: 1 top/left (SAME), 2f-1 bottom/right (completes
    # blocks; the conv's junk output row/col is simply never emitted)
    xp = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1), (0, 0)))
    hp, w4 = h + 2 * f, (wd + 2 * f) // f
    # row-interleave so each folded row is a contiguous 48-sublane window
    xt = xp.reshape(n, hp, w4, 12).transpose(0, 1, 3, 2).reshape(
        n, hp * 12, w4)

    if not ht:
        # ht 13/26/52 measure within relay noise of each other on v5e
        # (interleaved medians 0.52-0.71 ms at batch 32); 13 edges the
        # medians and needs the least VMEM — keep it first.
        for cand in (13, 26, 52, 8, 4, 2, 1):
            if hout % cand == 0 and cand * wout * (4 * cin + 8 * coutf) \
                    < 13_000_000:
                ht = cand
                break
        if not ht:
            raise ValueError(
                f"stem_fused_k2: no row-block height fits VMEM for "
                f"hout={hout}, wout={wout}, cin={cin}, cout={coutf}: even "
                f"ht=1 needs {wout * (4 * cin + 8 * coutf)} B (> 13 MB "
                f"bound); shrink the input or use the XLA path")
    assert hout % ht == 0, (hout, ht)
    if not tw:
        # folded rows per in-kernel transpose: fewer, wider transposes
        # measure ~4% faster (tw=2/7: 0.72-0.73 ms vs 0.76 at tw=1,
        # batch 32 v5e interleaved medians)
        tw = next(c for c in (7, 3, 2, 1) if (ht + 1) % c == 0)
    nb = hout // ht
    xblk = xt[:, :48 * hout]
    halo = jnp.stack([xt[:, 48 * ht * (i + 1):48 * ht * (i + 1) + 48]
                      for i in range(nb)], axis=1)   # (N, nb, 48, w4)

    k = 4 * cin
    kpad = _round_up(k, 128)
    wmat = jnp.asarray(w).reshape(k, coutf)
    if kpad != k:
        wmat = jnp.pad(wmat, ((0, kpad - k), (0, 0)))
    # the kernel group-maxes the i32 accumulator before the epilogue, so
    # it only needs the (identical) params of the first pool group
    scale2 = scale.astype(jnp.float32)[:go].reshape(1, go)
    bias2 = bias.astype(jnp.float32)[:go].reshape(1, go)
    s = jnp.asarray(s_in, jnp.float32).reshape(1, 1)

    return pl.pallas_call(
        functools.partial(_stem_k2_kernel, ht=ht, w4=w4, wout=wout,
                          cin=cin, kpad=kpad, cout=coutf, act=act, go=go,
                          exact_u8=exact_u8, tw=tw),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 48 * ht, w4), lambda nn, ii: (nn, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 48, w4), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, coutf), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, go), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, go), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda nn, ii: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wout, go),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hout, wout, go), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ht * wout, kpad), jnp.int8),    # A_cat
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hout * wout * kpad * coutf,
            bytes_accessed=int(xblk.size * xblk.dtype.itemsize
                               + halo.size * halo.dtype.itemsize
                               + wmat.size * wmat.dtype.itemsize
                               + n * hout * wout * go),
            transcendentals=0),
        interpret=interpret,
    )(xblk, halo, wmat, scale2, bias2, s)


def _shift_s2d2_kernel(xb_ref, o_ref, *, ht, w2, c):
    """One output row y packs input rows (2y, 2y+1) of the padded
    tensor: out[y, x, (p*2+q)*c + ch] = xpad[2y+p, 2x+q, ch].

    The input block arrives with adjacent column PAIRS merged into the
    lane dim — (2ht, w2, 2c), a free row-major XLA reshape outside the
    kernel — so the column-parity extraction is a plain lane slice.
    The row-parity reshape splits the LEADING dim only. Both in-kernel
    sublane-splitting forms were TPU-verified REJECTED by Mosaic's
    tpu.reshape: `(1x1x106x32)->(53x2x32)` (2D sublane split) and
    `(28x1x106x32)->(1484x2x32)` (flatten-then-split with c=32 lanes).
    Rows pair exactly (stride 2, 2 taps), so blocks of ht output rows
    read exactly 2*ht input rows — no halo, no transposes, pure VMEM
    data movement."""
    xw = xb_ref[0]                                         # (2ht, w2, 2c)
    for p in (0, 1):
        rows = xw.reshape(ht, 2, w2, 2 * c)[:, p]          # (ht, w2, 2c)
        for q in (0, 1):
            o_ref[0, :, :, (p * 2 + q) * c:(p * 2 + q + 1) * c] = (
                rows[:, :, q * c:(q + 1) * c])


@functools.partial(jax.jit, static_argnames=("ht", "interpret"))
def shift_s2d2_pallas(x: jnp.ndarray, ht: int = 0,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused pad + SHIFTED space_to_depth(2) in one Pallas pass:
    (N, H, W, C) int8 -> (N, roundup(H/2+1, 8), W/2+1, 4C); rows
    [:H/2+1] are identical to
    ``space_to_depth(jnp.pad(x, ((0,0),(1,1),(1,1),(0,0))), 2)``
    — i.e. the exact input layout the fold_xla_k2 f=2 stage consumes
    (1 SAME-halo row/col top/left, 1 block-completing zero row/col
    bottom/right) — and the trailing rows are zeros (junk row blocks so
    the grid isn't forced to ht=1 when H/2+1 is prime, e.g. 53; the
    consumer's VALID conv trims to H/2 output rows either way).

    Motivation (round-3 gap attribution, docs/GAP_ATTRIB.json): the XLA
    pad+reshape+transpose chain for this relayout costs ~0.27 ms in
    context at (32,104,104,32) on v5e — the single largest boundary
    overhead in the executed plan — while the data movement floor is
    ~30 us. This kernel is pure VMEM movement: no transposes (channels
    stay lanes), no halo (stride-2 row pairs tile exactly).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, c = x.shape
    assert h % 2 == 0 and wd % 2 == 0, x.shape
    hout, wout = h // 2 + 1, wd // 2 + 1
    # hout is often prime (104 -> 53): emit junk ZERO rows up to a
    # multiple of 8 so the grid gets real row blocks instead of ht=1
    # (the consumer's VALID conv output rows >= h/2 are trimmed anyway,
    # and zero input rows make them well-defined)
    hout_p = _round_up(hout, 8)
    # pad: 1 top/left halo + 1 bottom/right to complete blocks (+ the
    # junk rows); then merge adjacent column pairs into the lane dim —
    # a free row-major reshape that makes the in-kernel column-parity
    # extraction a lane slice (see _shift_s2d2_kernel)
    xp = jnp.pad(x, ((0, 0), (1, 2 * hout_p - h - 1), (1, 1), (0, 0)))
    wp = wd + 2
    w2 = wp // 2
    xp = xp.reshape(n, 2 * hout_p, w2, 2 * c)
    if not ht:
        for cand in (28, 14, 8, 7, 4, 2, 1):
            if hout_p % cand == 0 and cand * wp * c * 6 < 8_000_000:
                ht = cand
                break
    assert ht and hout_p % ht == 0, (hout_p, ht)
    return pl.pallas_call(
        functools.partial(_shift_s2d2_kernel, ht=ht, w2=w2, c=c),
        grid=(n, hout_p // ht),
        in_specs=[
            pl.BlockSpec((1, 2 * ht, w2, 2 * c),
                         lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wout, 4 * c),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hout_p, wout, 4 * c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=int(2 * n * hout_p * wout * 4 * c
                               * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp)


def _gs2_kernel(xb_ref, halo_ref, o_ref, *, ht, w2, go):
    """Fused pool-major group-max + SHIFTED space_to_depth(2) pack.

    xb (1, 2ht, w2, 8*go): the pre-gmax fold-2 conv output with adjacent
    column PAIRS merged into lanes (free XLA reshape of the default
    layout): lane block cp*4*go + k*go + c = pool group k, channel c of
    column 2x+cp. halo (1, 1, w2, 8*go): the row BELOW this block (the
    caller's top pad puts output row 0's row-above inside the block).

    Output (1, ht, w2+1, 4*go): out[y, xo, (p*2+q)*go + c] =
    gmax[2y+p-1, 2xo+q-1, c] — exactly shift_space_to_depth(gmax, 2),
    the fold_xla_k2 f=2 consumer's input layout. Boundary reads (row -1,
    col -1, col W) hit the SAME-halo zeros provided by the caller's pad.
    """
    four = 4 * go

    def gmax(v):
        # per column-parity half: max over the 4 pool groups' go-slices.
        # i32 upcast: Mosaic cannot legalize arith.maxsi on int8 vectors
        # (packed-byte lanes), while i32 max lowers fine — same trick as
        # the stem kernels' group-max-on-the-accumulator.
        outs = []
        for cp in (0, 1):
            m = None
            for k in range(4):
                s = jax.lax.slice_in_dim(v, cp * four + k * go,
                                         cp * four + (k + 1) * go, axis=-1
                                         ).astype(jnp.int32)
                m = s if m is None else jnp.maximum(m, s)
            outs.append(m.astype(jnp.int8))
        return jnp.concatenate(outs, axis=-1)      # (..., w2, 2*go)

    v = jnp.concatenate([gmax(xb_ref[0]), gmax(halo_ref[0, 0])],
                        axis=0)                    # (2ht+1, w2, 2*go)
    # assemble via direct ref stores: Mosaic's concatenate rejects
    # operands whose internal (sublane, lane) offsets differ ("offset
    # mismatch on non-concat dimension"), which the pad+lane-slice
    # pieces here inevitably have; per-group stores sidestep it
    zcol = jnp.zeros((ht, 1, go), jnp.int8)
    for p in (0, 1):
        rows = jax.lax.slice(v, (p, 0, 0), (p + 2 * ht, w2, 2 * go))
        rows = rows.reshape(ht, 2, w2, 2 * go)[:, 0]   # (ht, w2, 2*go)
        # q=1: out col xo <- gmax col 2*xo (parity 0); col w2 is the
        # right SAME-halo zero
        g1 = (2 * p + 1) * go
        o_ref[0, :, 0:w2, g1:g1 + go] = jax.lax.slice(
            rows, (0, 0, 0), (ht, w2, go))
        o_ref[0, :, w2:w2 + 1, g1:g1 + go] = zcol
        # q=0: out col xo <- gmax col 2*xo - 1 (parity 1, shifted right
        # by one); col 0 is the left SAME-halo zero
        g0 = 2 * p * go
        o_ref[0, :, 1:w2 + 1, g0:g0 + go] = jax.lax.slice(
            rows, (0, 0, go), (ht, w2, 2 * go))
        o_ref[0, :, 0:1, g0:g0 + go] = zcol


@functools.partial(jax.jit, static_argnames=("go", "ht", "interpret"))
def gmax_shift_s2d2(y: jnp.ndarray, go: int, ht: int = 0,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused group-max + shifted space_to_depth(2), one Pallas pass.

    y: (N, H, W, 4*go) int8 — a fold-2 conv stage's requantized
    PRE-group-max output (pool-major groups). Returns
    (N, roundup(H/2+1, 8), W/2+1, 4*go) int8 whose rows [:H/2+1] equal
    ``shift_space_to_depth(gmax(y), 2)`` — i.e. exactly what the
    following fold_xla_k2 f=2 stage consumes — with zero junk rows
    beyond (the consumer's VALID conv trims to H/2 rows).

    Round-4 xplane attribution (docs/TRACE_ATTRIB_r04.json): the XLA
    group-max fusion (235 us), its {1,3,2,0} boundary relayout (146 us)
    and the shift_s2d2_pallas input chain (96+35+44 us) total ~556 us
    in-context at the conv2->conv3 seam — against a ~70 us bandwidth
    floor for this op's traffic (read 44 MB + write 6 MB at batch 32).
    This kernel does the whole seam in one pass; the column-pair lane
    merge happens in the free XLA reshape of the conv's default-layout
    output (in-kernel sublane->lane reshapes are Mosaic-rejected, see
    _shift_s2d2_kernel).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, c = y.shape
    assert c == 4 * go and h % 2 == 0 and wd % 2 == 0, (y.shape, go)
    w2 = wd // 2
    wout = w2 + 1
    hout = h // 2 + 1
    hout_p = _round_up(hout, 8)
    # column-pair lane merge (free in default layout), then pad: 1 zero
    # row on top (the p=0 row -1 SAME halo) + zeros below through the
    # junk rows, +1 row so every block's halo row exists
    yr = y.reshape(n, h, w2, 2 * c)
    yr = jnp.pad(yr, ((0, 0), (1, 2 * hout_p - h), (0, 0), (0, 0)))
    if not ht:
        for cand in (8, 4, 2, 1):
            if hout_p % cand == 0 and (2 * cand + 1) * w2 * 2 * c * 3 \
                    < 9_000_000:
                ht = cand
                break
    assert ht and hout_p % ht == 0, (hout_p, ht)
    nb = hout_p // ht
    xblk = yr[:, :2 * hout_p]
    # block i holds padded rows [2ht*i, 2ht*(i+1)); its halo is the one
    # row below, 2ht*(i+1)
    halo = jnp.stack([yr[:, 2 * ht * (i + 1):2 * ht * (i + 1) + 1]
                      for i in range(nb)], axis=1)  # (N, nb, 1, w2, 2c)
    return pl.pallas_call(
        functools.partial(_gs2_kernel, ht=ht, w2=w2, go=go),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 2 * ht, w2, 2 * c),
                         lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w2, 2 * c),
                         lambda nn, ii: (nn, ii, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wout, c),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hout_p, wout, c), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=int(xblk.size + halo.size
                               + n * hout_p * wout * c),
            transcendentals=0),
        interpret=interpret,
    )(xblk, halo)


def _stem_dg_kernel(xb_ref, halo_ref, w_ref, scale_ref, bias_ref, s_ref,
                    o_ref, *, ht, w4, wout, act, go, coutf,
                    exact_u8=False):
    """Transpose-free fused stem: per-tap ``dot_general`` contracting the
    SUBLANE (folded-channel) axis directly.

    Same contract as _stem_k2_kernel, different GEMM formulation: instead
    of transposing folded rows and assembling an (ht*wout, 4*cin) A_cat
    scratch, each of the 4 (dh, dw) taps contracts the interleaved input
    view (ht, 48, wout-lanes) against its (48, coutf) weight slab —
    lhs dim 1 x rhs dim 0 — and the 4 int32 results accumulate. No
    in-kernel transposes, no A_cat scratch, no K-padding (the k2 path
    pads K 192->256, wasting 25% of its MXU work).
    """
    def quant(xv):
        if exact_u8:
            return jnp.bitwise_xor(xv, jnp.uint8(0x80)).view(jnp.int8)
        if xv.dtype == jnp.uint8:
            iv = xv.view(jnp.int8).astype(jnp.int32)
            iv = jnp.where(iv < 0, iv + 256, iv)
            xv = iv.astype(jnp.float32) / 255.0
        return jnp.clip(jnp.round(xv / s_ref[0, 0]),
                        -QMAX, QMAX).astype(jnp.int8)

    xq = jnp.concatenate([quant(xb_ref[0]), quant(halo_ref[0, 0])], axis=0)
    acc = None
    for dh in (0, 1):
        lhs = jax.lax.slice(
            xq, (48 * dh, 0), (48 * (dh + ht), w4)).reshape(ht, 48, w4)
        for dw in (0, 1):
            lhs2 = jax.lax.slice(lhs, (0, 0, dw), (ht, 48, dw + wout))
            a = jax.lax.dot_general(
                lhs2, w_ref[dh * 2 + dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # (ht, wout, coutf)
            acc = a if acc is None else acc + a
    # group-max FIRST on the int32 accumulator (see _stem_k2_kernel)
    acc = jnp.maximum(
        jnp.maximum(jax.lax.slice(acc, (0, 0, 0), (ht, wout, go)),
                    jax.lax.slice(acc, (0, 0, go), (ht, wout, 2 * go))),
        jnp.maximum(jax.lax.slice(acc, (0, 0, 2 * go), (ht, wout, 3 * go)),
                    jax.lax.slice(acc, (0, 0, 3 * go), (ht, wout, 4 * go))))
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if act == "leaky":
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -QMAX, QMAX)
    o_ref[:] = y.astype(jnp.int8)[None]


@functools.partial(jax.jit,
                   static_argnames=("act", "ht", "exact_u8", "interpret"))
def stem_fused_dg(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray, s_in,
                  act: str = "leaky", ht: int = 0, exact_u8: bool = False,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """stem_fused_k2 with the transpose-free dot_general formulation
    (_stem_dg_kernel). Identical contract and numerics; any cin_pad
    columns of ``w`` are dropped (their input channels are zero).
    """
    if interpret is None:
        interpret = _interpret_default()
    f = 4
    n, h, wd, c = x.shape
    assert c == 3 and h % 8 == 0 and wd % 8 == 0, x.shape
    assert x.dtype in (jnp.float32, jnp.uint8), x.dtype
    assert not exact_u8 or x.dtype == jnp.uint8
    cin, coutf = int(w.shape[2]), int(w.shape[3])
    assert w.shape[:2] == (2, 2) and cin >= 48 and coutf % 4 == 0
    go = coutf // 4
    hout, wout = h // f, wd // f
    xp = jnp.pad(x, ((0, 0), (1, 2 * f - 1), (1, 2 * f - 1), (0, 0)))
    hp, w4 = h + 2 * f, (wd + 2 * f) // f
    xt = xp.reshape(n, hp, w4, 12).transpose(0, 1, 3, 2).reshape(
        n, hp * 12, w4)
    if not ht:
        for cand in (13, 26, 52, 8, 4, 2, 1):
            if hout % cand == 0 and cand * wout * 8 * coutf < 13_000_000:
                ht = cand
                break
        if not ht:
            raise ValueError(
                f"stem_fused_dg: no row-block height fits VMEM for "
                f"hout={hout}, wout={wout}, cout={coutf}")
    assert hout % ht == 0, (hout, ht)
    nb = hout // ht
    xblk = xt[:, :48 * hout]
    halo = jnp.stack([xt[:, 48 * ht * (i + 1):48 * ht * (i + 1) + 48]
                      for i in range(nb)], axis=1)   # (N, nb, 48, w4)
    # (4, 48, coutf) per-tap weight slabs; rows >= 48 are the cin_pad
    # zero channels — dropped (their input lanes don't exist here)
    wtap = jnp.asarray(w)[:, :, :48, :].reshape(4, 48, coutf)
    scale2 = scale.astype(jnp.float32)[:go].reshape(1, go)
    bias2 = bias.astype(jnp.float32)[:go].reshape(1, go)
    s = jnp.asarray(s_in, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_stem_dg_kernel, ht=ht, w4=w4, wout=wout,
                          act=act, go=go, coutf=coutf, exact_u8=exact_u8),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 48 * ht, w4), lambda nn, ii: (nn, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 48, w4), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 48, coutf), lambda nn, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, go), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, go), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda nn, ii: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wout, go),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hout, wout, go), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hout * wout * 4 * 48 * coutf,
            bytes_accessed=int(xblk.size * xblk.dtype.itemsize
                               + halo.size * halo.dtype.itemsize
                               + wtap.size + n * hout * wout * go),
            transcendentals=0),
        interpret=interpret,
    )(xblk, halo, wtap, scale2, bias2, s)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _parity_extract(y3, ht, w32, u, v, cdim):
    """(Ht, W32, C) -> rows of parity u, cols of parity v: (Ht/2, W32/2, C).

    Mosaic-safe: leading-dim splits + static index for BOTH parities.
    (Stride-2 slices are rejected by Mosaic's vector.extract_strided_slice
    verifier — strides must be 1 — and 3D strided slices lower to >2D
    gathers; the flatten-reshape-index form lowers cleanly, TPU-verified.)
    """
    y4 = y3.reshape(ht // 2, 2, w32, cdim)[:, u]
    y5 = y4.reshape(ht // 2 * w32, cdim)
    z = y5.reshape(ht // 2 * w32 // 2, 2, cdim)[:, v]
    return z.reshape(ht // 2, w32 // 2, cdim)


def _conv_rs_kernel(xb_ref, halo_ref, w_ref, scale_ref, bias_ref, out_ref,
                    acat,
                    *, W, W32, Ht, cin, kpad, cout, act, quantize_out,
                    pool, ksize, s2d_out):
    # window = this row-block + the (ksize-1) halo rows below it
    xwin = jnp.concatenate([xb_ref[0], halo_ref[0, 0]], axis=0)

    # assemble the implicit-im2col matrix in VMEM. When cin is already a
    # multiple of 128 every lane write is tile-aligned; otherwise the
    # taps pack densely at true-cin offsets (Mosaic relayouts ref writes
    # from contiguous sources cheaply — measured) so K stays ksize^2*cin
    # instead of ksize^2*roundup(cin,128) (2.7x less MXU work at cin=48).
    k = ksize * ksize * cin
    if kpad != k:
        acat[:, k:] = jnp.zeros((Ht * W32, kpad - k), jnp.int8)
    for dh in range(ksize):
        for dw in range(ksize):
            j = dh * ksize + dw
            sl = jax.lax.slice(xwin, (dh, dw, 0), (dh + Ht, dw + W32, cin))
            acat[:, j * cin:(j + 1) * cin] = sl.reshape(Ht * W32, cin)

    acc = jnp.dot(acat[:, :], w_ref[:],
                  preferred_element_type=jnp.int32)      # (Ht*W32, cout)

    scale_v, bias_v = scale_ref[:], bias_ref[:]
    mt0 = Ht * W32
    if isinstance(pool, tuple) and pool[0] == "gmaxm" and quantize_out:
        # pool-major group-max FIRST, on the int32 accumulator: the
        # epilogue params are identical across the 4 pool groups and
        # dequant+bias+act+round+clip is monotonic non-decreasing
        # (scale > 0), so max commutes exactly — and the f32 VPU work
        # (which serializes after the MXU inside the kernel) drops 4x.
        _, f, co = pool
        go = (f // 2) ** 2 * co
        acc = jnp.maximum(
            jnp.maximum(jax.lax.slice(acc, (0, 0), (mt0, go)),
                        jax.lax.slice(acc, (0, go), (mt0, 2 * go))),
            jnp.maximum(jax.lax.slice(acc, (0, 2 * go), (mt0, 3 * go)),
                        jax.lax.slice(acc, (0, 3 * go), (mt0, 4 * go))))
        scale_v = jax.lax.slice(scale_v, (0, 0), (1, go))
        bias_v = jax.lax.slice(bias_v, (0, 0), (1, go))
        pool = ("gmaxm_done", f, co)

    y = acc.astype(jnp.float32) * scale_v + bias_v
    if act == "leaky":
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    # zero the junk columns (w >= W) so downstream halo pads stay zero
    col = jax.lax.broadcasted_iota(jnp.int32, (Ht * W32, 1), 0) % W32
    y = jnp.where(col < W, y, 0.0)
    if quantize_out:
        y = jnp.clip(jnp.round(y), -QMAX, QMAX)

    # Mosaic supports only simple splits of the sublane dim; express the
    # pools as slice+max instead of multi-dim reshapes.
    mt = Ht * W32
    if isinstance(pool, tuple) and pool[0] == "gmaxm_done":
        # group-max already applied on the i32 accumulator above
        _, f, co = pool
        out = y.reshape(Ht, W32, (f // 2) ** 2 * co)
    elif isinstance(pool, tuple) and pool[0] == "gmaxm":
        # pool-major fold layout: 4 contiguous slices, 3 vector maxes
        _, f, co = pool
        go = (f // 2) ** 2 * co
        y = jnp.maximum(
            jnp.maximum(jax.lax.slice(y, (0, 0), (mt, go)),
                        jax.lax.slice(y, (0, go), (mt, 2 * go))),
            jnp.maximum(jax.lax.slice(y, (0, 2 * go), (mt, 3 * go)),
                        jax.lax.slice(y, (0, 3 * go), (mt, 4 * go))))
        out = y.reshape(Ht, W32, go)
    elif isinstance(pool, tuple) and pool[0] == "gmax":
        _, f, co = pool
        fo = f // 2
        groups = []
        for a in range(fo):
            for b in range(fo):
                m = None
                for u in (0, 1):
                    for v in (0, 1):
                        idx = ((2 * a + u) * f + (2 * b + v)) * co
                        sl = jax.lax.slice(y, (0, idx), (mt, idx + co))
                        m = sl if m is None else jnp.maximum(m, sl)
                groups.append(m)
        y = jnp.concatenate(groups, axis=1) if len(groups) > 1 else groups[0]
        out = y.reshape(Ht, W32, fo * fo * co)
    elif pool == "pool2":
        y3 = y.reshape(Ht, W32, cout)
        out = jnp.maximum(
            jnp.maximum(_parity_extract(y3, Ht, W32, 0, 0, cout),
                        _parity_extract(y3, Ht, W32, 0, 1, cout)),
            jnp.maximum(_parity_extract(y3, Ht, W32, 1, 0, cout),
                        _parity_extract(y3, Ht, W32, 1, 1, cout)))
    elif pool is None:
        out = y.reshape(Ht, W32, cout)
    else:
        raise ValueError(pool)
    if s2d_out:
        # write in space-to-depth(2) layout: the next folded stage reads
        # this directly, eliminating the XLA relayout between stages
        # (profiling showed those transposes cost ~2.2 ms/iter, more than
        # all the conv kernels combined)
        oh, ow, oc = out.shape
        out = jnp.concatenate(
            [_parity_extract(out, oh, ow, u, v, oc)
             for u in (0, 1) for v in (0, 1)], axis=-1)
    out_ref[:] = out.astype(out_ref.dtype)[None]


@functools.partial(
    jax.jit,
    static_argnames=("act", "quantize_out", "pool", "ht", "ksize",
                     "s2d_out", "interpret"))
def conv3x3_rs(
    x: jnp.ndarray,            # (N, H, W, Cin) int8 (NHWC)
    w: jnp.ndarray,            # (k, k, Cin, Cout) int8
    scale: jnp.ndarray,        # (Cout,) f32 folded dequant scale
    bias: jnp.ndarray,         # (Cout,) f32 (already includes /s_out)
    act: str = "leaky",
    quantize_out: bool = True,
    pool: Union[None, str, Tuple] = None,  # None|'pool2'|('gmax'/'gmaxm',f,co)
    ht: int = 0,
    ksize: int = 3,
    s2d_out: bool = False,      # emit output in s2d(2) fold layout
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused conv (+ pool) via the row-streaming Pallas kernel.

    ksize=3: 3x3/s1/SAME conv (halo zero-padding inserted here).
    ksize=2: 2x2/s1/VALID conv over a shift_space_to_depth folded input
             (fold_conv3x3_k2_weights); output spatial = input - 1.

    Output: pool None -> (N,Ho,Wo,Cout); 'pool2' -> (N,Ho/2,Wo/2,Cout);
    ('gmax', f, co) -> (N,Ho,Wo,(f/2)^2*co).
    """
    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, cin0 = x.shape
    assert w.shape[:3] == (ksize, ksize, cin0), (w.shape, x.shape)
    cout = int(w.shape[3])
    h_out = h if ksize == 3 else h - 1
    w_out = wd if ksize == 3 else wd - 1

    # A_cat packs taps densely at true-cin lane offsets; only the GEMM
    # depth pads to a 128 multiple (zero rows in the weights — exact).
    cin = cin0
    del cin0
    k = ksize * ksize * cin
    kpad = _round_up(k, 128)
    if kpad != k:
        w = w.reshape(k, cout)
        w = jnp.pad(w, ((0, kpad - k), (0, 0)))

    w32 = _round_up(w_out, 64 if (pool == "pool2" or s2d_out) else 32)
    wp = w32 + 32                  # halo container width (sublane-tileable)

    if not ht:
        for cand in (16, 13, 8, 4, 2, 1):
            if s2d_out and cand % 2:
                continue
            if h_out % cand == 0 and cand * w32 * (kpad + 4 * cout) < 11_000_000:
                ht = cand
                break
        if not ht:
            raise ValueError(
                f"conv2d_rs: no row-block height fits VMEM for "
                f"h_out={h_out}, w32={w32}, kpad={kpad}, cout={cout} "
                f"(s2d_out={bool(s2d_out)}); even the smallest legal block "
                f"exceeds the 11 MB bound — use the XLA path")
    assert h_out % ht == 0, (h_out, ht)
    if pool == "pool2":
        assert ht % 2 == 0

    if ksize == 3:
        # SAME halo: 1 zero row top/bottom, 1 zero col left + tail to wp
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    else:
        # VALID over the pre-shifted fold: rows are already complete
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wp - wd, ), (0, 0)))
    nb = h_out // ht
    # halo rows for block i: padded rows [i*ht + ht, i*ht + ht + ksize-1)
    halos = [xp[:, ht + d::ht][:, :nb] for d in range(ksize - 1)]
    halo = jnp.stack(halos, axis=2)       # (N, nb, ksize-1, wp, cin)
    xblk = xp[:, :h_out]                  # (N, h_out, wp, cin)

    wmat = w if w.ndim == 2 else w.reshape(k, cout)
    scale2 = scale.astype(jnp.float32).reshape(1, cout)
    bias2 = bias.astype(jnp.float32).reshape(1, cout)

    if pool is None:
        out_shape = (n, h_out, w32, cout)
        blk = (1, ht, w32, cout)
    elif pool == "pool2":
        out_shape = (n, h_out // 2, w32 // 2, cout)
        blk = (1, ht // 2, w32 // 2, cout)
    else:
        _, f, co = pool
        c_out_g = (f // 2) ** 2 * co
        out_shape = (n, h_out, w32, c_out_g)
        blk = (1, ht, w32, c_out_g)
    if s2d_out:
        assert pool is None or isinstance(pool, tuple), \
            "s2d_out composes with gmax/no-pool outputs"
        assert ht % 2 == 0 and h_out % 2 == 0 and w32 % 64 == 0
        out_shape = (out_shape[0], out_shape[1] // 2, out_shape[2] // 2,
                     out_shape[3] * 4)
        blk = (1, blk[1] // 2, blk[2] // 2, blk[3] * 4)

    out_dtype = jnp.int8 if quantize_out else jnp.float32
    kernel = functools.partial(
        _conv_rs_kernel, W=w_out, W32=w32, Ht=ht, cin=cin,
        kpad=kpad, cout=cout, act=act, quantize_out=quantize_out, pool=pool,
        ksize=ksize, s2d_out=s2d_out)

    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, ht, wp, cin), lambda nn, ii: (nn, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ksize - 1, wp, cin),
                         lambda nn, ii: (nn, ii, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, cout), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda nn, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            blk, lambda nn, ii: (nn, ii, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ht * w32, kpad), jnp.int8),     # A_cat
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w32 * k * cout,
            bytes_accessed=int(xblk.size * xblk.dtype.itemsize
                               + halo.size * halo.dtype.itemsize
                               + wmat.size * wmat.dtype.itemsize
                               + np.prod(out_shape)
                               * np.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xblk, halo, wmat, scale2, bias2)

    # strip the W padding
    if s2d_out:
        return out[:, :, :w_out // 2, :]
    if pool == "pool2":
        return out[:, :, :w_out // 2, :]
    return out[:, :, :w_out, :]


# ---------------------------------------------------------------------------
# W8A8 layer wrappers
# ---------------------------------------------------------------------------

def conv2d_w8a8_rs(xq, s_in, wq, s_w, b, act="leaky", s_out=None,
                   pool: Union[None, str, Tuple] = None):
    """Row-streaming W8A8 conv (+ fused pool). Same numerics as
    ops.conv.conv2d_w8a8 (+ ops.pool.maxpool for 'pool2')."""
    scale = (s_in * s_w).astype(jnp.float32)
    bias = b.astype(jnp.float32)
    if s_out is not None:
        scale = scale / s_out
        bias = bias / s_out
    return conv3x3_rs(xq, wq, scale, bias, act=act,
                      quantize_out=s_out is not None, pool=pool)


def folded_stage_params(wq: np.ndarray, s_w: np.ndarray, b: np.ndarray,
                        f: int):
    """Fold a quantized conv's params: weights fold; per-channel scale and
    bias tile across the f^2 position groups."""
    wf = fold_conv3x3_weights(np.asarray(wq), f)
    reps = f * f
    return wf, np.tile(np.asarray(s_w), reps), np.tile(np.asarray(b), reps)
