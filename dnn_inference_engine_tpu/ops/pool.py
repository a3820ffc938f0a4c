"""Maxpool on-device via lax.reduce_window (reference K8; SURVEY.md 2.1).

The reference implements 2x2 stride-2 maxpool plus the tricky 2x2 stride-1
'SAME' maxpool before conv7 (SURVEY.md hard part 3: darknet pads
right/bottom for the stride-1 pool, so each output pixel is the max over
{(h,w),(h,w+1),(h+1,w),(h+1,w+1)} with out-of-bounds treated as -inf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maxpool(x: jnp.ndarray, size: int = 2, stride: int = 2,
            padding: str = "VALID") -> jnp.ndarray:
    """Maxpool over NHWC input.

    stride == size: standard non-overlapping pool (valid; H divisible).
    stride == 1:    darknet 'same' pool — output spatial dims equal input;
                    window extends past the right/bottom edge, padded with
                    -inf (identity for max).
    padding='SAME': TF-style symmetric -inf padding (used by ResNet stem).
    """
    if stride == 1:
        # darknet pads only on the right/bottom: pad (0, size-1) each spatial
        pad = ((0, 0), (0, size - 1), (0, size - 1), (0, 0))
    elif padding == "SAME":
        pad = "SAME"
    else:
        pad = ((0, 0), (0, 0), (0, 0), (0, 0))
    if (size == 2 and stride == 2 and x.ndim == 4 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0 and x.dtype == jnp.int8
            and x.shape[3] < 128):
        # lane-packed fast path for narrow-channel int8 tensors: XLA's
        # int8 reduce_window relayouts catastrophically at C<128 (574 us
        # for (32,104,104,64) on v5e vs 135 us for this formulation —
        # adjacent W pairs packed into lanes, then two elementwise
        # maxes). Exact: same 4 elements per output.
        n, h, w, c = x.shape
        xp = x.reshape(n, h, w // 2, 2 * c)
        m = jnp.maximum(xp[:, ::2], xp[:, 1::2])
        return jnp.maximum(m[..., :c], m[..., c:])
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )
