"""Probe Mosaic DMA slicing rules on VMEM refs: which (offset, extent)
combinations in the sublane/lane dims does tpu.memref_slice accept for
`pltpu.make_async_copy`? Round-4 kernel design (DMA-assembled A_cat)
hinges on: extents must be tile-aligned (verified: 8 sublane / 128
lane); are OFFSETS also constrained?

Each case compiles a trivial kernel that DMAs src[slice] -> dst and
checks the copied values. Prints OK/REJECTED per case.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, src_shape, sl):
    """DMA src_ref[sl] -> dst scratch; compare with numpy."""
    dst_shape = tuple(s.size if isinstance(s, pl.Slice) else 1
                      for s in (sl if isinstance(sl, tuple) else (sl,)))
    dst_shape = tuple(x.size for x in sl)

    def kernel(x_ref, o_ref, dst, sem):
        d = pltpu.make_async_copy(x_ref.at[sl], dst, sem)
        d.start()
        d.wait()
        o_ref[...] = dst[...]

    x = jnp.arange(np.prod(src_shape), dtype=jnp.int32).reshape(src_shape) \
        .astype(jnp.int8)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(dst_shape, jnp.int8),
            scratch_shapes=[pltpu.VMEM(dst_shape, jnp.int8),
                            pltpu.SemaphoreType.DMA(())],
        )(x)
        want = np.asarray(x)[tuple(slice(s.start, s.start + s.size)
                                   for s in sl)]
        ok = np.array_equal(np.asarray(out), want)
        print(f"OK    {name}  exact={ok}", flush=True)
    except Exception as e:
        msg = repr(e)
        key = msg
        for marker in ("must be aligned", "Not implemented", "Unsupported",
                       "INTERNAL"):
            i = msg.find(marker)
            if i >= 0:
                key = msg[i:i + 110]
                break
        print(f"REJ   {name}  {key}", flush=True)


CASES = [
    # (name, src shape, (slices...))  src 3D: (lead, sublane, lane)
    ("lead-off1",      (16, 16, 128), (pl.ds(1, 8), pl.ds(0, 16), pl.ds(0, 128))),
    ("sub-off1-ext8",  (16, 16, 128), (pl.ds(0, 8), pl.ds(1, 8),  pl.ds(0, 128))),
    ("sub-off0-ext8",  (16, 16, 128), (pl.ds(0, 8), pl.ds(0, 8),  pl.ds(0, 128))),
    ("sub-ext13",      (16, 16, 128), (pl.ds(0, 8), pl.ds(0, 13), pl.ds(0, 128))),
    ("lane-off128",    (16, 16, 256), (pl.ds(0, 8), pl.ds(0, 16), pl.ds(128, 128))),
    ("lane-off64",     (16, 16, 256), (pl.ds(0, 8), pl.ds(0, 16), pl.ds(64, 128))),
    ("lane-ext64",     (16, 16, 256), (pl.ds(0, 8), pl.ds(0, 16), pl.ds(0, 64))),
    ("2d-sub-off1",    (64, 1280),    (pl.ds(1, 8), pl.ds(0, 1280))),
    ("2d-sub-off2e8",  (64, 1280),    (pl.ds(2, 8), pl.ds(128, 1152))),
]


def main():
    for name, shape, sl in CASES:
        probe(name, shape, sl)


if __name__ == "__main__":
    main()
