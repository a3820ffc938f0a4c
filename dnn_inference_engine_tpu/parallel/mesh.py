"""Device mesh construction (SURVEY.md section 2.7).

The reference is single-process with no communication layer; all
distribution here is TPU-native target scope from [B]: a
``Mesh(('data', 'model'))`` where the data axis shards activation batches
(DP) and the model axis shards conv channels (TP). On a multi-host pod
slice the mesh spans hosts via ``jax.distributed.initialize()``; locally
it spans the chips (or CPU devices under
``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Tuple[int, int] = (1, 1),
              devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh from the first data*model devices."""
    dp, mp = shape
    if devices is None:
        devices = jax.devices()
    n = dp * mp
    if n > len(devices):
        raise ValueError(
            f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, mp)
    return Mesh(arr, ("data", "model"))


def apply_overlap_flags() -> None:
    """Append the async-collective XLA flags (SURVEY.md N3) to
    LIBTPU_INIT_ARGS so the latency-hiding scheduler can overlap the
    channel pair's psum with neighboring compute. Must run BEFORE the
    first jax backend initialization; no-op if the flags are already
    present (idempotent across engine instances)."""
    import os
    from dnn_inference_engine_tpu.parallel.shard_map_forward import (
        async_collective_flags)
    flags = async_collective_flags()
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    missing = [f for f in flags.split() if f not in cur]
    if missing:
        os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + " ".join(missing)).strip()


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (BASELINE config 4).

    Applies the collective/compute-overlap flags, then (for >1 process)
    initializes the jax.distributed runtime. Call before any jax use."""
    apply_overlap_flags()
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
