"""Multi-host continuous batching (SURVEY.md section 2.9 N1, BASELINE
config 5: channel-sharded continuous-batching serve across hosts).

One server process per host (``jax.distributed``). Multi-process JAX
requires every process to participate in every computation over global
arrays, so the batching loop is LOCKSTEP:

- process 0 (the LEADER) owns the request queue and the HTTP surface
  (reusing ContinuousBatcher); each step it broadcasts
  ``(flag, batch)`` to all processes — flag 1 = work, 0 = shutdown;
- every process (leader included) then dispatches the SAME sharded
  detect program on the global (data-sharded) batch and reshards the
  outputs to fully-replicated so each host can read them;
- FOLLOWER processes run ``follower_loop`` — block on the broadcast,
  mirror the computation, loop.

The cross-host wire is the collectives themselves (broadcast rides the
jax.distributed runtime; the detect's psums/all-gathers ride ICI/DCN) —
no second RPC layer. Executed in CI by the 2-process CPU loopback test
(tests/test_serve_distributed.py); on a real pod slice the same code
serves BASELINE config 5.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher


def _replicator(engine):
    """jit identity resharding the detect outputs to fully-replicated —
    an all-gather over 'data' so EVERY host holds every row (the leader
    must answer for the whole batch; rows live on remote hosts
    otherwise)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = engine.mesh
    if mesh is None:
        return lambda t: t
    return jax.jit(lambda t: t,
                   out_shardings=NamedSharding(mesh, P()))


class DistributedBatcher(ContinuousBatcher):
    """Leader-side batcher: ContinuousBatcher whose device step runs in
    lockstep with the follower processes. Single-process meshes degrade
    to the plain batcher step (broadcast of 1 process is the identity).
    """

    def __init__(self, engine, max_batch: Optional[int] = None,
                 timeout_ms: Optional[float] = None):
        super().__init__(engine, max_batch=max_batch, timeout_ms=timeout_ms)
        import jax
        assert jax.process_index() == 0, (
            "DistributedBatcher runs on the leader (process 0); follower "
            "processes run follower_loop()")
        self._rep = _replicator(engine)

    def _step(self, x: np.ndarray):
        """Broadcast the batch, run the sharded detect, gather results
        host-side. Returns (boxes, scores, classes) numpy for ALL rows."""
        import jax
        from jax.experimental import multihost_utils
        if jax.process_count() > 1:
            flag, x = multihost_utils.broadcast_one_to_all(
                (np.int32(1), x))
        res = self._rep(self.engine.detect_device(x))
        return tuple(np.asarray(t) for t in res)

    # override the device dispatch inside the serving loop: lockstep
    # steps cannot pipeline (the broadcast is itself a sync point), so
    # the distributed loop resolves synchronously
    def _loop(self):
        size = self.engine.config.input_size
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            x = np.zeros((self.max_batch, size, size, 3), np.uint8)
            for i, (img, _f, _t) in enumerate(batch):
                if img.dtype == np.uint8:
                    x[i] = img
                else:
                    x[i] = np.clip(np.round(img * 255.0), 0, 255
                                   ).astype(np.uint8)
            try:
                res = self._step(x)
            except Exception as e:                 # resolve, don't wedge
                for _img, fut, _t in batch:
                    fut.set_exception(e)
                continue
            self._resolve((batch, res))

    def stop(self):
        """Stop the loop, then broadcast the shutdown sentinel so the
        followers' broadcast unblocks and their loops exit."""
        import jax
        super().stop()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            size = self.engine.config.input_size
            multihost_utils.broadcast_one_to_all(
                (np.int32(0),
                 np.zeros((self.max_batch, size, size, 3), np.uint8)))


def follower_loop(engine, max_batch: Optional[int] = None) -> int:
    """Follower-process serving loop: mirror every leader step until the
    shutdown sentinel. Returns the number of batches served."""
    import jax
    from jax.experimental import multihost_utils
    assert jax.process_index() != 0, "the leader runs DistributedBatcher"
    max_batch = max_batch or engine.config.serve_max_batch
    size = engine.config.input_size
    rep = _replicator(engine)
    zeros = np.zeros((max_batch, size, size, 3), np.uint8)
    served = 0
    while True:
        flag, x = multihost_utils.broadcast_one_to_all(
            (np.int32(0), zeros))
        if int(flag) == 0:
            return served
        res = rep(engine.detect_device(x))
        jax.block_until_ready(res)
        served += 1
