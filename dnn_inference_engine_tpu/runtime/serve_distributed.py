"""Multi-host continuous batching (SURVEY.md section 2.9 N1, BASELINE
config 5: channel-sharded continuous-batching serve across hosts).

One server process per host (``jax.distributed``). Multi-process JAX
requires every process to participate in every computation over global
arrays, so the batching loop is LOCKSTEP:

- process 0 (the LEADER) owns the request queue and the HTTP surface
  (reusing ContinuousBatcher). **Ingestion is leader-only BY DESIGN**:
  one process owns request ordering and batch assembly, so the data
  plane needs no cross-host queue coordination; followers are pure
  compute mirrors. (A symmetric every-host-ingests design would save
  the scatter hop but couples request routing to shard layout; the
  leader-only contract is the deliberate simplicity/efficiency trade.)
- each step the leader SCATTERS: it sends every follower ONLY that
  follower's 'data'-shard rows of the batch over the jax.distributed
  KV store (chunked bytes), plus a tiny per-step per-follower header.
  Per-step wire cost is O(batch / n_hosts) per follower.
- every process places its local rows with
  ``jax.make_array_from_process_local_data`` (addressable-shard
  placement — no further host transfer), then dispatches the SAME
  sharded detect program; outputs reshard to fully-replicated (an
  all-gather riding ICI/DCN) so the leader can answer for every row.
- FOLLOWER processes run ``follower_loop``: block on the next step
  header, mirror the computation, loop. If no header arrives within
  ``leader_timeout_s`` (or the KV channel errors out — the coordinator
  dies with the leader), the loop EXITS CLEANLY and returns, instead of
  hanging forever on a dead leader. The leader emits keepalive headers
  while idle so a quiet service is distinguishable from a dead one.

KV-store hygiene and failure contract (round-4 advisor findings):

- Every key lives under ``sdb/r{run}/``, where ``run`` is allocated
  atomically (``key_value_increment``) per DistributedBatcher — a
  restarted batcher in the same jax.distributed session can never
  collide with a predecessor's step keys. The leader publishes the id
  at ``sdb/current_run`` (overwrite allowed); followers attach to it.
- Every per-step key is SINGLE-READER-OWNED and deleted by its reader:
  payload chunks AND their ``/n`` count key by the payload's follower,
  and headers are written per-follower (``h/p{p}/{step}``) so each
  follower deletes its own after reading. A long-running service holds
  O(1) live keys, not O(steps). The only permanent residue is one
  ``done`` tombstone per run.
- A follower that exits ABNORMALLY (header timeout, missing payload,
  compute failure) best-effort writes ``dead/p{p}``; the leader checks
  these (non-blocking ``key_value_try_get``) before every data step
  and refuses to dispatch a collective that would block forever on a
  missing participant. Any leader-side failure after the step headers
  are written is FATAL: the loop fails the batch's futures, emits the
  shutdown headers so followers exit, and stops — continuing after a
  desync could pair collectives across different steps and return
  silently wrong rows. (A participant dying MID-collective is the one
  case this protocol cannot catch; that is the jax.distributed
  error-poller's domain, which terminates the session within seconds.)

Executed in CI by 2-process AND 4-process (leader + 3 followers) CPU
loopback tests (tests/test_serve_distributed.py, incl. leader-crash
modes); on a real pod slice the same code serves BASELINE config 5.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher

_CHUNK = 2 << 20        # stay under the coordination-service gRPC limit

#: step-header flags
_H_DATA, _H_KEEPALIVE, _H_SHUTDOWN = 1, 2, 0


def _kv_client():
    from jax._src import distributed
    client = distributed.global_state.client
    assert client is not None, "jax.distributed is not initialized"
    return client


class _KVWire:
    """Chunked bytes transport + lockstep control plane over the
    jax.distributed KV store, namespaced by run id."""

    def __init__(self, run: int = 0):
        self._c = _kv_client()
        self.run = run

    # -- run handshake -------------------------------------------------

    @classmethod
    def alloc_run(cls) -> "_KVWire":
        """Leader side: atomically allocate a fresh run id and publish
        it for followers."""
        c = _kv_client()
        run = int(c.key_value_increment("sdb/runid", 1))
        c.key_value_set("sdb/current_run", str(run), allow_overwrite=True)
        return cls(run)

    @classmethod
    def attach_run(cls, timeout_ms: int) -> Optional["_KVWire"]:
        """Follower side: attach to the published run. None when no
        leader publishes within the timeout or the run already ended."""
        c = _kv_client()
        try:
            run = int(c.blocking_key_value_get("sdb/current_run",
                                               timeout_ms))
        except Exception:   # noqa: BLE001 — timeout or dead coordinator
            return None
        wire = cls(run)
        return None if wire.is_done() else wire

    def _k(self, suffix: str) -> str:
        return f"sdb/r{self.run}/{suffix}"

    # -- payloads (reader-owned, fully deleted on read) ----------------

    def send(self, key: str, payload: bytes) -> None:
        n = max(1, -(-len(payload) // _CHUNK))
        for i in range(n):
            self._c.key_value_set_bytes(
                f"{key}/c{i}", payload[i * _CHUNK:(i + 1) * _CHUNK])
        self._c.key_value_set(f"{key}/n", str(n))

    def recv(self, key: str, timeout_ms: int) -> Optional[bytes]:
        """Payload or None on timeout/dead-channel (leader gone)."""
        try:
            n = int(self._c.blocking_key_value_get(f"{key}/n", timeout_ms))
            parts = [self._c.blocking_key_value_get_bytes(
                f"{key}/c{i}", timeout_ms) for i in range(n)]
        except Exception:     # noqa: BLE001 — timeout OR coordinator death
            return None
        # reader-owned keys: delete the chunks AND the count key, or a
        # long-running service grows the KV store by one key per step
        for k in [f"{key}/c{i}" for i in range(n)] + [f"{key}/n"]:
            try:
                self._c.key_value_delete(k)
            except Exception:  # noqa: BLE001
                pass
        return b"".join(parts)

    def rows_key(self, step: int, p: int) -> str:
        return self._k(f"d/{step}/p{p}")

    # -- per-follower step headers -------------------------------------

    def set_header(self, step: int, p: int, flag: int) -> None:
        self._c.key_value_set(self._k(f"h/p{p}/{step}"), str(flag))

    def get_header(self, step: int, p: int,
                   timeout_ms: int) -> Optional[int]:
        """Read-and-delete this follower's step header (each follower
        owns its own header key, so deletion cannot race a peer)."""
        key = self._k(f"h/p{p}/{step}")
        try:
            flag = int(self._c.blocking_key_value_get(key, timeout_ms))
        except Exception:     # noqa: BLE001 — timeout OR coordinator death
            return None
        try:
            self._c.key_value_delete(key)
        except Exception:     # noqa: BLE001
            pass
        return flag

    # -- failure signalling --------------------------------------------

    def mark_dead(self, p: int, reason: str) -> None:
        """Follower: record an abnormal exit so the leader stops
        dispatching collectives this process will never join.
        Best-effort — the channel may already be down."""
        try:
            self._c.key_value_set(self._k(f"dead/p{p}"), reason,
                                  allow_overwrite=True)
        except Exception:     # noqa: BLE001
            pass

    def dead_followers(self, n_procs: int) -> Dict[int, str]:
        out: Dict[int, str] = {}
        for p in range(1, n_procs):
            try:
                out[p] = self._c.key_value_try_get(self._k(f"dead/p{p}"))
            except Exception:  # noqa: BLE001 — not set: follower alive
                pass
        return out

    # -- run tombstone -------------------------------------------------

    def mark_done(self) -> None:
        try:
            self._c.key_value_set(self._k("done"), "1",
                                  allow_overwrite=True)
        except Exception:     # noqa: BLE001
            pass

    def is_done(self) -> bool:
        try:
            self._c.key_value_try_get(self._k("done"))
            return True
        except Exception:     # noqa: BLE001
            return False


def _proc_rows(mesh, batch: int) -> Dict[int, Tuple[int, int]]:
    """process index -> contiguous [start, stop) row range of the
    batch-sharded ('data') input each process's devices hold."""
    from dnn_inference_engine_tpu.parallel.sharding import input_sharding
    sh = input_sharding(mesh)
    size = 1  # trailing dims don't matter for the batch-axis slices
    imap = sh.devices_indices_map((batch, size, size, 3))
    rows: Dict[int, set] = {}
    for dev, idx in imap.items():
        sl = idx[0]
        start, stop = sl.start or 0, sl.stop if sl.stop is not None else batch
        rows.setdefault(dev.process_index, set()).update(range(start, stop))
    out = {}
    for p, rset in rows.items():
        lo, hi = min(rset), max(rset) + 1
        assert rset == set(range(lo, hi)), (
            f"process {p} rows are not contiguous: {sorted(rset)}")
        out[p] = (lo, hi)
    return out


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


def _place_local(engine, x_local: np.ndarray, batch: int):
    """Global batch array from this process's local rows (addressable-
    shard placement; no host transfer beyond the rows given)."""
    import jax
    from dnn_inference_engine_tpu.parallel.sharding import input_sharding
    size = engine.config.input_size
    return jax.make_array_from_process_local_data(
        input_sharding(engine.mesh), x_local, (batch, size, size, 3))


class _FollowerDead(RuntimeError):
    """A follower recorded an abnormal exit; sharded dispatch would
    block forever in its collectives."""


class DistributedBatcher(ContinuousBatcher):
    """Leader-side batcher: ContinuousBatcher whose device step runs in
    lockstep with the follower processes (scatter + mirrored dispatch).
    Single-process meshes degrade to the plain batcher step."""

    #: seconds of queue silence between keepalive headers
    keepalive_s = 5.0

    def __init__(self, engine, max_batch: Optional[int] = None,
                 timeout_ms: Optional[float] = None):
        super().__init__(engine, max_batch=max_batch, timeout_ms=timeout_ms)
        import jax
        assert jax.process_index() == 0, (
            "DistributedBatcher runs on the leader (process 0); follower "
            "processes run follower_loop()")
        self._rep = _replicator(engine)
        self._nproc = jax.process_count()
        self._step_no = 0
        self._fatal: Optional[BaseException] = None
        self._wire_closed = False
        if self._nproc > 1:
            self._wire = _KVWire.alloc_run()
            self._rows = _proc_rows(engine.mesh, self.max_batch)

    def submit(self, image: np.ndarray):
        if self._fatal is not None:
            raise RuntimeError(
                "distributed serving loop stopped after a lockstep "
                f"failure: {self._fatal!r}")
        return super().submit(image)

    def _step(self, x: np.ndarray):
        """Scatter shard rows to followers, run the sharded detect on
        addressable shards, gather results host-side. Returns (boxes,
        scores, classes) numpy for ALL rows.

        Ordering contract: all fallible LOCAL work (shard placement,
        dead-follower check) happens BEFORE the step headers are
        written; once the headers are out, any exception desyncs the
        lockstep and the caller must treat it as fatal
        (``_headers_out`` tells it whether that line was crossed)."""
        self._headers_out = False
        if self._nproc > 1:
            s = self._step_no
            lo, hi = self._rows[0]
            xg = _place_local(self.engine, x[lo:hi], self.max_batch)
            dead = self._wire.dead_followers(self._nproc)
            if dead:
                raise _FollowerDead(
                    f"follower(s) recorded abnormal exit: {dead}")
            for p, (plo, phi) in self._rows.items():
                if p != 0:
                    self._wire.send(self._wire.rows_key(s, p),
                                    x[plo:phi].tobytes())
            for p in range(1, self._nproc):
                self._wire.set_header(s, p, _H_DATA)
            self._headers_out = True
            self._step_no += 1
            res = self._rep(self.engine.detect_fn()(
                self.engine.exec_params, xg))
        else:
            res = self._rep(self.engine.detect_device(x))
        return tuple(np.asarray(t) for t in res)

    # override the device dispatch inside the serving loop: lockstep
    # steps cannot pipeline (the scatter is itself a sync point), so the
    # distributed loop resolves synchronously; while the queue is idle
    # it emits keepalive headers so followers can tell a quiet leader
    # from a dead one
    def _loop(self):
        size = self.engine.config.input_size
        last_activity = time.perf_counter()
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                now = time.perf_counter()
                if (self._nproc > 1
                        and now - last_activity >= self.keepalive_s):
                    s = self._step_no
                    for p in range(1, self._nproc):
                        self._wire.set_header(s, p, _H_KEEPALIVE)
                    self._step_no += 1
                    last_activity = now
                continue
            last_activity = time.perf_counter()
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
                if self._nproc > 1:
                    # dead follower, or failure after the step headers
                    # went out: the lockstep is (or would become)
                    # desynced — continuing could pair collectives
                    # across different steps and return silently wrong
                    # rows. Fail fast: tell the followers to exit and
                    # stop serving.
                    self._fatal = e
                    self._fail_queued(e)
                    self._close_wire()
                    return
                continue
            self._resolve((batch, res))

    def _fail_queued(self, exc: BaseException) -> None:
        """Fail every not-yet-collected request so callers don't hang."""
        import queue as _q
        while True:
            try:
                _img, fut, _t = self.q.get_nowait()
            except _q.Empty:
                return
            fut.set_exception(exc)

    def _close_wire(self) -> None:
        """Emit the shutdown header for every follower + the run
        tombstone (idempotent)."""
        if self._nproc <= 1 or self._wire_closed:
            return
        self._wire_closed = True
        for p in range(1, self._nproc):
            # belt-and-braces: if a straggling step already wrote this
            # header slot, advance to the next step number
            for attempt in range(3):
                try:
                    self._wire.set_header(self._step_no + attempt, p,
                                          _H_SHUTDOWN)
                    break
                except Exception:  # noqa: BLE001 — duplicate key
                    continue
        self._step_no += 1
        self._wire.mark_done()

    def stop(self):
        """Stop the loop, then emit the shutdown headers so the
        followers' blocking waits resolve and their loops exit."""
        self._stop.set()
        if self._thread is not None:
            # join WITHOUT a timeout: writing the shutdown header while
            # the loop thread is still mid-step would race its step
            # numbering (first-step compiles through the sandbox relay
            # run ~40 s, far beyond any polite timeout). The loop cannot
            # wedge host-side — every blocking call in it has a
            # timeout — and a mid-collective wedge is fatal to the whole
            # jax.distributed session anyway (error poller).
            self._thread.join()
            self._thread = None
        self._close_wire()


def follower_loop(engine, max_batch: Optional[int] = None,
                  leader_timeout_s: float = 60.0) -> int:
    """Follower-process serving loop: mirror every leader step until the
    shutdown header. Returns the number of batches served.

    Exits CLEANLY (returning the count) when no header arrives within
    ``leader_timeout_s`` or the KV channel dies — both mean the leader
    is gone; hanging forever on a dead leader would wedge the host.
    The leader's idle keepalives arrive every ``keepalive_s`` (5 s), so
    any ``leader_timeout_s`` comfortably above that has no false trips.
    On every abnormal exit the follower best-effort records itself dead
    (``mark_dead``) so a still-alive leader stops dispatching
    collectives this process will never join.
    """
    import jax
    p = jax.process_index()
    assert p != 0, "the leader runs DistributedBatcher"
    max_batch = max_batch or engine.config.serve_max_batch
    size = engine.config.input_size
    timeout_ms = int(leader_timeout_s * 1e3)
    wire = _KVWire.attach_run(timeout_ms)
    if wire is None:
        return 0                     # no leader published a live run
    rows = _proc_rows(engine.mesh, max_batch)
    lo, hi = rows[p]
    rep = _replicator(engine)
    served = 0
    step = 0
    while True:
        flag = wire.get_header(step, p, timeout_ms)
        if flag is None:             # leader death or timeout
            wire.mark_dead(p, f"header-timeout@step{step}")
            return served
        if flag == _H_SHUTDOWN:
            return served
        if flag == _H_KEEPALIVE:
            step += 1
            continue
        payload = wire.recv(wire.rows_key(step, p), timeout_ms)
        step += 1
        if payload is None:
            wire.mark_dead(p, f"payload-timeout@step{step - 1}")
            return served
        x_local = np.frombuffer(payload, np.uint8).reshape(
            hi - lo, size, size, 3)
        try:
            xg = _place_local(engine, x_local, max_batch)
            res = rep(engine.detect_fn()(engine.exec_params, xg))
            jax.block_until_ready(res)
        except Exception:
            # the leader is already inside (or about to enter) this
            # step's collectives — mark_dead stops it from dispatching
            # FURTHER steps; the in-flight one is the error poller's job
            wire.mark_dead(p, f"compute-failure@step{step - 1}")
            raise
        served += 1
