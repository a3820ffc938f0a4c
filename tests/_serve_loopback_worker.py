"""Worker for test_serve_distributed: 2-process multi-host continuous
batching over a (4, 2) global CPU mesh (SURVEY.md N1 / BASELINE config 5
executed in CI).

Process 0 runs DistributedBatcher (leader: queue + lockstep steps) and
submits requests; process 1 runs follower_loop. The leader asserts every
result equals a single-device reference detect.

Run as: python _serve_loopback_worker.py <process_id> <port>
Prints ``SERVE_LOOPBACK_OK <pid> ...`` on success.
"""

import os
import sys


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dnn_inference_engine_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine
    from dnn_inference_engine_tpu.runtime.serve_distributed import (
        DistributedBatcher, follower_loop)

    kw = dict(model="yolov2-tiny", mode="w8a8", kernel="auto",
              input_size=64, serve_max_batch=4)
    eng = Engine(EngineConfig(mesh_shape=(4, 2), sharding="channel", **kw)
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            for _ in range(10)]

    if pid != 0:
        served = follower_loop(eng)
        assert served >= 3, served   # 10 imgs / max_batch 4 -> >= 3 steps
        print(f"SERVE_LOOPBACK_OK {pid} served={served}", flush=True)
        return

    # leader: single-device reference detections (batch of 1 each)
    ref_eng = Engine(EngineConfig(batch=1, **kw)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    refs = [ref_eng.detect(img[None]) for img in imgs]

    b = DistributedBatcher(eng).start()
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
