"""Worker process for test_distributed_loopback (SURVEY.md section 4.4).

One of two ``jax.distributed`` processes: brings up the multi-process
runtime via ``parallel.mesh.init_distributed`` (the code under test —
BASELINE config 5's multi-host bring-up), builds a (4, 2) GLOBAL mesh
from 2 processes x 4 virtual CPU devices, runs the channel-sharded W8A8
fused-plan detect end-to-end, and asserts every locally-addressable
output shard agrees with a single-device reference engine computed in
the same process.

Run as: python _loopback_worker.py <process_id> <coordinator_port>
Prints ``LOOPBACK_OK <pid>`` on success.
"""

import os
import sys


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    # 4 virtual CPU devices per process; gloo backs the cross-process
    # collectives (the CPU stand-in for ICI/DCN, SURVEY.md section 2.7)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dnn_inference_engine_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    import numpy as np
    from dnn_inference_engine_tpu.config import EngineConfig
    from dnn_inference_engine_tpu.runtime.engine import Engine

    kw = dict(model="yolov2-tiny", mode="w8a8", kernel="auto", batch=8,
              input_size=64)
    eng = Engine(EngineConfig(mesh_shape=(4, 2), sharding="channel", **kw)
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    assert eng.mesh is not None and eng._plan is not None
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    # global (cross-process) sharded detect: returns global arrays whose
    # non-local shards this process cannot read — compare the local ones
    db, ds, dc = eng.detect_device(imgs)

    # single-device reference in the same process (identical weights:
    # same PRNG key; identical noise-calibration scales: same rng seed)
    ref = Engine(EngineConfig(**kw)).load_weights(
        key=jax.random.PRNGKey(0)).prepare()
    rb, rs, rc = ref.detect(imgs)

    checked = 0
    for glob, refa, name in ((db, rb, "boxes"), (ds, rs, "scores"),
                             (dc, rc, "classes")):
        for sh in glob.addressable_shards:
            got = np.asarray(sh.data)
            want = refa[sh.index]
            if name == "classes":
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"{name} {sh.index}")
            else:
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=1e-5,
                    err_msg=f"{name} shard {sh.index}")
            checked += 1
    assert checked >= 6, checked   # >=2 local data shards x 3 outputs
    print(f"LOOPBACK_OK {pid} checked={checked}", flush=True)


if __name__ == "__main__":
    main()
