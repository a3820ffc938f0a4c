"""Multi-host continuous-batching serve, executed (SURVEY.md N1 /
BASELINE config 5): 2 jax.distributed processes, leader-side
DistributedBatcher + follower_loop in lockstep over a (4, 2) global CPU
mesh, channel-sharded W8A8 detect; leader asserts every served result
equals a single-device reference (tests/_serve_loopback_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__),
                       "_serve_loopback_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
    except OSError as e:
        pytest.skip(f"cannot bind a loopback port: {e}")
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_serve():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=_REPO, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=600))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("serve loopback workers timed out")
    for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\nstdout:\n{so[-2000:]}\n"
            f"stderr:\n{se[-3000:]}")
        assert f"SERVE_LOOPBACK_OK {pid}" in so, so[-2000:]
