"""Test harness configuration.

Tests run on CPU with 8 virtual devices (SURVEY.md section 4.4): sharding
logic is validated on a simulated mesh, and Pallas kernels run in
interpreter mode (ops/pallas_gemm.py auto-detects non-TPU backends).
The axon sitecustomize force-registers the TPU backend before pytest
starts, so we override the platform via jax.config (effective because no
backend has been initialized yet at conftest import time).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# Let tests opt back into TPU by exporting DIE_TPU_TESTS_ON_TPU=1.
if os.environ.get("DIE_TPU_TESTS_ON_TPU") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
