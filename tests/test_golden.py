"""Golden dump/compare machinery tests (reference E1; SURVEY.md 2.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_inference_engine_tpu.eval.golden import (
    compare_goldens, dump_goldens, load_goldens,
)
from dnn_inference_engine_tpu.models import yolov2_tiny


def test_golden_roundtrip(tmp_path, rng):
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    path = str(tmp_path / "golden.npz")
    _, layer_outs = dump_goldens(model, params, x, path)
    goldens = load_goldens(path)
    assert len(goldens) == len(model.layers)
    report = compare_goldens(layer_outs, goldens)
    assert max(report.values()) == 0.0


def test_golden_detects_mismatch(tmp_path, rng):
    model = yolov2_tiny()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    path = str(tmp_path / "golden.npz")
    _, layer_outs = dump_goldens(model, params, x, path)
    goldens = load_goldens(path)
    corrupted = list(layer_outs)
    corrupted[3] = corrupted[3] + 1.0
    with pytest.raises(AssertionError):
        compare_goldens(corrupted, goldens)
