"""Plan-sweep tool tests (SURVEY.md section 2.1: the measured-fastest
per-layer strategy must be a repeatable capability, not a hand table).

CPU runs exercise the machinery (legality, greedy loop, artifact
format, EngineConfig consumption); the CPU timings themselves say
nothing about TPU choices — the committed TPU artifacts live in
docs/SWEEP_*.json.
"""

import json

import jax
import numpy as np
import pytest

from dnn_inference_engine_tpu.config import EngineConfig
from dnn_inference_engine_tpu.runtime.engine import Engine
from dnn_inference_engine_tpu.runtime.plan_sweep import (
    candidate_entries, load_strategy, sweep,
)


def test_candidate_legality_yolov2():
    from dnn_inference_engine_tpu.models import build_model
    model = build_model("yolov2-tiny")
    # entry conv: stem + f4 folds offered in w8a8
    names = {c[0] for c in candidate_entries(model, 0, "w8a8")}
    assert {"xla", "stem_rs", "fold_xla_k2", "fold_xla"} <= names
    # ... but no int8-Pallas stem in w8 (no bf16 counterpart for rs/s0
    # is needed: plan_forward_w8 runs stem_rs stages via the XLA chain,
    # but the sweep only offers w8a8-exclusive kinds under w8a8)
    assert "stem_rs" not in {c[0] for c in candidate_entries(model, 0, "w8")}
    # mid conv followed by a 2x2/s2 pool: fold candidates legal
    names6 = {c[0] for c in candidate_entries(model, 6, "w8a8")}
    assert {"fold_xla", "fold_xla_k2", "rs"} <= names6
    # conv7 (L12) follows the s1 'same' pool -> no fold candidates
    names12 = {c[0] for c in candidate_entries(model, 12, "w8a8")}
    assert names12 == {"xla", "gemm"}


@pytest.mark.slow
def test_sweep_quick_cpu_and_engine_consumption(tmp_path):
    """The tool runs end-to-end (tiny config), emits a valid artifact,
    and Engine/CLI consume it via config.strategy."""
    art = sweep(model_name="yolov2-tiny", mode="w8a8", batch=2,
                input_size=64, iters=(4, 2), reps=1, quick=True,
                verbose=False)
    assert art["whole_net_ms"] > 0
    assert set(art["strategy"]) == {"0", "2", "4", "6", "8", "10", "12",
                                    "13", "14"}
    # every recorded candidate measured or explicitly null
    for li, row in art["measurements"].items():
        assert row, li
        assert any(v is not None for v in row.values()), (li, row)
    path = tmp_path / "strategy.json"
    path.write_text(json.dumps(art))

    strat = load_strategy(str(path))
    # every legal entry kind for layer 0 — CPU timings pick any of them
    assert strat[0][0] in ("xla", "gemm", "stem_rs", "stem_dg",
                           "fold_xla_k2", "fold_xla")

    eng = Engine(EngineConfig(mode="w8a8", kernel="auto", batch=2,
                              input_size=64, strategy=str(path))
                 ).load_weights(key=jax.random.PRNGKey(0)).prepare()
    assert eng._plan is not None
    # the engine's plan matches the artifact's strategy entry kinds
    by_li = {st.conv_li: st for st in eng._plan}
    for k, v in strat.items():
        assert by_li[k].kind == {"rs2": "rs"}.get(v[0], v[0])
    b, s, c = eng.detect(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    assert b.shape == (2, eng.config.max_detections, 4)


def test_sweep_rejects_fp32():
    with pytest.raises(ValueError, match="plan-sweep"):
        sweep(mode="fp32")


@pytest.mark.slow
def test_sweep_records_candidate_crashes(monkeypatch):
    """A candidate whose kernel RAISES must be recorded as a 'CRASHED'
    string in the measurements row (not silently null): a broken
    production kernel must be distinguishable from an illegal candidate,
    or the sweep would emit an all-XLA strategy without a trace."""
    import dnn_inference_engine_tpu.ops.pallas_conv as pc

    def boom(*a, **kw):
        raise RuntimeError("deliberately broken stem kernel")

    monkeypatch.setattr(pc, "stem_fused_k2", boom)
    art = sweep(model_name="yolov2-tiny", mode="w8a8", batch=2,
                input_size=64, iters=(4, 2), reps=1, quick=True,
                verbose=False)
    row0 = art["measurements"]["0"]
    crashed_vals = [v for v in row0.values()
                    if isinstance(v, str) and v.startswith("CRASHED")]
    assert crashed_vals and "deliberately broken" in crashed_vals[0]
    assert art["crashed_candidates"] >= 1
    # the sweep still completes and never selects the crashed kind
    assert art["strategy"]["0"][0] != "stem_rs"


def _assert_artifact_pins_table(fname, table, min_imgs_per_s,
                                max_imgs_per_s=56_600):
    """A committed chip sweep artifact must agree with its built-in
    table (the table is a cached measurement; drift in either fails CI)
    and its headline must be PHYSICALLY plausible — below the chip's
    MXU-bound ceiling (the round-4 fixed-iteration sweeps emitted 112k
    img/s before the auto-scaler; that class of artifact must never be
    committed again)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "docs", fname)
    with open(path) as f:
        art = json.load(f)
    assert art["backend"] == "tpu", art["backend"]
    measured = {int(k): tuple(v[:2]) for k, v in art["strategy"].items()}
    pinned = {k: tuple(v[:2]) for k, v in table.items()}
    assert measured == pinned, (fname, measured, pinned)
    assert min_imgs_per_s < art["images_per_s"] <= max_imgs_per_s, (
        fname, art["images_per_s"])


def test_committed_tpu_sweep_artifact_matches_default_strategy():
    from dnn_inference_engine_tpu.runtime.plan import _YOLOV2_STRATEGY
    _assert_artifact_pins_table("SWEEP_yolov2_w8a8_b32.json",
                                _YOLOV2_STRATEGY, 12_000)


def test_committed_yolov3_b16_sweep_pins_table():
    from dnn_inference_engine_tpu.runtime.plan import _YOLOV3_STRATEGY
    _assert_artifact_pins_table("SWEEP_yolov3_w8a8_b16.json",
                                _YOLOV3_STRATEGY, 12_000)


def test_committed_yolov2_b1_sweep_pins_batch_table():
    from dnn_inference_engine_tpu.runtime.plan import _BATCH_STRATEGIES
    _assert_artifact_pins_table("SWEEP_yolov2_w8a8_b1.json",
                                _BATCH_STRATEGIES[("yolov2-tiny", 1)],
                                4_000)


def test_committed_yolov2_b8_sweep_pins_batch_table():
    from dnn_inference_engine_tpu.runtime.plan import _BATCH_STRATEGIES
    _assert_artifact_pins_table("SWEEP_yolov2_w8a8_b8.json",
                                _BATCH_STRATEGIES[("yolov2-tiny", 8)],
                                9_000)


def test_committed_yolov2_w8_b1_sweep_pins_table():
    """BASELINE config 2's exact point (w8 batch-1), first swept in
    round 5 (round-4 verdict missing #2). The bf16 MXU ceiling at b1
    is far below the int8 one, so the plausibility band is the b1
    latency regime, not the throughput ceiling."""
    from dnn_inference_engine_tpu.runtime.plan import _W8_BATCH_STRATEGIES
    _assert_artifact_pins_table("SWEEP_yolov2_w8_b1.json",
                                _W8_BATCH_STRATEGIES[("yolov2-tiny", 1)],
                                3_000)


def test_committed_yolov3_w8_b16_sweep_pins_table():
    from dnn_inference_engine_tpu.runtime.plan import _W8_BATCH_STRATEGIES
    _assert_artifact_pins_table("SWEEP_yolov3_w8_b16.json",
                                _W8_BATCH_STRATEGIES[("yolov3-tiny", 16)],
                                6_000)


def test_committed_resnet18_w8_sweep_confirms_all_xla():
    """resnet18 w8 b32 swept all-xla as the winner
    (docs/SWEEP_resnet18_w8_b32.json, 1.2719 ms = 25.2k img/s, 0
    crashes) — which IS the no-entry default, so there is no table to
    pin; this asserts the artifact and the default stay in agreement."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "SWEEP_resnet18_w8_b32.json")
    with open(path) as f:
        art = json.load(f)
    assert art["backend"] == "tpu" and art["mode"] == "w8"
    assert all(v[0] == "xla" for v in art["strategy"].values()), art
    from dnn_inference_engine_tpu.runtime.plan import default_strategy
    assert default_strategy("resnet18", 32, mode="w8") == {}
    assert 15_000 < art["images_per_s"] <= 56_600, art["images_per_s"]


def test_w8_mode_selects_w8_pin():
    """default_strategy must route (model, w8, batch) to the w8 pin and
    leave w8a8 lookups untouched."""
    from dnn_inference_engine_tpu.runtime.plan import (
        _BATCH_STRATEGIES, _W8_BATCH_STRATEGIES, default_strategy)
    assert default_strategy("yolov2-tiny", 1, mode="w8") \
        is _W8_BATCH_STRATEGIES[("yolov2-tiny", 1)]
    assert default_strategy("yolov2-tiny", 1, mode="w8a8") \
        is _BATCH_STRATEGIES[("yolov2-tiny", 1)]
    # unswept w8 points fall back to the w8a8 pin (legal for the w8
    # walker, just not measured-optimal)
    assert default_strategy("yolov2-tiny", 8, mode="w8") \
        is _BATCH_STRATEGIES[("yolov2-tiny", 8)]
