"""CLI driver tests (reference P5; SURVEY.md 2.4)."""

import numpy as np
import pytest

from dnn_inference_engine_tpu import cli


def test_detect_command(tmp_path, capsys):
    from PIL import Image
    img_path = str(tmp_path / "in.jpg")
    out_path = str(tmp_path / "out.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
                    ).save(img_path)
    # small input size via config file to keep CPU runtime down
    cfg_path = str(tmp_path / "cfg.json")
    from dnn_inference_engine_tpu.config import EngineConfig
    EngineConfig(input_size=64).to_json(cfg_path)
    cli.main(["detect", "--image", img_path, "--out", out_path,
              "--config", cfg_path, "--score-thresh", "0.2"])
    out = capsys.readouterr().out
    assert "detections in" in out
    import os
    assert os.path.exists(out_path)


def test_unknown_subcommand():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_missing_required_arg():
    with pytest.raises(SystemExit):
        cli.main(["detect"])          # --image required


def test_config_json_roundtrip(tmp_path):
    from dnn_inference_engine_tpu.config import EngineConfig
    p = str(tmp_path / "c.json")
    cfg = EngineConfig(model="yolov3-tiny", mode="w8", batch=4,
                       mesh_shape=(2, 4))
    cfg.to_json(p)
    cfg2 = EngineConfig.from_json(p)
    assert cfg2 == cfg


def test_hlo_scope_map_parses_metadata():
    """The xplane attribution's HLO parser maps instruction names to
    their per-stage named scopes via metadata op_name (the core of
    cli trace / tools/trace_attrib.py)."""
    from dnn_inference_engine_tpu.runtime.profiling import hlo_scope_map
    hlo = '''
  %fusion.3 = s8[32,104,104,128]{3,0,2,1:T(8,128)(4,1)S(1)} fusion(%a), kind=kOutput, calls=%fc.5, metadata={op_name="jit(_fwd)/stage1_fold_xla_L2_fold2/conv_general_dilated" source_file="x.py"}
  ROOT %copy.27 = s8[1]{0} copy(%p), metadata={op_name="jit(_fwd)/stage0_stem_rs_L0_fold4/jit(stem_fused_k2)/pallas_call"}
  %copy.10 = u8[2]{0} copy(%x)
'''
    m = hlo_scope_map(hlo)
    assert m["fusion.3"][:2] == ("fusion", "stage1_fold_xla_L2_fold2")
    assert m["copy.27"][:2] == ("copy", "stage0_stem_rs_L0_fold4")
    assert m["copy.10"][:2] == ("copy", None)


def test_trace_attribution_cpu_raises_clear_error():
    """On CPU backends the xplane has no accelerator device plane; the
    attribution must say so instead of asserting opaquely."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from dnn_inference_engine_tpu.runtime.profiling import trace_attribution
    if jax.default_backend() == "tpu":
        _pytest.skip("error path is the CPU lane's")
    f = jax.jit(lambda p, x: (x @ p).sum())
    p = jnp.ones((8, 8)); x = jnp.ones((2, 8))
    try:
        import tensorflow  # noqa: F401
    except ImportError:
        _pytest.skip("needs tensorflow's xplane schema")
    with _pytest.raises(RuntimeError, match="device plane"):
        trace_attribution(f, p, x, runs=2)
