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
