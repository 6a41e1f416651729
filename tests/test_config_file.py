"""--config JSON files: the Config.fromfile equivalent on both CLIs.

Layering contract: task preset / TrainConfig defaults -> file -> explicitly
passed flags (the reference reads everything from the config file and lets
a few argparse flags override — tools/test.py:75,135).
"""

import json
import sys

import numpy as np
import pytest


def test_config_from_file_overlay_and_validation(tmp_path):
    from fgvc_tpu.config import TestConfig, TrainConfig, config_from_file

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "topk": 5, "input_size": [128, 128], "matmul_precision": "high",
    }))
    c = config_from_file(str(p), TestConfig())
    assert c.topk == 5
    assert c.input_size == (128, 128)  # list -> tuple coercion
    assert c.matmul_precision == "high"
    assert c.temperature == TestConfig().temperature  # untouched fields keep

    p.write_text(json.dumps({"radius": 12, "loss_weight_sup": 0.5}))
    t = config_from_file(str(p), TrainConfig())
    assert t.radius == 12 and t.loss_weight_sup == 0.5

    p.write_text(json.dumps({"no_such_knob": 1}))
    with pytest.raises(ValueError, match="no_such_knob"):
        config_from_file(str(p), TestConfig())

    p.write_text(json.dumps([1, 2]))
    with pytest.raises(ValueError, match="JSON object"):
        config_from_file(str(p), TestConfig())


def test_train_cli_config_layering(tmp_path, monkeypatch):
    """preset -> file -> flags on fgvc-train, without running a step."""
    import fgvc_tpu.apis.train as apis_train
    from fgvc_tpu.cli.train import main

    captured = {}

    def fake_train_model(cfg, batches, work_dir, **kw):
        captured["cfg"] = cfg
        return None

    monkeypatch.setattr(apis_train, "train_model", fake_train_model)
    cfgfile = tmp_path / "train.json"
    cfgfile.write_text(json.dumps({
        "radius": 5, "crop_size": 64, "lr": 0.01, "batch_size": 2,
    }))
    monkeypatch.setattr(sys, "argv", [
        "train", "--synthetic", "--config", str(cfgfile),
        "--crop", "32",              # explicit flag beats the file
        "--max-steps", "1", "--platform", "cpu",
        "--work-dir", str(tmp_path / "wd"),
    ])
    main()
    cfg = captured["cfg"]
    assert cfg.radius == 5          # from file
    assert cfg.lr == 0.01           # from file
    assert cfg.batch_size == 2      # from file
    assert cfg.crop_size == 32      # flag wins over file's 64


def test_test_cli_config_layering(tmp_path, monkeypatch):
    """preset -> file -> flags on fgvc-test, intercepting run_task."""
    import fgvc_tpu.apis.test as apis_test
    from fgvc_tpu.cli.test import main

    captured = {}

    def fake_run_task(task, data_root, **kw):
        captured["cfg"] = kw["test_cfg"]
        return {"ok": 1.0}

    monkeypatch.setattr(apis_test, "run_task", fake_run_task)
    cfgfile = tmp_path / "test.json"
    cfgfile.write_text(json.dumps({
        "topk": 7, "matmul_precision": "default", "neighbor_range": 12,
    }))
    monkeypatch.setattr(sys, "argv", [
        "test", "--task", "davis", "--data-root", str(tmp_path),
        "--config", str(cfgfile),
        "--precision", "high",       # explicit flag beats the file
        "--platform", "cpu",
    ])
    main()
    cfg = captured["cfg"]
    assert cfg.topk == 7                       # from file
    assert cfg.neighbor_range == 12            # from file
    assert cfg.matmul_precision == "high"      # flag wins
    assert cfg.step == 512                     # davis preset preserved

    # boolean knobs can be reset from the command line (--no-save-mem
    # beats a file that turned save_mem on)
    cfgfile.write_text(json.dumps({"save_mem": True}))
    monkeypatch.setattr(sys, "argv", [
        "test", "--task", "vos", "--data-root", str(tmp_path),
        "--config", str(cfgfile), "--no-save-mem", "--platform", "cpu",
    ])
    main()
    assert captured["cfg"].save_mem is False


def test_shipped_configs_restate_presets():
    """configs/*.json must stay in sync with the built-in presets."""
    import os

    from fgvc_tpu.apis.test import TASK_CONFIGS
    from fgvc_tpu.config import TrainConfig, config_from_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for task in ("davis", "kinetics", "jhmdb", "badja"):
        path = os.path.join(repo, "configs", "eval", f"{task}.json")
        assert config_from_file(path, TASK_CONFIGS[task]) == TASK_CONFIGS[task]
    path = os.path.join(repo, "configs", "train", "mixed_res18_d1.json")
    assert config_from_file(path, TrainConfig()) == TrainConfig()


def test_serve_cli_config_layering(tmp_path):
    import argparse

    from fgvc_tpu.cli.serve import build_serve_cfg

    cfgfile = tmp_path / "serve.json"
    cfgfile.write_text(json.dumps({
        "topk": 3, "precede_frames": 2, "matmul_precision": "default",
        "input_size": [320, 320], "visibility_mode": "none",
    }))
    args = argparse.Namespace(
        config=str(cfgfile), input_size=64, precision=None,
        visibility_mode=None,
    )
    cfg = build_serve_cfg(args)
    assert cfg.topk == 3 and cfg.precede_frames == 2      # from file
    assert cfg.input_size == (64, 64)                     # flag wins
    assert cfg.matmul_precision == "default"              # file survives
    assert cfg.visibility_mode == "none"                  # file survives

    # no file, no flags: serving defaults
    args = argparse.Namespace(
        config=None, input_size=None, precision=None, visibility_mode=None,
    )
    cfg = build_serve_cfg(args)
    assert cfg.input_size == (256, 256)
    assert cfg.matmul_precision == "highest"
    assert cfg.visibility_mode == "heatmap"
