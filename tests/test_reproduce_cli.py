"""tools/reproduce.py — the one-command benchmark-reproduction harness.

Covers the two halves of the real-data validation plan that can run without
mounted datasets: the checkpoint feature-parity probe (flax vs a torch twin
fed the SAME released-naming .pth) and the CLI driving a full TAP-Vid task
through run_task to a written report.
"""

import dataclasses
import json
import os
import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _save_released_style_ckpt(path, seed=3):
    """An mmcv-named, 'state_dict'-wrapped, 'backbone.'-prefixed .pth —
    the released res18_d1_fly_ytv_mixed_training.pth format."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_resnet import TorchResNet18, _randomize_bn_stats, _to_mmcv_naming

    torch.manual_seed(seed)
    tmodel = TorchResNet18(strides=(1, 1, 1, 4), pool=False, out_index=2).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=seed + 1)
    state = _to_mmcv_naming(
        {"backbone." + k: v for k, v in tmodel.state_dict().items()}
    )
    torch.save({"state_dict": state, "meta": {"epoch": 30}}, path)
    return tmodel


def test_parity_probe_roundtrip(tmp_path):
    from fgvc_tpu.cli.reproduce import parity_probe

    ckpt = str(tmp_path / "released.pth")
    _save_released_style_ckpt(ckpt)
    probe = parity_probe(ckpt, frames=1, size=64)
    assert probe["ok"], probe
    assert probe["max_abs"] < 1e-3


def test_probe_forward_is_highest_precision():
    """The probe forward must carry HIGHEST matmul precision into the
    lowered HLO.  The CPU test suite cannot catch a precision regression
    behaviorally (CPU default IS f32); on TPU the default rounds conv
    operands to bf16 and the probe then fails its 1e-3 bar on
    correctly-converted weights — this happened on chip in the round-5
    dress rehearsal (docs/rehearsal_eval.md).  Assert structurally."""
    import jax

    from fgvc_tpu.cli.reproduce import probe_forward
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(0), (32, 32))
    x = np.zeros((1, 32, 32, 3), np.float32)
    hlo = probe_forward(model).lower(variables, x).as_text()
    assert "HIGHEST" in hlo, "probe forward lost HIGHEST matmul precision"


def test_parity_probe_catches_corruption(tmp_path):
    """A deliberately broken conversion input must NOT pass the probe."""
    from fgvc_tpu.cli.reproduce import parity_probe

    ckpt = str(tmp_path / "broken.pth")
    _save_released_style_ckpt(ckpt)
    blob = torch.load(ckpt, map_location="cpu")
    k = "backbone.layer3.0.conv1.conv.weight"
    blob["state_dict"][k] = blob["state_dict"][k] + 0.5
    ckpt2 = str(tmp_path / "broken2.pth")
    # corrupt only the flax side's input by re-saving with a mismatched twin
    # key: the probe loads the same file into both models, so corrupt a key
    # the TWIN mapping misses instead — rename it to an unknown name
    blob["state_dict"]["backbone.layer3.0.conv1.conv.weight_zzz"] = (
        blob["state_dict"].pop(k)
    )
    torch.save(blob, ckpt2)
    with pytest.raises(Exception):
        parity_probe(ckpt2, frames=1, size=64)


def test_reproduce_cli_davis_end_to_end(tmp_path, monkeypatch, capsys):
    """The CLI on a synthetic TAP-Vid shard: parity probe + davis task +
    fast-mode sweep + report files."""
    import fgvc_tpu.apis.test as apis_test
    from fgvc_tpu.cli.reproduce import main

    # synthetic shard (24x24, 4 frames, 3 points)
    rng = np.random.default_rng(0)
    droot = tmp_path / "tapvid"
    droot.mkdir()
    rec = {
        "video": rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8),
        "points": rng.uniform(0.2, 0.8, (3, 4, 2)).astype(np.float32),
        "occluded": np.zeros((3, 4), bool),
    }
    with open(droot / "vid1.pkl", "wb") as f:
        pickle.dump(rec, f)

    ckpt = str(tmp_path / "released.pth")
    _save_released_style_ckpt(ckpt)

    small = dataclasses.replace(
        apis_test.TASK_CONFIGS["davis"],
        input_size=(24, 24),
        frame_bucket=4,
        point_bucket=16,
        neighbor_range=6,
        tile=8,
    )
    monkeypatch.setitem(apis_test.TASK_CONFIGS, "davis", small)

    out_dir = str(tmp_path / "rep")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "reproduce",
            "--checkpoint", ckpt,
            "--davis-root", str(droot),
            "--output-dir", out_dir,
            "--max-videos", "1",
            "--fast-modes",
        ],
    )
    # the probe at default 256² is slow on CPU; shrink it
    import fgvc_tpu.cli.reproduce as rep

    orig_probe = rep.parity_probe
    monkeypatch.setattr(
        rep, "parity_probe", lambda c: orig_probe(c, frames=1, size=64)
    )
    # synthetic data misses the ±0.5 reproduction bar, which since the
    # exit-code contract landed means main() raises SystemExit(1); the
    # report must still be fully written first
    try:
        main()
        code = 0
    except SystemExit as e:
        code = e.code
    assert code in (0, 1)

    report = json.load(open(os.path.join(out_dir, "report.json")))
    assert report["feature_parity"]["ok"]
    davis = report["tasks"]["davis"]
    assert davis["metric"] == "average_pts_within_thresh"
    assert 0.0 <= davis["value"] <= 100.0
    assert set(report["fast_modes"]) == {
        "bf16_matmuls", "pallas_bf16_yuv", "coarse_decode"
    }
    for m in report["fast_modes"].values():
        assert np.isfinite(m["value"])
    assert os.path.exists(os.path.join(out_dir, "report.md"))
    text = capsys.readouterr().out
    assert "| davis |" in text
