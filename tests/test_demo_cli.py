"""tools/demo.py smoke: trajectory video + correspondence overlay."""

import os
import subprocess
import sys

import numpy as np


def _write_frames(d, n=4, size=48):
    import cv2

    rng = np.random.default_rng(0)
    os.makedirs(d, exist_ok=True)
    for t in range(n):
        cv2.imwrite(
            os.path.join(d, f"{t:03d}.png"),
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8),
        )


def test_demo_trajectory_and_correspondence(tmp_path):
    frames = tmp_path / "frames"
    _write_frames(str(frames))

    out_mp4 = tmp_path / "demo.mp4"
    r = subprocess.run(
        [sys.executable, "tools/demo.py", "--frames", str(frames),
         "--grid", "2", "--size", "32", "--out", str(out_mp4),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_mp4.exists() and out_mp4.stat().st_size > 0

    out_png = tmp_path / "corr.png"
    r2 = subprocess.run(
        [sys.executable, "tools/demo.py", "--frames", str(frames),
         "--correspondence", "--size", "32", "--out", str(out_png),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=540,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert out_png.exists() and out_png.stat().st_size > 0


def test_demo_vos_mask_mode(tmp_path, monkeypatch):
    import sys

    import cv2
    import numpy as np

    from fgvc_tpu.cli.demo import main

    rng = np.random.default_rng(2)
    fdir = tmp_path / "frames"
    fdir.mkdir()
    for t in range(3):
        cv2.imwrite(
            str(fdir / f"{t:03d}.jpg"),
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
        )
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 10:24] = 1
    cv2.imwrite(str(tmp_path / "mask.png"), mask)
    out = str(tmp_path / "vos.mp4")
    monkeypatch.setattr(sys, "argv", [
        "demo", "--frames", str(fdir), "--size", "32",
        "--mask", str(tmp_path / "mask.png"), "--out", out,
        "--platform", "cpu",
    ])
    main()
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_demo_video_file_input(tmp_path, monkeypatch):
    """--video decodes an mp4 through the pipeline loading stages
    (datasets/video_decode.py) with stride/max-frames applied."""
    import sys

    import cv2
    import pytest

    from fgvc_tpu.cli.demo import main

    rng = np.random.default_rng(3)
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    for _ in range(6):
        w.write(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8))
    w.release()
    out = str(tmp_path / "demo.mp4")
    monkeypatch.setattr(sys, "argv", [
        "demo", "--video", path, "--stride", "2", "--max-frames", "3",
        "--grid", "2", "--size", "32", "--out", out, "--platform", "cpu",
    ])
    main()
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_demo_rejects_both_or_neither_source(tmp_path, monkeypatch):
    import sys

    import pytest

    from fgvc_tpu.cli.demo import main

    monkeypatch.setattr(sys, "argv", ["demo", "--out", "x.mp4"])
    with pytest.raises(SystemExit):
        main()
