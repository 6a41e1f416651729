"""tools/data/generate_tapvid_kinetics.py: CSV + mp4 -> eval pickles
(the reference's tools/data/generate_tapvid.py equivalent), decoding
through the pipeline loading stages (datasets/video_decode.py)."""

import csv
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest


def test_kinetics_pickle_generation(tmp_path):
    import cv2

    rng = np.random.default_rng(7)
    vroot = tmp_path / "clips"
    vroot.mkdir()
    path = str(vroot / "vid_a.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (40, 32))
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    for _ in range(5):
        w.write(rng.integers(0, 256, (32, 40, 3), dtype=np.uint8))
    w.release()

    csv_path = str(tmp_path / "ann.csv")
    with open(csv_path, "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["video_id", "point_id", "frame", "x", "y", "occluded"])
        for t in range(5):
            wtr.writerow(["vid_a", 0, t, 0.25, 0.5, 0])
            wtr.writerow(["vid_a", 1, t, 0.75, 0.25, t % 2])
        # a video with no file on disk must be skipped, not crash
        wtr.writerow(["vid_missing", 0, 0, 0.5, 0.5, 0])

    out = tmp_path / "pkls"
    r = subprocess.run(
        [sys.executable, "tools/data/generate_tapvid_kinetics.py",
         "--csv", csv_path, "--video-root", str(vroot),
         "--out", str(out), "--size", "24"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote 1 video pickles" in r.stdout

    with open(out / "vid_a.pkl", "rb") as f:
        d = pickle.load(f)
    assert d["video"].shape == (5, 24, 24, 3)
    assert d["video"].dtype == np.uint8
    assert d["points"].shape == (2, 5, 2)
    assert d["occluded"].shape == (2, 5)
    np.testing.assert_allclose(d["points"][0, 0], [0.25, 0.5])
    assert d["occluded"][1].tolist() == [False, True, False, True, False]
