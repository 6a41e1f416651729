"""TAP-Vid-Kinetics direct-from-clips eval (datasets/tapvid_kinetics.py):
the CSV + mp4 path that makes pickle materialization optional."""

import csv
import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(5)
    base = tmp_path_factory.mktemp("kinclips")
    vroot = base / "clips"
    vroot.mkdir()
    T = 4
    for vid in ("clip_a", "clip_b"):
        w = cv2.VideoWriter(
            str(vroot / f"{vid}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
            10, (40, 32),
        )
        if not w.isOpened():
            pytest.skip("no mp4 encoder in this cv2 build")
        for _ in range(T):
            w.write(rng.integers(0, 256, (32, 40, 3), dtype=np.uint8))
        w.release()

    csv_path = base / "ann.csv"
    with open(csv_path, "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["video_id", "point_id", "frame", "x", "y", "occluded"])
        for vid in ("clip_a", "clip_b"):
            for pid in range(3):
                for t in range(T):
                    wtr.writerow(
                        [vid, pid, t, 0.2 + 0.2 * pid, 0.5, 0]
                    )
        wtr.writerow(["clip_gone", 0, 0, 0.5, 0.5, 0])  # no file on disk
    return {"video_root": str(vroot), "csv": str(csv_path)}


def test_dataset_protocol(clips):
    from fgvc_tpu.datasets.tapvid_kinetics import TapVidKineticsVideoDataset

    ds = TapVidKineticsVideoDataset(
        clips["video_root"], clips["csv"], input_size=(32, 32)
    )
    assert len(ds) == 2 and ds.missing_clips == 1
    item = ds[0]
    assert item["video"].shape == (4, 32, 32, 3)
    assert item["video"].dtype == np.uint8
    P = item["query_points"].shape[0]
    assert item["trajectories"].shape == (4, P, 2)
    assert item["visibilities"].shape == (4, P)
    # CSV x=0.2 (point 0) -> input pixels
    assert np.isclose(item["trajectories"][0, :, 0].min(), 0.2 * 32, atol=1)


def test_run_task_kinetics_from_clips(clips, tmp_path):
    from fgvc_tpu.apis.test import TASK_CONFIGS, run_task

    cfg = dataclasses.replace(
        TASK_CONFIGS["kinetics"],
        input_size=(32, 32), frame_bucket=4, point_bucket=8,
        neighbor_range=6, tile=8,
    )
    out = run_task(
        "kinetics", clips["video_root"], annotations=clips["csv"],
        test_cfg=cfg, max_videos=1, output_dir=str(tmp_path / "report"),
    )
    assert "average_pts_within_thresh" in out
    assert 0 <= out["average_pts_within_thresh"] <= 100


def test_annotations_rejected_for_other_tasks(clips):
    from fgvc_tpu.apis.test import run_task

    with pytest.raises(ValueError, match="kinetics"):
        run_task("davis", clips["video_root"], annotations=clips["csv"])
