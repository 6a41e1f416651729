"""Heatmap-peak visibility prediction (TestConfig.visibility_mode).

The reference's VanillaTracker returns no occlusion estimate (constant-zero
visibilities, /root/reference/mmpt/models/trackers/vanilla_tracker.py:227-303)
— visibility_mode='none' reproduces that.  'heatmap' is a framework addition:
a point counts visible at frame t when the propagated heatmap's peak retains
at least `visibility_threshold` of the query frame's peak.  Calibration on
synthetic MOVi scenes with ground-truth occlusion lives in
tools/bench/visibility_study.py / docs/visibility_study.md.
"""

import dataclasses

import numpy as np
import pytest


def _make_tracker(visibility_mode, threshold=0.25, **over):
    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(24, 24), frame_bucket=4, point_bucket=4,
        attention_impl="tiled", tile=6,
        visibility_mode=visibility_mode, visibility_threshold=threshold,
        **over,
    )
    # identity "backbone": the video itself is the feature map, so tests
    # control feature similarity directly (stride 1 != production stride 2,
    # which only scales the gaussian init maps)
    return Tracker(lambda v, x: x, {}, cfg)


def _run(tracker, video, pts):
    query = np.concatenate(
        [np.zeros((len(pts), 1), np.float32), np.asarray(pts, np.float32)],
        axis=1,
    )
    return tracker.track_points(video.astype(np.float32), query)


def test_mode_none_keeps_reference_zero_visibilities():
    rng = np.random.default_rng(0)
    video = rng.standard_normal((6, 24, 24, 3))
    out = _run(_make_tracker("none"), video, [[6.0, 6.0], [12.0, 15.0]])
    assert out["visibilities"].dtype == bool
    assert not out["visibilities"].any()


def test_frozen_video_stays_visible():
    """Identical frames: the propagated peak never decays below the
    query-frame peak, so every frame is predicted visible."""
    rng = np.random.default_rng(1)
    frame = rng.standard_normal((1, 24, 24, 3))
    video = np.repeat(frame, 6, axis=0)
    out = _run(_make_tracker("heatmap"), video, [[6.0, 6.0], [12.0, 15.0]])
    assert out["visibilities"].all()


def test_collect_threshold_mechanics():
    """track_points_collect turns raw peak columns into visibility flags:
    visible iff peak_t / peak_query >= threshold (query frame ratio = 1)."""
    tracker = _make_tracker("heatmap", threshold=0.5)
    coords = np.zeros((4, 2, 3), np.float32)
    coords[..., :2] = 7.0
    coords[:, 0, 2] = [0.8, 0.6, 0.3, 0.39]   # ratios 1, .75, .375, .4875
    coords[:, 1, 2] = [1.0, 0.5, 0.49, 0.51]  # ratios 1, .5, .49, .51
    disp = {"pending": [(0, np.array([0, 1]), coords)], "T": 4, "P": 2}
    out = tracker.track_points_collect(disp)
    np.testing.assert_array_equal(
        out["visibilities"],
        np.array([[True, True], [True, True], [False, False], [False, True]]),
    )


def test_disappearing_object_ranks_below_stable_point():
    """End-to-end peak behavior: a point on an object that vanishes from
    the video decays its peak ratio below a point on frozen background —
    the ordering the MOVi-calibrated threshold exploits
    (docs/visibility_study.md)."""
    rng = np.random.default_rng(0)
    T, H = 8, 24
    bg = rng.standard_normal((H, H, 3)).astype(np.float32)
    video = np.repeat(bg[None], T, axis=0).copy()
    obj = 5.0 + rng.standard_normal((5, 5, 3)).astype(np.float32)
    for t in range(4):  # object present frames 0-3, gone after
        video[t, 4:9, 4:9] = obj
    # threshold between the two measured bands: vanished-object ratio
    # (~0.89) vs frozen-background ratio (~0.998)
    out = _run(
        _make_tracker("heatmap", threshold=0.95),
        video,
        [[6.0, 6.0], [18.0, 18.0]],
    )
    vis = out["visibilities"]
    assert vis[:, 1].all(), "frozen-background point must stay visible"
    assert vis[:4, 0].all(), "object point visible while present"
    assert not vis[5:, 0].any(), "object point occluded after it vanishes"


def test_pre_query_frames_stay_false():
    """Forward-only propagation (reference semantics): frames before a
    point's query frame carry no prediction — visibility stays False."""
    rng = np.random.default_rng(3)
    frame = rng.standard_normal((1, 24, 24, 3))
    video = np.repeat(frame, 6, axis=0)
    tracker = _make_tracker("heatmap")
    query = np.array([[2.0, 6.0, 6.0], [0.0, 12.0, 15.0]], np.float32)
    out = tracker.track_points(video.astype(np.float32), query)
    vis = out["visibilities"]
    assert not vis[:2, 0].any() and vis[2:, 0].all()
    assert vis[:, 1].all()


def test_trajectories_identical_across_modes():
    """The visibility estimate is a pure by-product — coordinates must be
    bit-identical between modes (same jitted program, peak column unused
    under 'none')."""
    rng = np.random.default_rng(4)
    video = rng.standard_normal((6, 24, 24, 3))
    pts = [[6.0, 6.0], [12.0, 15.0]]
    a = _run(_make_tracker("none"), video, pts)
    b = _run(_make_tracker("heatmap"), video, pts)
    np.testing.assert_array_equal(a["trajectories"], b["trajectories"])


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        _make_tracker("cycle")


def test_report_labels_follow_prediction(tmp_path):
    """result.txt tags AJ/OA as degenerate only when no visibility was
    predicted (datasets/tapvid.py _write_reports)."""
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    rng = np.random.default_rng(5)
    T, P = 6, 3
    base = {
        "trajectories_gt": rng.uniform(0, 255, (T, P, 2)).astype(np.float32),
        "visibilities_gt": np.ones((T, P), bool),
        "query_points": np.concatenate(
            [np.zeros((P, 1)), rng.uniform(0, 255, (P, 2))], axis=1
        ).astype(np.float32),
    }
    ds = TapVidDataset.__new__(TapVidDataset)
    ds.eval_size = (256, 256)
    ds.input_size = (256, 256)
    ds.query_mode = "first"
    ds.subset_name = "test"

    for vis, expect_tag in [
        (np.zeros((T, P), bool), True),
        (np.ones((T, P), bool), False),
    ]:
        out = tmp_path / ("degen" if expect_tag else "real")
        res = dict(
            base,
            trajectories_pred=base["trajectories_gt"] + 1.0,
            visibilities_pred=vis,
        )
        ds.evaluate([res], output_dir=str(out))
        text = (out / "result.txt").read_text()
        assert ("degenerate: visibility not predicted" in text) == expect_tag
