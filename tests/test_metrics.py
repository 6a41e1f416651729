"""TAP-Vid metric tests against the published docstring example and oracles."""

import numpy as np

from fgvc_tpu.core.metrics.tapvid import (
    aggregate_summaries,
    compute_point_summary,
    compute_tapvid_metrics,
)


def test_docstring_example():
    # The reference compute_summary docstring example
    # (/root/reference/mmpt/datasets/flyingthingsplus/utils/figures.py:218).
    s = compute_point_summary(
        trajectory_gt=np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]),
        trajectory_pred=np.array([[0.0, 0.0], [2.0, 2.0], [3.0, 3.0]]),
        visibility_gt=np.array([True, True, False]),
        visibility_pred=np.array([True, True, True]),
        query_point=np.array([0.0, 0.0, 0.0]),
        query_mode="first",
    )
    assert abs(s["ade"] - 0.9428090453147888) < 1e-6
    assert abs(s["ade_visible"] - 0.7071067690849304) < 1e-6
    assert s["n_timesteps"] == 3
    assert s["n_timesteps_visible"] == 2
    assert abs(s["occlusion_accuracy"] - 50.0) < 1e-6
    assert abs(s["jaccard_1"] - 0.0) < 1e-6
    assert abs(s["jaccard_2"] - 50.0) < 1e-6
    assert abs(s["average_jaccard"] - 40.0) < 1e-6
    assert abs(s["pts_within_1"] - 0.0) < 1e-6
    assert abs(s["pts_within_2"] - 100.0) < 1e-6
    assert abs(s["average_pts_within_thresh"] - 80.0) < 1e-6


def test_perfect_prediction():
    T = 10
    gt = np.cumsum(np.ones((1, 1, T, 2)), axis=2)
    occ = np.zeros((1, 1, T), dtype=bool)
    qp = np.zeros((1, 1, 3))
    m = compute_tapvid_metrics(qp, occ, gt, occ, gt, "first")
    assert m["average_pts_within_thresh"][0] == 1.0
    assert m["average_jaccard"][0] == 1.0
    assert m["occlusion_accuracy"][0] == 1.0


def test_eval_excludes_query_frame():
    T = 3
    gt = np.zeros((1, 1, T, 2))
    pred = gt.copy()
    pred[0, 0, 0] = 100.0  # wrong ONLY at the query frame -> ignored
    occ = np.zeros((1, 1, T), dtype=bool)
    qp = np.zeros((1, 1, 3))
    m = compute_tapvid_metrics(qp, occ, gt, occ, pred, "first")
    assert m["average_pts_within_thresh"][0] == 1.0


def test_aggregate():
    summaries = [
        {"average_pts_within_thresh": 60.0, "average_jaccard": 40.0,
         "occlusion_accuracy": 80.0, "ade": 2.0, "ade_visible": 1.0,
         **{f"pts_within_{t}": 50.0 for t in (1, 2, 4, 8, 16)},
         **{f"jaccard_{t}": 30.0 for t in (1, 2, 4, 8, 16)}},
        {"average_pts_within_thresh": 80.0, "average_jaccard": 60.0,
         "occlusion_accuracy": 90.0, "ade": 1.0, "ade_visible": float("nan"),
         **{f"pts_within_{t}": 70.0 for t in (1, 2, 4, 8, 16)},
         **{f"jaccard_{t}": 50.0 for t in (1, 2, 4, 8, 16)}},
    ]
    agg = aggregate_summaries(summaries)
    assert abs(agg["average_pts_within_thresh"] - 70.0) < 1e-9
    assert abs(agg["ade_visible"] - 1.0) < 1e-9  # nan skipped


def test_sample_queries_first():
    from fgvc_tpu.datasets.tapvid import sample_queries_first

    occluded = np.array([
        [True, False, False, False],
        [False, False, True, False],
        [True, True, True, True],  # never visible -> dropped
    ])
    pts = np.arange(3 * 4 * 2, dtype=np.float32).reshape(3, 4, 2)
    out = sample_queries_first(occluded, pts)
    assert out["query_points"].shape == (2, 3)
    # first track becomes query at t=1, (t, y, x)
    np.testing.assert_allclose(out["query_points"][0], [1, pts[0, 1, 1], pts[0, 1, 0]])
    np.testing.assert_allclose(out["query_points"][1], [0, pts[1, 0, 1], pts[1, 0, 0]])


def test_sample_queries_strided():
    from fgvc_tpu.datasets.tapvid import sample_queries_strided

    occluded = np.zeros((2, 11), dtype=bool)
    occluded[1, 5] = True
    pts = np.random.default_rng(0).random((2, 11, 2)).astype(np.float32)
    out = sample_queries_strided(occluded, pts, stride=5)
    # queries at t=0 (2 tracks), t=5 (1 track), t=10 (2 tracks)
    assert out["query_points"].shape[0] == 5
    assert (out["query_points"][:, 0] == [0, 0, 5, 10, 10]).all()
