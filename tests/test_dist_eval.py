"""Multi-process eval result merging (the collect_results equivalent).

Two "ranks" are simulated in one process: rank 0 runs its video shard
[0::2], rank 1 runs [1::2], and an injected allgather returns the union of
both shards. The merged metrics from the last rank must equal a
single-process run over all videos — the property the reference's
collect_results_cpu/gpu provide (/root/reference/mmpt/apis/test.py:131-236).
"""

import dataclasses
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tapvid_root(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("tapvid3")
    for v in range(3):
        rec = {
            "video": rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8),
            "points": rng.uniform(0.2, 0.8, (3, 4, 2)).astype(np.float32),
            "occluded": np.zeros((3, 4), bool),
        }
        with open(root / f"vid{v}.pkl", "wb") as f:
            pickle.dump(rec, f)
    return str(root)


def _small_cfg():
    from fgvc_tpu.apis.test import TASK_CONFIGS

    return dataclasses.replace(
        TASK_CONFIGS["davis"],
        input_size=(24, 24),
        frame_bucket=4,
        point_bucket=16,
        neighbor_range=6,
        tile=8,
    )


def test_allgather_objects_merges_in_rank_order():
    from fgvc_tpu.parallel.dist import allgather_objects

    shard0 = [(0, {"a": np.arange(3)}), (2, "x")]
    shard1 = [(1, 7.5)]

    def fake_gather(payload):
        return [pickle.dumps(shard0), pickle.dumps(shard1)]

    merged = allgather_objects(shard0, _gather_bytes=fake_gather)
    assert [p[0] for p in merged] == [0, 2, 1]
    np.testing.assert_array_equal(merged[0][1]["a"], np.arange(3))


def test_allgather_objects_single_process_passthrough():
    from fgvc_tpu.parallel.dist import allgather_objects

    objs = [(0, "a"), (1, "b")]
    assert allgather_objects(objs) == objs


def test_two_rank_tapvid_eval_matches_single_process(tapvid_root, monkeypatch):
    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset
    import fgvc_tpu.parallel.dist as dist

    cfg = _small_cfg()
    tracker = build_tracker(cfg)
    ds = TapVidDataset(tapvid_root, input_size=(24, 24))
    assert len(ds) == 3

    ref = eval_tapvid(tracker, ds)  # single process, all videos

    mailbox = []

    def fake_allgather(objs, _gather_bytes=None):
        mailbox.extend(objs)
        return list(mailbox)

    monkeypatch.setattr(dist, "allgather_objects", fake_allgather)
    # rank 0 sees only its own shard at gather time (partial metrics, ignored);
    # rank 1 gathers the union — its metrics must equal the single-process run.
    eval_tapvid(tracker, ds, rank=0, world=2)
    merged = eval_tapvid(tracker, ds, rank=1, world=2)

    # both shards were contributed exactly once, covering every video
    assert sorted(p[0] for p in mailbox) == [0, 1, 2]
    for k, v in ref.items():
        assert merged[k] == pytest.approx(v, abs=1e-9), k


def test_two_rank_jhmdb_indices_alignment(monkeypatch, tmp_path):
    """JHMDB evaluate index-aligns preds with annotations: a sharded run must
    score each prediction against ITS OWN video's ground truth."""
    import cv2
    import scipy.io as sio

    from fgvc_tpu.apis.test import build_tracker, eval_jhmdb
    from fgvc_tpu.datasets.jhmdb import JhmdbDataset
    import fgvc_tpu.parallel.dist as dist

    rng = np.random.default_rng(1)
    lists = tmp_path / "lists"
    lists.mkdir()
    lines = []
    for v in range(3):
        d = tmp_path / f"videos/v{v}"
        d.mkdir(parents=True)
        for t in range(3):
            cv2.imwrite(
                str(d / f"{t:05d}.png"),
                rng.integers(0, 256, (24, 32, 3), dtype=np.uint8),
            )
        sio.savemat(
            str(tmp_path / f"anno{v}.mat"),
            {"pos_img": rng.uniform(3, 20, (2, 15, 3)) + 1},
        )
        lines.append(f"anno{v}.mat videos/v{v}\n")
    (lists / "val_list.txt").write_text("".join(lines))

    from fgvc_tpu.apis.test import TASK_CONFIGS

    cfg = dataclasses.replace(
        TASK_CONFIGS["jhmdb"],
        input_size=(32, 32),
        frame_bucket=4,
        point_bucket=16,
        neighbor_range=6,
        tile=8,
    )
    tracker = build_tracker(cfg)
    ds = JhmdbDataset(str(tmp_path), str(lists), input_size=(32, 32))
    assert len(ds) == 3

    ref = eval_jhmdb(tracker, ds)

    mailbox = []

    def fake_allgather(objs, _gather_bytes=None):
        mailbox.extend(objs)
        return list(mailbox)

    monkeypatch.setattr(dist, "allgather_objects", fake_allgather)
    eval_jhmdb(tracker, ds, rank=0, world=2)
    merged = eval_jhmdb(tracker, ds, rank=1, world=2)

    assert sorted(p[0] for p in mailbox) == [0, 1, 2]
    for k, v in ref.items():
        assert merged[k] == pytest.approx(v, abs=1e-9), k


def test_tapvid_report_artifacts(tapvid_root, tmp_path):
    """evaluate(output_dir=...) writes json + csv + markdown + figure."""
    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    cfg = _small_cfg()
    tracker = build_tracker(cfg)
    ds = TapVidDataset(tapvid_root, input_size=(24, 24))
    eval_tapvid(tracker, ds, max_videos=1, output_dir=str(tmp_path))
    assert (tmp_path / "summariesdavis.json").exists()
    assert (tmp_path / "summariesdavis.csv").exists()
    txt = (tmp_path / "result.txt").read_text()
    assert "average_pts_within_thresh" in txt and "|" in txt
    assert (tmp_path / "figures" / "per_point_d_davis.png").exists()


def test_max_videos_is_global_across_world_sizes(tapvid_root):
    """max_videos truncates the GLOBAL list before sharding (review fix)."""
    from fgvc_tpu.apis.test import _my_videos

    assert _my_videos(10, 0, 1, max_videos=4) == [0, 1, 2, 3]
    assert _my_videos(10, 0, 2, max_videos=4) == [0, 2]
    assert _my_videos(10, 1, 2, max_videos=4) == [1, 3]
    # union across ranks == the single-process set
    union = sorted(
        _my_videos(10, 0, 2, max_videos=4) + _my_videos(10, 1, 2, max_videos=4)
    )
    assert union == [0, 1, 2, 3]


def test_track_video_artifact_written(tapvid_root, tmp_path):
    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    cfg = _small_cfg()
    tracker = build_tracker(cfg)
    ds = TapVidDataset(tapvid_root, input_size=(24, 24))
    eval_tapvid(tracker, ds, max_videos=1, output_dir=str(tmp_path))
    vids = list(tmp_path.glob("tracks_*.mp4"))
    assert len(vids) == 1 and vids[0].stat().st_size > 0
