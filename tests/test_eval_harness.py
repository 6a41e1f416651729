"""End-to-end eval harness regression: synthetic fixtures through the full
dataset → tracker → metrics glue for all five tasks (tiny shapes, CPU)."""

import dataclasses
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    import cv2
    import scipy.io as sio
    from PIL import Image

    rng = np.random.default_rng(0)
    base = tmp_path_factory.mktemp("evalfix")

    # JHMDB
    jr = base / "jhmdb"
    (jr / "videos/v1").mkdir(parents=True)
    (jr / "lists").mkdir()
    for t in range(4):
        cv2.imwrite(
            str(jr / f"videos/v1/{t:05d}.png"),
            rng.integers(0, 256, (24, 32, 3), dtype=np.uint8),
        )
    sio.savemat(str(jr / "anno1.mat"), {"pos_img": rng.uniform(3, 20, (2, 15, 4)) + 1})
    (jr / "lists/val_list.txt").write_text("anno1.mat videos/v1\n")

    # BADJA
    br = base / "badja"
    (br / "JPEGImages/Full-Resolution/dog").mkdir(parents=True)
    (br / "Annotations/Full-Resolution/dog").mkdir(parents=True)
    (br / "joint_annotations").mkdir()
    for t in range(3):
        cv2.imwrite(
            str(br / f"JPEGImages/Full-Resolution/dog/{t:05d}.jpg"),
            rng.integers(0, 256, (32, 48, 3), dtype=np.uint8),
        )
        seg = np.zeros((32, 48), np.uint8)
        seg[8:20, 12:30] = 1
        cv2.imwrite(str(br / f"Annotations/Full-Resolution/dog/{t:05d}.png"), seg)
    entries = [
        {
            "image_path": "badja/JPEGImages/Full-Resolution/dog/%05d.jpg" % t,
            "segmentation_path": "badja/Annotations/Full-Resolution/dog/%05d.png" % t,
            "joints": rng.uniform(3, 28, (37, 2)).tolist(),
            "visibility": [1] * 37,
        }
        for t in (0, 2)
    ]
    (br / "joint_annotations/dog.json").write_text(json.dumps(entries))

    # DAVIS VOS
    vr = base / "davis"
    (vr / "JPEGImages/480p/seq1").mkdir(parents=True)
    (vr / "Annotations/480p/seq1").mkdir(parents=True)
    (vr / "ImageSets/2017").mkdir(parents=True)
    for t in range(3):
        cv2.imwrite(
            str(vr / f"JPEGImages/480p/seq1/{t:05d}.jpg"),
            rng.integers(0, 256, (24, 40, 3), dtype=np.uint8),
        )
        m = np.zeros((24, 40), np.uint8)
        m[5:12, 10:22] = 1
        Image.fromarray(m, mode="P").save(
            str(vr / f"Annotations/480p/seq1/{t:05d}.png")
        )
    (vr / "ImageSets/2017/val.txt").write_text("seq1\n")

    # TAP-Vid shard
    tr = base / "tapvid"
    tr.mkdir()
    import pickle

    rec = {
        "video": rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8),
        "points": rng.uniform(0.2, 0.8, (3, 4, 2)).astype(np.float32),
        "occluded": np.zeros((3, 4), bool),
    }
    with open(tr / "vid1.pkl", "wb") as f:
        pickle.dump(rec, f)

    return dict(jhmdb=str(jr), badja=str(br), davis=str(vr), tapvid=str(tr))


def _small_cfg(task, **kw):
    from fgvc_tpu.apis.test import TASK_CONFIGS

    return dataclasses.replace(
        TASK_CONFIGS[task],
        frame_bucket=4,
        point_bucket=16,
        neighbor_range=6,
        tile=8,
        **kw,
    )


def test_jhmdb_harness(fixtures):
    from fgvc_tpu.apis.test import build_tracker, eval_jhmdb
    from fgvc_tpu.datasets.jhmdb import JhmdbDataset

    cfg = _small_cfg("jhmdb", input_size=(32, 32))
    tr = build_tracker(cfg)
    ds = JhmdbDataset(
        fixtures["jhmdb"], os.path.join(fixtures["jhmdb"], "lists"),
        input_size=(32, 32),
    )
    out = eval_jhmdb(tr, ds)
    assert set(out) == {f"PCK@{a}" for a in (0.1, 0.2, 0.3, 0.4, 0.5)}
    assert all(0 <= v <= 100 for v in out.values())


def test_badja_harness(fixtures):
    from fgvc_tpu.apis.test import build_tracker, eval_badja
    from fgvc_tpu.datasets.badja import BadjaDataset

    cfg = _small_cfg("badja", input_size=(32, 48))
    tr = build_tracker(cfg)
    ds = BadjaDataset(fixtures["badja"], fixtures["badja"], size=(32, 48), scale=2)
    out = eval_badja(tr, ds)
    assert "PCK@0.2" in out and 0 <= out["PCK@0.2"] <= 100


def test_vos_harness(fixtures):
    from fgvc_tpu.apis.test import build_tracker, eval_vos
    from fgvc_tpu.datasets.davis_vos import DavisVosDataset

    cfg = _small_cfg("vos", input_size=(24, 40))
    tr = build_tracker(cfg)
    ds = DavisVosDataset(fixtures["davis"], input_size=(24, 40))
    out = eval_vos(tr, ds)
    assert "J&F-Mean" in out and 0 <= out["J&F-Mean"] <= 1


def test_tapvid_harness(fixtures):
    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    cfg = _small_cfg("davis", input_size=(24, 24))
    tr = build_tracker(cfg)
    ds = TapVidDataset(fixtures["tapvid"], input_size=(24, 24))
    out = eval_tapvid(tr, ds)
    assert "average_pts_within_thresh" in out


def test_tapvid_strided_query_mode(fixtures):
    """--query-mode strided: multiple queries per track, strided protocol
    metrics (reference sample_queries_strided,
    tapvid_evaluation_datasets.py:283)."""
    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    cfg = _small_cfg("davis", input_size=(24, 24))
    tr = build_tracker(cfg)
    ds = TapVidDataset(
        fixtures["tapvid"], input_size=(24, 24), query_mode="strided"
    )
    first = TapVidDataset(fixtures["tapvid"], input_size=(24, 24))
    # strided sampling yields at least as many queries as first-mode
    assert (
        ds[0]["query_points"].shape[0] >= first[0]["query_points"].shape[0]
    )
    out = eval_tapvid(tr, ds)
    assert "average_pts_within_thresh" in out
    assert np.isfinite(out["average_pts_within_thresh"])


def test_tapvid_multidevice_dp_eval(fixtures):
    """Single-process data-parallel eval: round-robin over the 8 virtual
    CPU devices must score identically to the single-device loop."""
    import jax

    from fgvc_tpu.apis.test import build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    assert len(jax.devices()) >= 2  # conftest forces an 8-device CPU mesh
    cfg = _small_cfg("davis", input_size=(24, 24))
    tr = build_tracker(cfg)
    ds = TapVidDataset(fixtures["tapvid"], input_size=(24, 24))
    single = eval_tapvid(tr, ds)
    multi = eval_tapvid(tr, ds, devices=jax.devices()[:4])
    assert multi["average_pts_within_thresh"] == pytest.approx(
        single["average_pts_within_thresh"], abs=1e-4
    )


def test_jhmdb_multidevice_dp_eval(fixtures):
    import jax

    from fgvc_tpu.apis.test import build_tracker, eval_jhmdb
    from fgvc_tpu.datasets.jhmdb import JhmdbDataset

    cfg = _small_cfg("jhmdb", input_size=(32, 32))
    tr = build_tracker(cfg)
    ds = JhmdbDataset(
        fixtures["jhmdb"], os.path.join(fixtures["jhmdb"], "lists"),
        input_size=(32, 32),
    )
    single = eval_jhmdb(tr, ds)
    multi = eval_jhmdb(tr, ds, devices=jax.devices()[:2])
    for k in single:
        assert multi[k] == pytest.approx(single[k], abs=1e-4), k
    # dp×sp groups: 2 video groups × 2-way row sharding via tuple entries
    if len(jax.devices()) >= 4:
        d = jax.devices()
        grouped = eval_jhmdb(
            tr, ds, devices=[tuple(d[0:2]), tuple(d[2:4])]
        )
        for k in single:
            assert grouped[k] == pytest.approx(single[k], abs=1e-4), k


def test_vos_multidevice_dp_eval(fixtures):
    import jax

    from fgvc_tpu.apis.test import build_tracker, eval_vos
    from fgvc_tpu.datasets.davis_vos import DavisVosDataset

    # tiled impl: interpret-mode Pallas re-traces per tracker clone and is
    # pathologically slow on the 1-core CPU host; DP mechanics (device
    # routing, dispatch/collect, scoring) are what this test covers
    cfg = _small_cfg("vos", input_size=(32, 32), attention_impl="tiled")
    tr = build_tracker(cfg)
    ds = DavisVosDataset(fixtures["davis"])
    single = eval_vos(tr, ds)
    multi = eval_vos(tr, ds, devices=jax.devices()[:2])
    for k in single:
        assert multi[k] == pytest.approx(single[k], abs=1e-6), k


def test_vos_save_mem_spatial_group_eval(fixtures):
    """save_mem STREAMING VOS through the harness with dp×sp GROUP entries
    (2 video groups × 2-way row sharding): routes through
    _scan_propagate_streaming_sp and must score identically to the
    single-device streaming loop."""
    import jax

    from fgvc_tpu.apis.test import build_tracker, eval_vos
    from fgvc_tpu.datasets.davis_vos import DavisVosDataset

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = _small_cfg(
        "vos", input_size=(32, 32), attention_impl="tiled", save_mem=True
    )
    tr = build_tracker(cfg)
    ds = DavisVosDataset(fixtures["davis"])
    single = eval_vos(tr, ds)
    d = jax.devices()
    grouped = eval_vos(tr, ds, devices=[tuple(d[0:2]), tuple(d[2:4])])
    for k in single:
        assert grouped[k] == pytest.approx(single[k], abs=1e-6), k


def test_read_ahead_order_and_overlap():
    """_read_ahead yields dataset[i] in id order, and reads index n+1 on a
    worker thread (not the consumer thread)."""
    import threading

    from fgvc_tpu.apis.test import _read_ahead

    main = threading.get_ident()
    log = []

    class DS:
        def __getitem__(self, i):
            log.append((i, threading.get_ident() == main))
            return {"idx": i}

    ids = [4, 2, 7, 0]
    got = [s["idx"] for s in _read_ahead(DS(), ids)]
    assert got == ids
    # first read is synchronous (main thread); every later one is the
    # worker's
    assert log[0] == (4, True)
    assert [t for _, t in log[1:]] == [False, False, False]
    assert [i for i, _ in log] == ids

    # partial consumption shuts the pool down cleanly
    it = _read_ahead(DS(), ids)
    next(it)
    it.close()


def test_restore_orbax_resolves_pointer_files(tmp_path):
    """build_tracker checkpoint loading accepts a work_dir 'best'/'latest'
    pointer FILE (holds "step_N") and resolves it to the sibling step dir
    (the files apis/train.py writes)."""
    import numpy as np
    import orbax.checkpoint as ocp

    from fgvc_tpu.apis.test import _restore_orbax

    payload = {"params": {"w": np.arange(4.0, dtype=np.float32)}}
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(str(tmp_path / "step_7"), payload)
    ckpt.wait_until_finished()
    (tmp_path / "best").write_text("step_7")

    via_pointer = _restore_orbax(str(tmp_path / "best"))
    via_dir = _restore_orbax(str(tmp_path / "step_7"))
    np.testing.assert_array_equal(
        np.asarray(via_pointer["params"]["w"]),
        np.asarray(via_dir["params"]["w"]),
    )


def test_tapvid_unsplit_pickle_actionable_error(tmp_path):
    """Pointing --data-root at the monolithic DeepMind release pickle must
    fail with the split command, not a KeyError (real-data day 1 UX)."""
    import pickle

    from fgvc_tpu.datasets.tapvid import TapVidDataset

    rng = np.random.default_rng(0)
    rec = lambda: {  # noqa: E731
        "video": rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8),
        "points": rng.uniform(0, 1, (1, 2, 2)).astype(np.float32),
        "occluded": np.zeros((1, 2), bool),
    }
    # davis-style: one dict of many videos; kinetics-style: a list
    for blob in ({"vid_a": rec(), "vid_b": rec()}, [rec(), rec()]):
        root = tmp_path / f"mono_{type(blob).__name__}"
        root.mkdir()
        with open(root / "tapvid_davis.pkl", "wb") as f:
            pickle.dump(blob, f)
        ds = TapVidDataset(str(root))
        with pytest.raises(ValueError, match="split_tapvid"):
            ds[0]
