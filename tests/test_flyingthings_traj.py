"""PIPs-style trajectory packaging: crops, visibility, padding."""

import os

import numpy as np


def test_package_protocol():
    from fgvc_tpu.datasets.flyingthings_traj import FlyingThingsTrajDataset

    ds = FlyingThingsTrajDataset.__new__(FlyingThingsTrajDataset)
    ds.N = 6
    ds.S = 4
    ds.crop_size = (20, 24)
    ds.force_twice_vis = True
    ds.train = False
    ds.rng = np.random.default_rng(0)

    rng = np.random.default_rng(1)
    rgbs = rng.integers(0, 256, (4, 30, 40, 3), dtype=np.uint8)
    # three tracks: (a) always inside, (b) leaves immediately after frame 0,
    # (c) starts outside the center crop
    trajs = np.zeros((4, 3, 2), np.float32)
    trajs[:, 0] = [18, 14]                 # inside the center crop for all S
    trajs[0, 1] = [18, 14]
    trajs[1:, 1] = [500, 500]              # out of bounds after frame 0
    trajs[:, 2] = [1, 1]                   # outside the center crop
    out = ds.package(rgbs, trajs)

    assert out["rgbs"].shape == (4, 20, 24, 3)
    assert out["trajs"].shape == (4, 6, 2)
    assert out["visibles"].shape == (4, 6)
    # only track (a) survives: visible at 0 AND later
    assert out["valids"][0].sum() == 1
    assert out["visibles"][:, 0].all()
    # crop offset applied: center crop starts at (5, 8)
    np.testing.assert_allclose(out["trajs"][0, 0], [18 - 8, 14 - 5])


def test_augmentations_mark_covered_tracks_invisible():
    """Eraser + occluder augs: frames change, some visible tracks become
    invisible, geometry (trajs) unchanged."""
    from fgvc_tpu.datasets.flyingthings_traj import FlyingThingsTrajDataset

    ds = FlyingThingsTrajDataset.__new__(FlyingThingsTrajDataset)
    ds.N, ds.S = 64, 4
    ds.crop_size = (64, 64)
    ds.force_twice_vis = False
    ds.train = True
    ds.use_augs = True
    ds.eraser_prob = 1.0
    ds.occluder_prob = 1.0
    ds.max_occluders = 3
    ds.color_prob = 1.0
    ds.blur_prob = 1.0
    ds.rng = np.random.default_rng(0)

    rng = np.random.default_rng(1)
    rgbs = rng.integers(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    trajs = rng.uniform(4, 60, (4, 64, 2)).astype(np.float32)

    out = ds.package(rgbs.copy(), trajs.copy())
    assert out["rgbs"].shape == (4, 64, 64, 3)
    assert out["rgbs"].dtype == np.uint8
    # frames were modified by the augs
    assert not np.array_equal(out["rgbs"], rgbs)
    # some tracks got occluded (visibility dropped somewhere after frame 0)
    vis = out["visibles"]
    valid = out["valids"][0] > 0
    assert vis[1:, valid].min() == 0.0
    assert np.isfinite(out["trajs"]).all()


def test_structured_synthetic_mixed_dataset():
    """Structured synthetic pairs: exact flow consistency — warping f1 by
    'flow' reconstructs f0 wherever the layer is unoccluded."""
    import numpy as np

    from fgvc_tpu.datasets.flyingthings_ytv import (
        StructuredSyntheticMixedDataset,
    )

    ds = StructuredSyntheticMixedDataset(crop=64, length=4, seed=3,
                                         max_shift=4, n_sprites=1)
    s = ds[0]
    assert s["imgs"].shape == (2, 64, 64, 3)
    assert s["imgs_sup"].shape == (2, 64, 64, 3)
    assert s["flow"].shape == (64, 64, 2)

    # imgs_sup = [f1, f0]; flow = IntoFuture@f0: f0[p] == f1[p + flow[p]]
    f1, f0 = s["imgs_sup"][0], s["imgs_sup"][1]
    flow = s["flow"]
    yy, xx = np.mgrid[0:64, 0:64]
    tx = xx + flow[..., 0].astype(np.int64)
    ty = yy + flow[..., 1].astype(np.int64)
    inside = (tx >= 0) & (tx < 64) & (ty >= 0) & (ty < 64)
    diff = np.abs(f0[inside] - f1[ty[inside], tx[inside]])
    # exact for >=97% of pixels (sprite-over-background occlusions and
    # integer-shift layering account for the rest)
    frac_exact = float((diff.max(axis=-1) < 1e-5).mean())
    assert frac_exact > 0.90, frac_exact

    # determinism per index
    np.testing.assert_array_equal(ds[1]["flow"],
                                  StructuredSyntheticMixedDataset(
                                      crop=64, length=4, seed=3,
                                      max_shift=4, n_sprites=1)[1]["flow"])


def test_movi_mixed_dataset(tmp_path):
    """MoviMixedDataset: rec pair sampled from MOVi pickles (eval domain),
    sup pair + exact flow stay procedural; sample protocol matches the
    mixed loss contract and is deterministic per index."""
    import pickle

    import numpy as np

    from fgvc_tpu.datasets.flyingthings_ytv import MoviMixedDataset

    rng = np.random.default_rng(0)
    for i in range(2):
        vid = rng.integers(0, 256, (6, 80, 96, 3), dtype=np.uint8)
        with open(tmp_path / f"movi_{i:05d}.pkl", "wb") as f:
            pickle.dump({"video": vid}, f)

    ds = MoviMixedDataset(str(tmp_path), crop=64, length=4, seed=7,
                          max_shift=4, n_sprites=1, max_gap=3)
    s = ds[2]
    assert s["imgs"].shape == (2, 64, 64, 3)
    assert s["imgs_sup"].shape == (2, 64, 64, 3)
    assert s["flow"].shape == (64, 64, 2)
    assert s["flow_back"].shape == (64, 64, 2)
    assert all(v.dtype == np.float32 for v in s.values())
    # the rec pair is a crop of a real clip: both frames from the same
    # spatial window, so Lab values stay in range and frames differ
    assert not np.array_equal(s["imgs"][0], s["imgs"][1])

    s2 = MoviMixedDataset(str(tmp_path), crop=64, length=4, seed=7,
                          max_shift=4, n_sprites=1, max_gap=3)[2]
    for k in s:
        np.testing.assert_array_equal(s[k], s2[k])

    import pytest

    with pytest.raises(FileNotFoundError):
        MoviMixedDataset(str(tmp_path / "empty"), crop=64)

    # robustness: clips smaller than the crop are upscaled (not crashed
    # on / emitted ragged), and short clips clamp the frame gap
    small = tmp_path / "small"
    small.mkdir()
    vid = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    with open(small / "movi_00000.pkl", "wb") as f:
        pickle.dump({"video": vid}, f)
    ds_small = MoviMixedDataset(str(small), crop=64, length=4, seed=1,
                                max_shift=4, n_sprites=1, max_gap=4)
    for i in range(3):
        assert ds_small[i]["imgs"].shape == (2, 64, 64, 3)

    # malformed pickles fail at load time with the offending file named
    bad = tmp_path / "bad"
    bad.mkdir()
    with open(bad / "movi_00000.pkl", "wb") as f:
        pickle.dump({"video": vid[0]}, f)  # (H, W, 3): not a video
    with pytest.raises(ValueError, match="movi_00000"):
        MoviMixedDataset(str(bad), crop=64)


def test_ytv_json_frame_lists_used_verbatim(tmp_path):
    """The reference trains on the json's exact (5-strided) frame lists
    (flyingthings_ytv_dataset.py:62-68); a directory holding ALL frames
    must not widen the sampled-pair distribution."""
    import json

    import cv2

    from fgvc_tpu.datasets.flyingthings_ytv import FlyingThingsYtvDataset

    rng = np.random.default_rng(0)
    vdir = tmp_path / "ytv/train/JPEGImages_s256/vid01"
    vdir.mkdir(parents=True)
    for t in range(10):  # all 10 frames on disk...
        cv2.imwrite(
            str(vdir / f"{t:05d}.jpg"),
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
        )
    listed = [f"{t:05d}.jpg" for t in (0, 5)]  # ...but the json lists 2
    jpath = tmp_path / "youtube2018_train.json"
    jpath.write_text(json.dumps({"vid01": listed}))

    # minimal FlyingThings fixture (one frame pair + fwd/bwd PFM flows)
    def write_pfm(path, arr):
        path.parent.mkdir(parents=True, exist_ok=True)
        h, w, c = arr.shape
        with open(path, "wb") as f:
            f.write(b"PF\n" + f"{w} {h}\n".encode() + b"-1.0\n")
            f.write(arr[::-1].astype("<f4").tobytes())

    fly = tmp_path / "fly"
    img_dir = fly / "frames_cleanpass/TRAIN/A/0000/left"
    img_dir.mkdir(parents=True)
    for n in (6, 7):
        cv2.imwrite(
            str(img_dir / f"{n:04d}.png"),
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
        )
    flow3 = np.zeros((16, 16, 3), np.float32)
    write_pfm(
        fly / "optical_flow/TRAIN/A/0000/into_future/left"
        / "OpticalFlowIntoFuture_0006_L.pfm",
        flow3,
    )
    write_pfm(
        fly / "optical_flow/TRAIN/A/0000/into_past/left"
        / "OpticalFlowIntoPast_0007_L.pfm",
        flow3,
    )

    ds = FlyingThingsYtvDataset(
        str(tmp_path / "ytv"), str(fly), ytv_list=str(jpath)
    )
    assert len(ds.fly_pairs) == 1
    assert len(ds.ytv_videos) == 1
    assert [os.path.basename(p) for p in ds.ytv_videos[0]] == listed

    # step-exact resume on the REAL-data path: the dataset must be
    # stateless per call (randomness derived from the raw draw counter),
    # so make_batches(skip=k) reproduces the uninterrupted run's batches
    from fgvc_tpu.datasets.flyingthings_ytv import make_batches

    full = list(make_batches(ds, batch_size=2, steps=4))
    resumed = list(make_batches(ds, batch_size=2, steps=4, skip=2))
    assert len(resumed) == 2
    for a, b in zip(full[2:], resumed):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
