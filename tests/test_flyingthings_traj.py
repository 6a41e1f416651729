"""PIPs-style trajectory packaging: crops, visibility, padding."""

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
