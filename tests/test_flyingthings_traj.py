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
