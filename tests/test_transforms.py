"""Pipeline transforms zoo: geometry/flow consistency + photometric ranges."""

import random

import numpy as np
import pytest

from fgvc_tpu.datasets.transforms import (
    CenterCrop,
    ColorJitter,
    Compose,
    Flip,
    FormatShape,
    Normalize,
    PhotoMetricDistortion,
    RandomAffine,
    RandomCrop,
    RandomErasing,
    RandomGaussianBlur,
    RandomResizedCrop,
    Resize,
    RGB2GRAY,
    RGB2LAB,
    rescale_size,
)


def _sample(h=40, w=60, t=3, flow=True):
    rng = np.random.default_rng(0)
    res = {
        "imgs": [
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(t)
        ]
    }
    if flow:
        res["flow"] = rng.standard_normal((h, w, 2)).astype(np.float32) * 3
    return res


def test_rescale_size_short_edge_semantics():
    # Resize(-1, 320): short edge -> 320
    assert rescale_size(1920, 1080, (-1, 320)) == (569, 320)
    # identity on an already-320-short-edge image (the BADJA equivalence)
    assert rescale_size(512, 320, (-1, 320)) == (512, 320)


def test_resize_scales_flow():
    random.seed(0)
    res = _sample()
    res["flow"] = np.full_like(res["flow"], 2.0)
    res = Resize(scale=(30, 20), keep_ratio=False)(res)
    assert res["imgs"][0].shape == (20, 30, 3)
    assert res["flow"].shape == (20, 30, 2)
    # constant flow 2.0 scaled by (w, h) factors (0.5, 0.5) -> 1.0
    np.testing.assert_allclose(res["flow"], 1.0, rtol=1e-5)


def test_crops_and_flip_flow_consistency():
    random.seed(1)
    res = RandomCrop(24)(_sample())
    assert res["imgs"][0].shape == (24, 24, 3)
    assert res["flow"].shape == (24, 24, 2)

    res2 = _sample()
    before = res2["flow"].copy()
    random.seed(2)  # ensure the flip fires
    res2 = Flip(flip_ratio=1.0)(res2)
    assert res2["flip"]
    np.testing.assert_allclose(
        res2["flow"][..., 0], -before[:, ::-1, 0], rtol=1e-6
    )
    np.testing.assert_allclose(
        res2["flow"][..., 1], before[:, ::-1, 1], rtol=1e-6
    )

    res3 = CenterCrop(20)(_sample())
    assert res3["imgs"][0].shape == (20, 20, 3)

    random.seed(3)
    res4 = RandomResizedCrop(32)(_sample())
    assert res4["imgs"][0].shape == (32, 32, 3)


def test_photometric_transforms_stay_in_range():
    random.seed(4)
    np.random.seed(4)
    for t in (
        PhotoMetricDistortion(),
        ColorJitter(),
        RandomGaussianBlur(p=1.0),
        RandomErasing(p=1.0),
    ):
        res = t(_sample(flow=False))
        arr = np.stack(res["imgs"])
        assert np.isfinite(arr).all()
        assert arr.min() >= -1e-3 and arr.max() <= 255 + 1e-3


def test_affine_and_colorspace_and_format():
    random.seed(5)
    res = RandomAffine(p=1.0)(_sample(flow=False))
    assert "affine_matrix" in res
    assert res["imgs"][0].shape == (40, 60, 3)

    res = RGB2LAB()(_sample(flow=False))
    lab = res["imgs"][0]
    assert lab.dtype == np.float32
    assert 0 <= lab[..., 0].max() <= 100  # L channel range

    res = RGB2GRAY()(_sample(flow=False))
    g = res["imgs"][0]
    assert g.shape[-1] == 3
    np.testing.assert_array_equal(g[..., 0], g[..., 1])

    pipe = Compose([Normalize(mean=[128] * 3, std=[64] * 3), FormatShape("NCHW")])
    out = pipe(_sample(flow=False))
    assert out["imgs"].shape == (3, 3, 40, 60)
