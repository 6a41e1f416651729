"""Direct-execution goldens for the round-4 pipeline-transform tail:
MultiScaleCrop, RandomScaleCrop + GetAffanity, Flow_Sampler and
BlockwiseMaskGenerator from /root/reference/mmpt/datasets/pipelines/
augmentation.py are imported (mmcv/torchvision/skimage stubbed — only
names the tested classes never touch, except mmcv.imresize which is
backed by the same cv2.resize call the real mmcv wraps) and run against
our numpy ports under a shared RNG seed.

Flow2Heat needs no port or test: the reference class body is literally
``pass`` (augmentation.py:2330-2356) — documented in PARITY.md like the
empty chain_flow tool."""

import importlib
import random
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REF_AUG = "/root/reference/mmpt/datasets/pipelines"


@pytest.fixture(scope="module")
def ref_aug(request):
    # np.int was removed in numpy 1.24; the reference predates that.
    # Restore the plain alias for the module under test — and remove it
    # again afterwards so later tests in the session see stock numpy.
    if not hasattr(np, "int"):
        np.int = int
        request.addfinalizer(lambda: delattr(np, "int"))

    for name in ("mmpt", "mmpt.datasets"):
        sys.modules.setdefault(name, types.ModuleType(name))

    mmcv = sys.modules.setdefault("mmcv", types.ModuleType("mmcv"))
    mmcv.is_tuple_of = lambda seq, t: isinstance(seq, tuple) and all(
        isinstance(s, t) for s in seq
    )
    # mmcv.imresize is a cv2.resize wrapper (bilinear, (w, h) order)
    mmcv.imresize = lambda img, size, **k: cv2.resize(
        img, size, interpolation=cv2.INTER_LINEAR
    )

    sku = types.ModuleType("skimage.util")
    sku.view_as_windows = None
    sys.modules.setdefault("skimage", types.ModuleType("skimage"))
    sys.modules["skimage.util"] = sku

    tvt = types.ModuleType("torchvision.transforms")
    for n in ("ColorJitter", "RandomAffine", "RandomResizedCrop"):
        setattr(tvt, n, type(n, (), {}))
    tvt.functional = types.ModuleType("torchvision.transforms.functional")
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvt.functional

    class _Registry:
        def register_module(self, *a, **k):
            if a and isinstance(a[0], type):
                return a[0]
            return lambda cls: cls

    reg = types.ModuleType("mmpt.datasets.registry")
    reg.PIPELINES = _Registry()
    sys.modules["mmpt.datasets.registry"] = reg

    pkg = types.ModuleType("mmpt.datasets.pipelines")
    pkg.__path__ = [REF_AUG]
    sys.modules["mmpt.datasets.pipelines"] = pkg
    return importlib.import_module("mmpt.datasets.pipelines.augmentation")


def _frames(rng, n=3, h=48, w=64):
    return [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8).copy()
        for _ in range(n)
    ]


@pytest.mark.parametrize("random_crop,num_fixed", [(False, 5), (False, 13),
                                                   (True, 5)])
def test_multi_scale_crop_matches_reference(ref_aug, random_crop, num_fixed):
    from fgvc_tpu.datasets.transforms import MultiScaleCrop

    rng = np.random.default_rng(0)
    imgs = _frames(rng)
    kw = dict(input_size=32, scales=(1, 0.875, 0.75),
              max_wh_scale_gap=1, random_crop=random_crop,
              num_fixed_crops=num_fixed)

    random.seed(7)
    ref_out = ref_aug.MultiScaleCrop(**kw)(
        {"imgs": [im.copy() for im in imgs], "img_shape": imgs[0].shape[:2]}
    )
    random.seed(7)
    ours = MultiScaleCrop(**kw)(
        {"imgs": [im.copy() for im in imgs], "img_shape": imgs[0].shape[:2]}
    )

    np.testing.assert_array_equal(ours["crop_bbox"], ref_out["crop_bbox"])
    assert ours["img_shape"] == ref_out["img_shape"]
    for a, b in zip(ours["imgs"], ref_out["imgs"]):
        np.testing.assert_array_equal(a, b)


def test_random_scale_crop_and_affinity_match_reference(ref_aug):
    """RandomScaleCrop's zoom-in branch (s <= 1 — the only branch its
    default scale_range reaches, and the only executable one: the zoom-out
    branch calls mmcv.impad positionally where mmcv 1.5's signature is
    keyword-only) + GetAffanity matrix math under a shared seed."""
    from fgvc_tpu.datasets.transforms import GetAffanity, RandomScaleCrop

    rng = np.random.default_rng(1)
    imgs = _frames(rng, n=2, h=64, w=64)

    random.seed(11)
    r1 = ref_aug.RandomScaleCrop(scale_range=(0.5, 1.0))(
        {"imgs": [im.copy() for im in imgs]}
    )
    r1 = ref_aug.GetAffanity(size=(64, 64))(r1)

    random.seed(11)
    r2 = RandomScaleCrop(scale_range=(0.5, 1.0))(
        {"imgs": [im.copy() for im in imgs]}
    )
    r2 = GetAffanity(size=(64, 64))(r2)

    assert r1["affine_params_imgs"] == r2["affine_params_imgs"]
    np.testing.assert_allclose(
        r2["affine_imgs"], r1["affine_imgs"].numpy(), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(r2["imgs"], r1["imgs"]):
        np.testing.assert_array_equal(a, b)

    # forward (non-inverted) matrices too
    random.seed(12)
    f1 = ref_aug.GetAffanity(size=(64, 48), get_inverse=False)(
        ref_aug.RandomScaleCrop()( {"imgs": [im.copy() for im in imgs]})
    )
    random.seed(12)
    f2 = GetAffanity(size=(64, 48), get_inverse=False)(
        RandomScaleCrop()({"imgs": [im.copy() for im in imgs]})
    )
    np.testing.assert_allclose(
        f2["affine_imgs"], f1["affine_imgs"].numpy(), rtol=1e-5, atol=1e-6
    )


def test_flow_sampler_matches_reference(ref_aug):
    """Sparse guide-point sampling on a flow field whose watershed maxima
    are well separated (> nms_ks apart), so the reference's coin-flip
    neighbor elimination draws nothing and outputs are RNG-order-free."""
    from fgvc_tpu.datasets.transforms import FlowSampler

    h, w = 40, 40
    flow = np.zeros((h, w, 2), np.float32)
    flow[: h // 2] = (4.0, 0.0)  # one clean horizontal motion edge
    flow[:, : w // 4] += (0.0, 2.0)

    np.random.seed(3)
    ref_out = ref_aug.Flow_Sampler(nms_ks=7)({"flows": [flow.copy()]})
    np.random.seed(3)
    ours = FlowSampler(nms_ks=7)({"flows": [flow.copy()]})

    np.testing.assert_array_equal(ours["mask"], np.asarray(ref_out["mask"]))
    np.testing.assert_allclose(ours["sparse"], ref_out["sparse"], atol=1e-6)
    assert ours["mask"].sum() > 0  # the fixture actually samples points


def test_blockwise_mask_generator_matches_reference(ref_aug):
    from fgvc_tpu.datasets.transforms import BlockwiseMaskGenerator

    rng = np.random.default_rng(4)
    imgs = _frames(rng, n=2, h=64, w=64)
    kw = dict(input_size=64, mask_patch_size=16, model_patch_size=4,
              mask_ratio=0.5, mask_color="mean")

    np.random.seed(9)
    ref_out = ref_aug.BlockwiseMaskGenerator(**kw)(
        {"imgs": [im.copy() for im in imgs]}
    )
    np.random.seed(9)
    ours = BlockwiseMaskGenerator(**kw)(
        {"imgs": [im.copy() for im in imgs]}
    )
    np.testing.assert_array_equal(ours["mask"], ref_out["mask"])
    for a, b in zip(ours["imgs"], ref_out["imgs"]):
        np.testing.assert_array_equal(a, b)
    # quirk pinned: mask==1 KEEPS the original pixels (the mask marks
    # retained patches, inverted vs. the reference docstring)
    masked_px = ours["imgs"][-1]
    token_mask = ours["mask"].repeat(4, axis=0).repeat(4, axis=1)
    np.testing.assert_array_equal(
        masked_px[token_mask == 1], imgs[-1][token_mask == 1]
    )


def test_flow2heat_is_empty_in_reference(ref_aug):
    """Flow2Heat has no behavior to port: __init__ and the class body are
    `pass` (augmentation.py:2330-2356) — pin that so a future reference
    bump that fills it in fails loudly here."""
    import inspect

    src = inspect.getsource(ref_aug.Flow2Heat)
    assert "pass" in src
    assert not hasattr(ref_aug.Flow2Heat, "__call__") or (
        "__call__" not in ref_aug.Flow2Heat.__dict__
    )
