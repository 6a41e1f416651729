"""Backbone zoo: every registered encoder builds, runs, and drives the
tracker end-to-end; preprocessing is switched per family.

The reference exposes its encoder zoo through config backbone dicts
(mmpt/models/backbones/__init__.py); here it is `--backbone <name>` on
tools/test.py via models/zoo.make_eval_backbone.
"""

import dataclasses

import numpy as np
import pytest

from fgvc_tpu.models.zoo import backbone_names, make_eval_backbone


def test_registry_names_stable():
    names = backbone_names()
    assert "resnet18_d1" in names and "dino_vit_s8" in names
    with pytest.raises(ValueError, match="unknown backbone"):
        make_eval_backbone("nope")


@pytest.mark.parametrize("name", backbone_names())
def test_every_backbone_builds_and_runs(name):
    import jax.numpy as jnp

    apply_fn, variables, pre = make_eval_backbone(name, input_hw=(32, 32))
    assert pre in ("lab", "imagenet")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 32, 3)), jnp.float32
    )
    out = np.asarray(apply_fn(variables, x))
    assert out.ndim == 4 and out.shape[0] == 1
    assert 32 % out.shape[1] == 0, "feature stride must divide the input"
    assert np.all(np.isfinite(out))


def test_tracker_with_dino_backbone_tracks():
    """End-to-end: a zoo (ImageNet-preprocessed) encoder through
    build_tracker + track_points on a synthetic uint8 video."""
    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"],
        input_size=(32, 32),
        frame_bucket=4,
        point_bucket=8,
        neighbor_range=4,
        tile=4,
        attention_impl="dense",
    )
    tracker = build_tracker(cfg, backbone="dino_vit_s16")
    assert tracker.cfg.preprocess == "imagenet"
    rng = np.random.default_rng(1)
    video = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    pts = np.array([[0, 9.0, 17.0]], np.float32)
    out = tracker.track_points(video, pts)
    assert out["trajectories"].shape == (3, 1, 2)
    assert np.all(np.isfinite(out["trajectories"]))


def test_imagenet_preprocess_ops_match_numpy():
    from fgvc_tpu.ops.color import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        preprocess_rgb_to_imagenet,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(preprocess_rgb_to_imagenet(x))
    want = (x / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
