"""HRNet backbone: shapes, config knobs, tracker pluggability."""

import numpy as np


def test_hrnet_w18_multiscale_shapes():
    import jax

    from fgvc_tpu.models.hrnet import HRNet, HRNET_W18_EXTRA

    model = HRNet(
        extra=HRNET_W18_EXTRA, out_indices=(0, 1, 2, 3), strides=(2, 2)
    )
    x = np.zeros((1, 64, 64, 3), np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(vars_, x, train=False)
    assert len(outs) == 4
    # stem /4, branches at /4 /8 /16 /32 with W18 channels
    assert outs[0].shape == (1, 16, 16, 18)
    assert outs[1].shape == (1, 8, 8, 36)
    assert outs[2].shape == (1, 4, 4, 72)
    assert outs[3].shape == (1, 2, 2, 144)


def test_hrnet_full_res_stem_and_exclude_last():
    import jax

    from fgvc_tpu.models.hrnet import hrnet_w18

    # strides (1,1): fine-grained full-res features; stop after stage 3
    model = hrnet_w18(
        strides=(1, 1), out_indices=(0,), exclude_last=(False, True)
    )
    x = np.zeros((1, 32, 32, 3), np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 32, 32, 18)


def test_hrnet_train_mode_updates_bn():
    import jax

    from fgvc_tpu.models.hrnet import hrnet_w18

    model = hrnet_w18(out_indices=(0,))
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out, upd = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in upd
    assert np.all(np.isfinite(np.asarray(out)))


def test_hrnet_plugs_into_tracker():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fgvc_tpu.apis.test import TASK_CONFIGS
    from fgvc_tpu.models.hrnet import hrnet_w18
    from fgvc_tpu.models.tracker import Tracker

    model = hrnet_w18(strides=(2, 1), out_indices=(0,))  # stride-2 features
    x = np.zeros((1, 32, 32, 3), np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"],
        input_size=(32, 32),
        frame_bucket=4,
        point_bucket=8,
        neighbor_range=6,
        tile=8,
    )
    tracker = Tracker(
        lambda v, im: model.apply(v, im, train=False), vars_, cfg
    )
    rng = np.random.default_rng(1)
    video = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    qp = np.array([[0, 10.0, 12.0], [0, 20.0, 8.0]], np.float32)
    out = tracker.track_points(video, qp)
    assert out["trajectories"].shape == (4, 2, 2)
    assert np.all(np.isfinite(out["trajectories"]))


def test_hrnet_checkpoint_conversion_roundtrip():
    """convert_hrnet_state_dict: an mmcv-named state dict with the correct
    shapes loads into the flax variables exactly (kernels transposed back),
    and unknown keys raise."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.hrnet import (
        HRNET_W18_EXTRA,
        HRNet,
        convert_hrnet_state_dict,
    )

    model = HRNet(extra=HRNET_W18_EXTRA, out_indices=(0, 1, 2, 3))
    x = np.zeros((1, 32, 32, 3), np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)

    # build the mmcv-named dict from the flax tree via the inverse mapping
    state = {}

    def walk(tree, stats, fpath):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, stats.get(k, {}), fpath + [k])
            elif k == "kernel":
                state[_mmcv_name(fpath) + ".weight"] = np.transpose(
                    np.asarray(v), (3, 2, 0, 1)
                )
            elif k == "scale":
                base = _mmcv_name(fpath)
                state[base + ".weight"] = np.asarray(v)
                state[base + ".bias"] = np.asarray(tree["bias"])
                state[base + ".running_mean"] = np.asarray(stats["mean"])
                state[base + ".running_var"] = np.asarray(stats["var"])

    def _mmcv_name(fpath):
        import re

        flat = "/".join(fpath)
        # stage modules: stage{s}_m{m}/branch{b}_block{j}/convN etc.
        m = re.match(r"stage(\d)_m(\d)/branch(\d)_block(\d)/(\w+)", flat)
        if m:
            s, mm, b, j, leaf = m.groups()
            leaf = {
                "down_conv": "downsample.0", "down_bn": "downsample.1"
            }.get(leaf, leaf)
            return f"stage{s}.{mm}.branches.{b}.{j}.{leaf}"
        m = re.match(r"stage(\d)_m(\d)/fuse(\d)_(\d)_down(\d)_(conv|bn)", flat)
        if m:
            s, mm, i, j, k, kind = m.groups()
            return f"stage{s}.{mm}.fuse_layers.{i}.{j}.{k}.{0 if kind == 'conv' else 1}"
        m = re.match(r"stage(\d)_m(\d)/fuse(\d)_(\d)_(conv|bn)", flat)
        if m:
            s, mm, i, j, kind = m.groups()
            return f"stage{s}.{mm}.fuse_layers.{i}.{j}.{0 if kind == 'conv' else 1}"
        m = re.match(r"transition(\d)_(\d)_d(\d)_(conv|bn)", flat)
        if m:
            t, i, k, kind = m.groups()
            return f"transition{t}.{i}.{k}.{0 if kind == 'conv' else 1}"
        m = re.match(r"transition(\d)_(\d)_(conv|bn)", flat)
        if m:
            t, i, kind = m.groups()
            return f"transition{t}.{i}.{0 if kind == 'conv' else 1}"
        m = re.match(r"layer1_(\d)/(\w+)", flat)
        if m:
            j, leaf = m.groups()
            leaf = {
                "down_conv": "downsample.0", "down_bn": "downsample.1"
            }.get(leaf, leaf)
            return f"layer1.{j}.{leaf}"
        return flat  # conv1 / bn1 / conv2 / bn2

    walk(vars_["params"], vars_["batch_stats"], [])
    assert "stage2.0.branches.0.0.conv1.weight" in state
    assert "transition1.1.0.0.weight" in state
    assert "stage4.0.fuse_layers.3.0.2.0.weight" in state

    out = convert_hrnet_state_dict(state, extra=HRNET_W18_EXTRA)
    a = jax.tree_util.tree_leaves(out["params"])
    b = jax.tree_util.tree_leaves(vars_["params"])
    assert len(a) == len(b)
    for x_, y_ in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))
    sa = jax.tree_util.tree_leaves(out["batch_stats"])
    sb = jax.tree_util.tree_leaves(vars_["batch_stats"])
    assert len(sa) == len(sb)

    state["surprise.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    import pytest

    with pytest.raises(ValueError, match="unconverted"):
        convert_hrnet_state_dict(state, extra=HRNET_W18_EXTRA)
