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
