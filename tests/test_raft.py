"""RAFT model: shapes, loss, pyramid/lookup numerics, flow chaining."""

import numpy as np


def test_correlation_pyramid_and_lookup():
    import jax.numpy as jnp

    from fgvc_tpu.models.raft import correlation_pyramid, lookup_corr

    rng = np.random.default_rng(0)
    H = W = 8
    C = 16
    f1 = rng.standard_normal((H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((H, W, C)).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=3)
    assert pyr[0].shape == (H, W, H, W)
    assert pyr[1].shape == (H, W, H // 2, W // 2)
    # level-0 value check vs direct dot product
    expect = f1[2, 3] @ f2[5, 6] / np.sqrt(C)
    np.testing.assert_allclose(float(pyr[0][2, 3, 5, 6]), expect, rtol=1e-4)

    # lookup at integer coords with zero flow reproduces the center window
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = jnp.asarray(
        np.stack([gx, gy], axis=-1).astype(np.float32)
    )
    feat = lookup_corr(pyr, coords, radius=1)
    assert feat.shape == (H, W, 3 * 9)
    # center of the radius-1 window at level 0 == corr[i,j,i,j]
    np.testing.assert_allclose(
        np.asarray(feat[3, 4, 4]), float(pyr[0][3, 4, 3, 4]), rtol=1e-4
    )


def test_raft_forward_and_loss():
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.raft import RAFT, sequence_loss

    model = RAFT(iters=2)
    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.standard_normal((32, 32, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im1, im2)
    preds = model.apply(variables, im1, im2)
    assert len(preds) == 2
    assert preds[-1].shape == (32, 32, 2)

    gt = jnp.zeros((32, 32, 2))
    valid = jnp.ones((32, 32), bool)
    loss = sequence_loss(preds, gt, valid)
    assert np.isfinite(float(loss))


def test_chain_flows_track():
    from fgvc_tpu.models.raft import chain_flows_track

    T, H, W = 4, 16, 16
    # constant flow: +2 px/frame in x forward, -2 backward
    fwd = np.zeros((T - 1, H, W, 2), np.float32)
    fwd[..., 0] = 2.0
    bwd = np.zeros((T - 1, H, W, 2), np.float32)
    bwd[..., 0] = -2.0

    qp = np.array([[1, 4.0, 8.0]], np.float32)  # (t=1, x=4, y=8)
    traj, vis = chain_flows_track(fwd, bwd, qp)
    np.testing.assert_allclose(traj[:, 0, 0], [2.0, 4.0, 6.0, 8.0])
    np.testing.assert_allclose(traj[:, 0, 1], [8.0, 8.0, 8.0, 8.0])
    assert vis.all()

    # a point leaving the frame becomes invisible
    qp = np.array([[0, 14.0, 8.0]], np.float32)
    traj, vis = chain_flows_track(fwd, bwd, qp)
    assert vis[0, 0] and not vis[2, 0]


def test_raft_tracker_through_tapvid_harness(tmp_path):
    """tools/test.py --model raft path: RaftTracker through eval_tapvid."""
    import pickle

    from fgvc_tpu.apis.test import eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset
    from fgvc_tpu.models.raft import RaftTracker

    rng = np.random.default_rng(5)
    rec = {
        "video": rng.integers(0, 256, (3, 24, 24, 3), dtype=np.uint8),
        "points": rng.uniform(0.2, 0.8, (2, 3, 2)).astype(np.float32),
        "occluded": np.zeros((2, 3), bool),
    }
    with open(tmp_path / "v.pkl", "wb") as f:
        pickle.dump(rec, f)

    ds = TapVidDataset(str(tmp_path), input_size=(24, 24))
    tracker = RaftTracker(iters=2)
    out = eval_tapvid(tracker, ds)
    assert "average_pts_within_thresh" in out
    assert np.isfinite(out["average_pts_within_thresh"])


def _official_raft_state_dict(rng):
    """Synthetic princeton-vl-named RAFT state dict with correct shapes."""
    sd = {}

    def conv(name, o, i, kh, kw, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, kh, kw)).astype(np.float32) * 0.02
        if bias:
            sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)
        sd[f"{name}.num_batches_tracked"] = np.array(0)

    for enc, batch in (("fnet", False), ("cnet", True)):
        conv(f"{enc}.conv1", 64, 3, 7, 7)
        if batch:
            bn(f"{enc}.norm1", 64)
        conv(f"{enc}.conv2", 256, 128, 1, 1)
        cin = 64
        for li, cout in ((1, 64), (2, 96), (3, 128)):
            for bj in (0, 1):
                i = cin if bj == 0 else cout
                conv(f"{enc}.layer{li}.{bj}.conv1", cout, i, 3, 3)
                conv(f"{enc}.layer{li}.{bj}.conv2", cout, cout, 3, 3)
                if batch:
                    bn(f"{enc}.layer{li}.{bj}.norm1", cout)
                    bn(f"{enc}.layer{li}.{bj}.norm2", cout)
                if bj == 0 and (li > 1):
                    conv(f"{enc}.layer{li}.{bj}.downsample.0", cout, i, 1, 1)
                    if batch:
                        bn(f"{enc}.layer{li}.{bj}.downsample.1", cout)
            cin = cout
    conv("update_block.encoder.convc1", 256, 324, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for g in ("convz1", "convr1", "convq1"):
        conv(f"update_block.gru.{g}", 128, 384, 1, 5)
    for g in ("convz2", "convr2", "convq2"):
        conv(f"update_block.gru.{g}", 128, 384, 5, 1)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 576, 256, 1, 1)
    return sd


def test_convert_official_raft_checkpoint():
    import jax.numpy as jnp

    from fgvc_tpu.models.raft import RAFT
    from fgvc_tpu.models.raft_convert import convert_raft_state_dict

    rng = np.random.default_rng(6)
    sd = {"module." + k: v for k, v in _official_raft_state_dict(rng).items()}
    variables = convert_raft_state_dict(sd, iters=2)

    # shape-checked during conversion; run a forward to prove structure
    model = RAFT(iters=2, cnet_norm="batch")
    im = jnp.zeros((16, 16, 3), jnp.float32)
    preds = model.apply(variables, im, im)
    assert preds[-1].shape == (16, 16, 2)
    assert np.all(np.isfinite(np.asarray(preds[-1])))

    # kernel landed transposed in the right slot
    np.testing.assert_allclose(
        np.asarray(variables["params"]["gru"]["convz_v"]["kernel"]),
        np.transpose(sd["module.update_block.gru.convz2.weight"], (2, 3, 1, 0)),
    )

    # unconvertible keys raise instead of silently dropping
    sd["module.update_block.gru.convz9.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    import pytest

    with pytest.raises(ValueError, match="unconverted"):
        convert_raft_state_dict(sd, iters=2)
