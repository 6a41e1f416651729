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
