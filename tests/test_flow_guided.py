"""Flow-guided attention vs a brute-force numpy oracle."""

import numpy as np


def test_flow_guided_attention_matches_oracle():
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import flow_guided_attention

    rng = np.random.default_rng(0)
    T, H, W, Cv, r, k = 2, 6, 6, 3, 1, 4
    corr = rng.standard_normal((T, H, W, H, W)).astype(np.float32)
    # integer flows keep the bilinear/nearest sampling exact for the oracle
    flow = rng.integers(-1, 2, size=(T, H, W, 2)).astype(np.float32)
    value = rng.standard_normal((T, H, W, Cv)).astype(np.float32)

    got = np.asarray(
        flow_guided_attention(
            jnp.asarray(corr), jnp.asarray(flow), jnp.asarray(value),
            radius=r, temperature=0.1, topk=k,
        )
    )

    out = np.zeros((H, W, Cv))
    for qy in range(H):
        for qx in range(W):
            cands = []
            for t in range(T):
                cx = qx + flow[t, qy, qx, 0]
                cy = qy + flow[t, qy, qx, 1]
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        x, y = cx + dx, cy + dy
                        inside = 0 <= x <= W - 1 and 0 <= y <= H - 1
                        a = (
                            corr[t, qy, qx, int(np.clip(y, 0, H - 1)),
                                 int(np.clip(x, 0, W - 1))]
                            if inside
                            else 0.0
                        )  # temperature is dead in the reference (quirk)
                        v = (
                            value[t, int(np.clip(round(y), 0, H - 1)),
                                  int(np.clip(round(x), 0, W - 1))]
                            if inside
                            else np.zeros(Cv)
                        )
                        cands.append((a, v))
            cands.sort(key=lambda c: -c[0])
            top = cands[:k]
            w = np.array([c[0] for c in top])
            w = np.exp(w - w.max())
            w /= w.sum()
            out[qy, qx] = sum(wi * c[1] for wi, c in zip(w, top))

    np.testing.assert_allclose(got, out, rtol=1e-3, atol=1e-4)


def test_flow_guided_topk_attention_matches_dense_op():
    """The efficient (no dense volume) form vs the dense op: with
    corr = <q, k> the two must agree — bilinear interpolation of the
    correlation map equals correlating against bilinearly interpolated key
    features (linearity), and value/OOB semantics are shared."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import flow_guided_attention
    from fgvc_tpu.ops.c2f import flow_guided_topk_attention

    rng = np.random.default_rng(1)
    T, H, W, C, Cv, r, k = 3, 7, 6, 5, 2, 2, 6
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    keys = rng.standard_normal((T, H, W, C)).astype(np.float32)
    vals = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    flow = (rng.standard_normal((T, H, W, 2)) * 1.5).astype(np.float32)

    temp = 0.2
    corr = np.einsum("ijc,thwc->tijhw", q, keys) / temp  # pre-divided (quirk)
    dense = np.asarray(
        flow_guided_attention(
            jnp.asarray(corr), jnp.asarray(flow), jnp.asarray(vals),
            radius=r, temperature=temp, topk=k,
        )
    )
    eff = np.asarray(
        flow_guided_topk_attention(
            jnp.asarray(q), jnp.asarray(keys), jnp.asarray(vals),
            jnp.asarray(flow), radius=r, temperature=temp, topk=k,
            normalize=False, step=16,
        )
    )
    np.testing.assert_allclose(eff, dense, rtol=1e-4, atol=1e-5)


def test_flow_guided_topk_attention_key_valid():
    """Invalid key frames must not contribute (−inf before top-k)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import flow_guided_topk_attention

    rng = np.random.default_rng(2)
    T, H, W, C, Cv = 3, 5, 5, 4, 2
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    keys = rng.standard_normal((T, H, W, C)).astype(np.float32)
    vals = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    flow = np.zeros((T, H, W, 2), np.float32)

    kw = dict(radius=1, temperature=0.1, topk=3, normalize=True, step=8)
    full_valid = flow_guided_topk_attention(
        jnp.asarray(q), jnp.asarray(keys[:2]), jnp.asarray(vals[:2]),
        jnp.asarray(flow[:2]), **kw,
    )
    masked = flow_guided_topk_attention(
        jnp.asarray(q), jnp.asarray(keys), jnp.asarray(vals),
        jnp.asarray(flow), key_valid=jnp.asarray([True, True, False]), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(full_valid), rtol=1e-5, atol=1e-6
    )


def test_chain_window_flows_composition():
    """Chained window flows follow the incremental composition recursion
    W_t[k] = adj[t-1] \u2218 W_{t-1}[k-1], C_t = adj[t-1] \u2218 C_{t-1}, emitted in
    the tracker's window slot order [\u21920, \u2192t-K, \u2026, \u2192t-1]."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.warp import chain_window_flows, compose_flows

    rng = np.random.default_rng(3)
    T, h, w, K = 5, 6, 6, 2
    adj = (rng.standard_normal((T - 1, h, w, 2)) * 0.7).astype(np.float32)
    wf = np.asarray(chain_window_flows(jnp.asarray(adj), K))
    assert wf.shape == (T - 1, K + 1, h, w, 2)

    # explicit recursion (same association as the scan)
    W = {}
    C = {0: np.zeros((h, w, 2), np.float32)}
    for t in range(1, T):
        f = jnp.asarray(adj[t - 1])
        W[t] = {1: np.asarray(f)}
        for k in range(2, K + 1):
            prev = W.get(t - 1, {}).get(k - 1, np.zeros((h, w, 2), np.float32))
            W[t][k] = np.asarray(compose_flows(f, jnp.asarray(prev)))
        C[t] = np.asarray(compose_flows(f, jnp.asarray(C[t - 1])))

    for t in range(1, T):
        np.testing.assert_allclose(wf[t - 1, 0], C[t], atol=1e-6)
        for j, k in enumerate(range(K, 0, -1)):  # slots [t-K .. t-1]
            np.testing.assert_allclose(wf[t - 1, 1 + j], W[t][k], atol=1e-6)


def test_chain_window_flows_constant_translation():
    """A constant-translation scene: every adjacent flow = (u, v), so the
    chain to t-k must equal k\u00b7(u, v) wherever the whole chain stays
    in-bounds (zero-padding bends border chains by design)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.warp import chain_window_flows

    T, h, w, K = 4, 16, 16, 3
    u, v = 1.25, -0.75
    adj = np.broadcast_to(
        np.asarray([u, v], np.float32), (T - 1, h, w, 2)
    ).copy()
    wf = np.asarray(chain_window_flows(jnp.asarray(adj), K))
    t = T - 1  # query frame 3: window [\u21920, \u21920, \u21921, \u21922]
    m = 6  # interior margin \u2265 K\u00b7max|flow|
    for slot, k in [(0, 3), (1, 3), (2, 2), (3, 1)]:
        np.testing.assert_allclose(
            wf[t - 1, slot][m:-m, m:-m],
            np.broadcast_to([k * u, k * v], (h - 2 * m, w - 2 * m, 2)),
            atol=1e-5,
        )


def test_tracker_flow_guided_zero_flow_square_window():
    """End-to-end semantics: with identical consecutive frames the chained
    flows are ~zero, so flow-guided propagation reduces to square-window
    local attention of radius flow_radius — compare the first propagated
    frame's logits against masked_topk_attention (square mask) on interior
    pixels (the border differs by design: flow_guided admits OOB candidates
    at affinity 0, the masked path excludes them)."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import l2_normalize, masked_topk_attention
    from fgvc_tpu.ops.c2f import flow_guided_topk_attention

    rng = np.random.default_rng(4)
    h, w, C, P = 10, 10, 6, 3
    r = 2
    feat = rng.standard_normal((h, w, C)).astype(np.float32)
    value = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((h, w, P)).astype(np.float32))
    )
    fn = l2_normalize(jnp.asarray(feat))

    flows = jnp.zeros((1, h, w, 2), jnp.float32)
    got = flow_guided_topk_attention(
        fn, fn[None], value[None], flows,
        radius=r, temperature=0.07, topk=5, normalize=False, step=32,
    )
    want = masked_topk_attention(
        fn, fn[None], value[None],
        radius=float(r), temperature=0.07, topk=5, normalize=False,
        step=128, mask_shape="square",
    )
    np.testing.assert_allclose(
        np.asarray(got)[r:-r, r:-r],
        np.asarray(want)[r:-r, r:-r],
        rtol=1e-4, atol=1e-5,
    )


def test_tracker_flow_guided_track_points_smoke():
    """track_points runs under attention_impl='flow_guided' and tracks a
    trivially-static video correctly (the point stays put)."""
    import jax

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(5)
    T, H, W = 6, 32, 32
    frame = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    video = np.repeat(frame[None], T, axis=0)

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(3), (H, W))
    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        input_size=(H, W), frame_bucket=4, point_bucket=4,
        attention_impl="flow_guided", flow_radius=3, flow_step=64,
    )
    tracker = Tracker(
        lambda v, x: model.apply(v, x, train=False), variables, cfg
    )
    qp = np.array([[0, 16.0, 12.0]], np.float32)
    out = tracker.track_points(video, qp)
    traj = out["trajectories"]
    assert traj.shape == (T, 1, 2)
    # static video: the track must stay within a couple of pixels
    d = np.abs(traj[1:, 0] - traj[0, 0]).max()
    assert d < 3.0, d


def test_chain_window_flows_rejects_zero_window():
    """precede_frames=0 is a config error (the flow window always holds at
    least the previous frame); it must raise a clear ValueError instead of
    an opaque lax.scan carry-structure mismatch."""
    import jax.numpy as jnp
    import pytest

    from fgvc_tpu.ops.warp import chain_window_flows

    adj = jnp.zeros((3, 4, 4, 2), jnp.float32)
    with pytest.raises(ValueError, match="precede_frames"):
        chain_window_flows(adj, 0)
