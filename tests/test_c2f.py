"""Coarse-to-fine attention vs a brute-force numpy oracle."""

import numpy as np


def _l2(x, axis):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def c2f_oracle(query, key, qf, kf, value, radius, rf, temp, topk):
    hc, wc, C = query.shape
    T = key.shape[0]
    hf, wf, Cf = qf.shape
    Cv = value.shape[-1]
    scale = hf // hc
    query = _l2(query, -1)
    key = _l2(key, -1)
    qf = _l2(qf, -1)
    kf = _l2(kf, -1)
    kf_pad = np.pad(kf, ((0, 0), (rf, rf), (rf, rf), (0, 0)))
    v_pad = np.pad(value, ((0, 0), (rf, rf), (rf, rf), (0, 0)))

    out = np.zeros((hc, wc, Cv))
    for qy in range(hc):
        for qx in range(wc):
            cands = []
            for t in range(T):
                # coarse argmax under circle mask
                best, best_a = None, -np.inf
                for ky in range(hc):
                    for kx in range(wc):
                        if radius is not None and (
                            (ky - qy) ** 2 + (kx - qx) ** 2 >= radius**2
                        ):
                            continue
                        a = query[qy, qx] @ key[t, ky, kx] / temp
                        if a > best_a:
                            best_a, best = a, (ky, kx)
                cy, cx = best[0] * scale, best[1] * scale
                for dy in range(-rf, rf + 1):
                    for dx in range(-rf, rf + 1):
                        a = (
                            qf[qy * scale, qx * scale]
                            @ kf_pad[t, cy + dy + rf, cx + dx + rf]
                            / temp
                        )
                        cands.append((a, v_pad[t, cy + dy + rf, cx + dx + rf]))
            cands.sort(key=lambda c: -c[0])
            top = cands[:topk]
            w = np.array([c[0] for c in top])
            w = np.exp(w - w.max())
            w /= w.sum()
            out[qy, qx] = sum(wi * c[1] for wi, c in zip(w, top))
    return out


def test_c2f_matches_oracle():
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import masked_attention_c2f

    rng = np.random.default_rng(0)
    hc = wc = 4
    scale, rf = 2, 1
    hf = wf = hc * scale
    T, C, Cf, Cv = 2, 6, 6, 3
    query = rng.standard_normal((hc, wc, C)).astype(np.float32)
    key = rng.standard_normal((T, hc, wc, C)).astype(np.float32)
    qf = rng.standard_normal((hf, wf, Cf)).astype(np.float32)
    kf = rng.standard_normal((T, hf, wf, Cf)).astype(np.float32)
    value = rng.standard_normal((T, hf, wf, Cv)).astype(np.float32)

    got = np.asarray(
        masked_attention_c2f(
            jnp.asarray(query), jnp.asarray(key), jnp.asarray(qf),
            jnp.asarray(kf), jnp.asarray(value),
            radius=2.5, radius_fine=rf, temperature=0.1, topk=4,
        )
    )
    expect = c2f_oracle(query, key, qf, kf, value, 2.5, rf, 0.1, 4)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_c2f_step_chunking_matches_unchunked():
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import masked_attention_c2f

    rng = np.random.default_rng(3)
    T, hc, wc, C = 3, 6, 6, 4
    scale, rf = 2, 3
    hf, wf = hc * scale, wc * scale
    q = jnp.asarray(rng.standard_normal((hc, wc, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, hc, wc, C)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((hf, wf, C)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((T, hf, wf, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, hf, wf, 2)), jnp.float32)
    kw = dict(radius=2.5, radius_fine=rf, temperature=0.07, topk=4)
    full = masked_attention_c2f(q, k, qf, kf, v, **kw)
    # 13 does not divide 36 — exercises the pad/trim path
    chunked = masked_attention_c2f(q, k, qf, kf, v, step=13, **kw)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-5
    )


def test_c2f_key_valid_masks_frames():
    """An invalid frame must contribute nothing: equals running without it
    (the extra slot filled by a duplicate of a valid frame)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import masked_attention_c2f

    rng = np.random.default_rng(4)
    T, hc, wc, C = 3, 6, 6, 4
    scale, rf = 2, 3
    hf, wf = hc * scale, wc * scale
    k = jnp.asarray(rng.standard_normal((T, hc, wc, C)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((T, hf, wf, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, hf, wf, 2)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((hc, wc, C)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((hf, wf, C)), jnp.float32)
    kw = dict(radius=2.5, radius_fine=rf, temperature=0.07, topk=4)

    masked = masked_attention_c2f(
        q, k, qf, kf, v,
        key_valid=jnp.asarray([True, True, False]), **kw
    )
    two_only = masked_attention_c2f(
        q, k[:2], qf, kf[:2], v[:2], **kw
    )
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(two_only), rtol=1e-5, atol=1e-5
    )


def test_c2f_propagation_wiring():
    """attention_impl='c2f' runs the full propagation scan and tracks a
    moving gaussian on translating features about as well as the dense
    path (easy synthetic motion).

    Features must be spatially SMOOTH (like real backbone features): the
    coarse stage matches average-pooled features, and white-noise fields
    decorrelate under sub-pool-size shifts — an adversarial input no real
    encoder produces."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import draw_gaussian_maps

    rng = np.random.default_rng(5)
    T, h, w, C, P = 5, 16, 16, 8, 2
    H, W = 32, 32
    # smooth feature field (4x bilinear upsample of coarse noise)
    # translating 1 px/frame -> ground-truth motion known
    coarse = rng.standard_normal(((h + T) // 4 + 1, (w + T) // 4 + 1, C))
    base = np.asarray(
        jax.image.resize(
            jnp.asarray(coarse, jnp.float32), (h + T, w + T, C), "bilinear"
        )
    )
    feats = np.stack(
        [base[t : t + h, t : t + w] for t in range(T)], axis=0
    )

    pts = np.array([[10.0, 12.0], [20.0, 16.0]], np.float32)
    init_maps = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=3.0, stride=2)
    )

    coords = {}
    for impl in ("dense", "c2f"):
        cfg = TestConfig(
            precede_frames=2, topk=4, temperature=0.07, neighbor_range=12,
            step=64, input_size=(H, W), frame_bucket=4, point_bucket=4,
            attention_impl=impl, c2f_scale=2, radius_fine=3, c2f_step=64,
        )
        tr = Tracker(lambda v, x: x, {}, cfg)
        coords[impl] = np.asarray(
            tr._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
        )[..., :2]
    assert np.all(np.isfinite(coords["c2f"]))
    # both implementations track the -1 px/frame drift (full-res -2)
    gt = pts[None] - 2.0 * np.arange(T)[:, None, None] * np.array([1.0, 1.0])
    for impl in ("dense", "c2f"):
        err = np.abs(coords[impl] - gt).max()
        assert err < 4.0, (impl, err, coords[impl], gt)
    # and agree with each other on this easy case
    assert np.abs(coords["c2f"] - coords["dense"]).max() < 4.0
