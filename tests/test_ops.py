"""Numeric tests for the ops core against cv2 / numpy oracles."""

import numpy as np
import pytest

from oracles import local_correlation_ref, masked_attention_ref


def test_rgb_to_lab_matches_cv2():
    import cv2
    import jax.numpy as jnp

    from fgvc_tpu.ops.color import rgb_to_lab

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_lab(jnp.asarray(img, jnp.float32) / 255.0))
    ref = cv2.cvtColor(np.float32(img) / 255.0, cv2.COLOR_RGB2Lab)
    # cv2 quantizes through internal 1/128-step LUTs — agreement is ~0.35
    # absolute, i.e. < 0.004 after the /127 channel normalization.
    np.testing.assert_allclose(ours, ref, atol=0.5)


def test_normalize_preprocess():
    import jax.numpy as jnp

    from fgvc_tpu.ops.color import LAB_MEAN, LAB_STD, preprocess_rgb_to_lab_normalized

    img = np.full((4, 4, 3), 255, dtype=np.uint8)
    out = np.asarray(preprocess_rgb_to_lab_normalized(jnp.asarray(img)))
    # white -> L=100, a~0, b~0 -> normalized L = (100-50)/50 = 1
    assert abs(out[0, 0, 0] - 1.0) < 1e-3
    assert abs(out[0, 0, 1]) < 0.05 and abs(out[0, 0, 2]) < 0.05


def test_gaussian_maps_match_reference_strided_draw():
    import jax.numpy as jnp

    from fgvc_tpu.ops.grids import draw_gaussian_maps

    rng = np.random.default_rng(1)
    H = W = 32
    stride, sigma = 2, 6.0
    pts = rng.uniform(0, 31, size=(5, 2)).astype(np.float32)
    ours = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=sigma, stride=stride)
    )
    # reference: draw full-res then subsample ::stride
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    full = np.exp(
        -(
            (gx[None] - pts[:, 0, None, None]) ** 2
            + (gy[None] - pts[:, 1, None, None]) ** 2
        )
        / (2 * sigma**2)
    )
    ref = full[:, ::stride, ::stride]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_soft_argmax_matches_reference_img2coord():
    import jax.numpy as jnp

    from fgvc_tpu.ops.grids import soft_argmax_topk
    from oracles import img2coord_np

    rng = np.random.default_rng(2)
    T, P, H, W = 3, 4, 16, 20
    maps = rng.random((T, P, H, W)).astype(np.float32)
    maps[1, 2] = 0.0  # all-zero map -> (-1, -1)
    ref = img2coord_np(maps, topk=5)  # (2, P, T)
    ours = np.asarray(soft_argmax_topk(jnp.asarray(maps), topk=5))  # (T, P, 2)
    np.testing.assert_allclose(ours[..., 0], ref[0].T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ours[..., 1], ref[1].T, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("topk,radius,non_mask_len", [
    (None, None, 0),
    (5, None, 0),
    (5, 4.0, 0),
    (5, 4.0, 1),
    (10, 7.5, 0),
])
def test_masked_topk_attention_vs_oracle(topk, radius, non_mask_len):
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import masked_topk_attention

    rng = np.random.default_rng(3)
    T, H, W, C, Cv = 3, 12, 14, 16, 6
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)

    out = np.asarray(
        masked_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=radius, temperature=0.07, topk=topk,
            step=64, non_mask_len=non_mask_len,
        )
    )
    ref = masked_attention_ref(
        np.transpose(q, (2, 0, 1)),
        np.transpose(k, (3, 0, 1, 2)),
        np.transpose(v, (3, 0, 1, 2)),
        radius=radius, temperature=0.07, topk=topk,
        non_mask_len=non_mask_len,
    )
    np.testing.assert_allclose(out, np.transpose(ref, (1, 2, 0)), rtol=2e-3, atol=2e-3)


def test_masked_topk_attention_key_valid_matches_dropping_frames():
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import masked_topk_attention

    rng = np.random.default_rng(4)
    T, H, W, C, Cv = 4, 10, 10, 8, 3
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    valid = np.array([True, False, True, False])

    out = np.asarray(
        masked_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=5.0, temperature=0.1, topk=4, step=50,
            key_valid=jnp.asarray(valid),
        )
    )
    ref = masked_attention_ref(
        np.transpose(q, (2, 0, 1)),
        np.transpose(k[valid], (3, 0, 1, 2)),
        np.transpose(v[valid], (3, 0, 1, 2)),
        radius=5.0, temperature=0.1, topk=4,
    )
    np.testing.assert_allclose(out, np.transpose(ref, (1, 2, 0)), rtol=2e-3, atol=2e-3)


def test_local_correlation_vs_bruteforce():
    import jax.numpy as jnp

    from fgvc_tpu.ops.local_corr import local_correlation

    rng = np.random.default_rng(5)
    H, W, C, R = 9, 11, 7, 3
    tar = rng.standard_normal((H, W, C)).astype(np.float32)
    ref = rng.standard_normal((H, W, C)).astype(np.float32)
    out = np.asarray(local_correlation(jnp.asarray(tar), jnp.asarray(ref), R))
    expect = local_correlation_ref(tar, ref, R)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_extract_displacement_windows():
    import jax.numpy as jnp

    from fgvc_tpu.ops.local_corr import extract_displacement_windows

    rng = np.random.default_rng(6)
    H, W, C, R = 6, 7, 2, 2
    x = rng.standard_normal((H, W, C)).astype(np.float32)
    out = np.asarray(extract_displacement_windows(jnp.asarray(x), R))
    x_pad = np.pad(x, ((R, R), (R, R), (0, 0)))
    for i in range(H):
        for j in range(W):
            np.testing.assert_allclose(
                out[i, j], x_pad[i : i + 2 * R + 1, j : j + 2 * R + 1]
            )


def test_spatial_neighbor_mask_circle():
    from fgvc_tpu.ops.attention import spatial_neighbor_mask

    m = np.asarray(spatial_neighbor_mask(5, 6, neighbor_range=4))
    gy, gx = np.meshgrid(np.arange(5), np.arange(6), indexing="ij")
    gy, gx = gy.reshape(-1), gx.reshape(-1)
    d = np.sqrt(
        (gy[:, None] - gy[None, :]) ** 2.0 + (gx[:, None] - gx[None, :]) ** 2.0
    )
    np.testing.assert_array_equal(m, d < 2)


def test_part_unfold_fractional_coords():
    import jax.numpy as jnp

    from fgvc_tpu.ops.local_corr import part_unfold

    rng = np.random.default_rng(7)
    x = rng.standard_normal((10, 12, 3)).astype(np.float32)
    # integer coordinate reproduces the exact window
    out = np.asarray(
        part_unfold(jnp.asarray(x), jnp.asarray([[5.0, 4.0]]), radius=1)
    )
    np.testing.assert_allclose(out[0], x[3:6, 4:7], rtol=1e-5)
    # half-pixel coordinate averages neighbors
    out = np.asarray(
        part_unfold(jnp.asarray(x), jnp.asarray([[5.5, 4.0]]), radius=0)
    )
    np.testing.assert_allclose(
        out[0, 0, 0], (x[4, 5] + x[4, 6]) / 2, rtol=1e-5
    )


def test_masked_topk_attention_l2_distance_mode():
    """sim_mode='l2-distance': aff = (2 k·q − |k|²)/√C, reference
    local_attention.py:324-327 (|q|² cancels under softmax/top-k)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import masked_topk_attention

    rng = np.random.default_rng(12)
    T, H, W, C, Cv = 2, 8, 8, 8, 3
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)

    out = np.asarray(
        masked_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=None, temperature=0.07, topk=4, normalize=True,
            step=16, sim_mode="l2-distance",
        )
    )

    # numpy oracle following the reference computation order
    def l2n(x, ax):
        return x / np.maximum(
            np.sqrt((x * x).sum(axis=ax, keepdims=True)), 1e-12
        )

    qn = l2n(q, -1).reshape(-1, C)
    kn = l2n(k, -1).reshape(-1, C)
    vf = v.reshape(-1, Cv)
    aff = (2 * qn @ kn.T - (kn * kn).sum(-1)[None, :]) / np.sqrt(C)
    idx = np.argsort(-aff, axis=-1)[:, :4]
    w = np.take_along_axis(aff, idx, axis=-1)
    w = np.exp(w - w.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("sk,skc->sc", w, vf[idx]).reshape(H, W, Cv)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_build_padded_bank_matches_pad_formula():
    """build_padded_bank writes frames one at a time into a zero buffer so
    the full normalized bank is never a separate HBM temp (the temp set the
    single-chip Kinetics bank ceiling — docs/roofline.md "bank capacity").
    It must be numerically equivalent to normalize-then-jnp.pad."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import build_padded_bank, l2_normalize

    rng = np.random.default_rng(3)
    bank = jnp.asarray(rng.standard_normal((4, 18, 22, 8)), jnp.float32)
    halo = 5
    rows_total, cols_total = 18 + 2 * halo + 6, 22 + 2 * halo + 2
    for normalize in (True, False):
        got = build_padded_bank(
            bank, halo=halo, rows_total=rows_total, cols_total=cols_total,
            normalize=normalize,
        )
        b = l2_normalize(bank) if normalize else bank
        want = jnp.pad(b, ((0, 0), (halo, 6 + halo), (halo, 2 + halo), (0, 0)))
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-7
        )
    # bf16 cast path (the pallas bank in bf16/high modes)
    got16 = build_padded_bank(
        bank, halo=halo, rows_total=rows_total, cols_total=cols_total,
        normalize=True, dtype=jnp.bfloat16,
    )
    assert got16.dtype == jnp.bfloat16
