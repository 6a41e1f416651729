"""Exactness tests for the segment-max prefiltered top-k (ops/topk.py).

Covers the production decode branch: soft_argmax_topk switches to
topk_segmented for rows longer than 4096, and the real DAVIS decode rows are
(P, 256*256=65536) — shapes no other test exercised before.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fgvc_tpu.ops.topk import topk_segmented


def _assert_topk_equivalent(x: np.ndarray, k: int, seg: int):
    """values must match lax.top_k exactly; indices must be a valid top-k set.

    Tie ORDER may differ from lax.top_k (documented), so compare sorted value
    lists and check each returned index points at its claimed value.
    """
    vals, idx = topk_segmented(jnp.asarray(x), k, seg=seg)
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_vals, _ = jax.lax.top_k(jnp.asarray(x), k)
    ref_vals = np.asarray(ref_vals)

    np.testing.assert_array_equal(
        np.sort(vals, axis=-1), np.sort(ref_vals, axis=-1)
    )
    gathered = np.take_along_axis(x, idx, axis=-1)
    np.testing.assert_array_equal(gathered, vals)
    # indices within each row must be distinct (no element reported twice)
    for row in idx:
        assert len(set(row.tolist())) == k


@pytest.mark.parametrize("S,K,k,seg", [
    (4, 1000, 10, 128),
    (3, 4096, 10, 512),
    (2, 65536, 5, 512),     # the real DAVIS decode shape (P, 256*256)
    (2, 65536, 10, 512),
    (5, 23064, 10, 128),    # the attention kernel's bank-row shape
    (2, 130, 10, 128),      # K barely above one segment
    (2, 128, 10, 128),      # K == seg exactly
])
def test_topk_segmented_matches_lax_topk(S, K, k, seg):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((S, K)).astype(np.float32)
    _assert_topk_equivalent(x, k, seg)


def test_topk_segmented_adversarial_ties():
    """Many duplicated maxima spread across segments."""
    rng = np.random.default_rng(1)
    S, K, k, seg = 3, 8192, 10, 256
    x = rng.standard_normal((S, K)).astype(np.float32)
    # plant 25 copies of the same large value in distinct segments
    for s in range(S):
        pos = rng.choice(K // seg, size=25, replace=False) * seg + s
        x[s, pos] = 7.25
    _assert_topk_equivalent(x, k, seg)


def test_topk_segmented_all_equal_rows():
    x = np.full((2, 5000), 3.5, np.float32)
    _assert_topk_equivalent(x, 10, 128)


def test_topk_segmented_topk_concentrated_in_one_segment():
    """Entire global top-k inside a single segment — the prefilter must keep
    enough candidates from that one segment."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 0, size=(2, 40960)).astype(np.float32)
    x[:, 1000:1010] = np.linspace(5, 6, 10, dtype=np.float32)
    _assert_topk_equivalent(x, 10, 512)


def test_topk_segmented_with_neg_inf_padding_values():
    """Rows containing -inf (masked entries) behave like lax.top_k."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6000)).astype(np.float32)
    x[:, ::7] = -np.inf
    _assert_topk_equivalent(x, 10, 128)


def test_soft_argmax_topk_production_shape_matches_oracle():
    """soft_argmax_topk at the real decode shape (P, 256, 256) — exercises the
    segmented branch — must match the reference img2coord decode."""
    from fgvc_tpu.ops.grids import soft_argmax_topk
    from oracles import img2coord_np

    rng = np.random.default_rng(4)
    P, H, W = 6, 256, 256
    maps = rng.random((1, P, H, W)).astype(np.float32)
    maps[0, 3] = 0.0  # all-zero map -> (-1, -1) sentinel
    ref = img2coord_np(maps, topk=5)              # (2, P, T)
    flat_in = jnp.asarray(maps[0])                # (P, H, W) -> 2-D rows inside
    ours = np.asarray(soft_argmax_topk(flat_in.reshape(P, H, W), topk=5))
    np.testing.assert_allclose(ours[:, 0], ref[0, :, 0], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ours[:, 1], ref[1, :, 0], rtol=1e-4, atol=1e-3)
