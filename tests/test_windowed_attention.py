"""Tiled windowed attention must match the dense masked kernel exactly."""

import numpy as np
import pytest


@pytest.mark.parametrize("impl", ["exact", "segmented", "certified"])
@pytest.mark.parametrize(
    "H,W,tile,radius,topk",
    [
        (16, 16, 8, 4.0, 5),
        (20, 14, 8, 3.0, 4),   # non-divisible by tile
        (12, 12, 12, 5.0, None),
    ],
)
def test_tiled_matches_dense(H, W, tile, radius, topk, impl):
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import masked_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(0)
    T, C, Cv = 3, 8, 5
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    valid = np.array([True] * (T - 1) + [False])

    dense = np.asarray(
        masked_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=radius, temperature=0.07, topk=topk, step=64,
            key_valid=jnp.asarray(valid),
        )
    )
    tiled = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=radius, temperature=0.07, topk=topk, tile=tile,
            key_valid=jnp.asarray(valid), topk_impl=impl,
        )
    )
    np.testing.assert_allclose(tiled, dense, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["segmented", "certified"])
def test_gather_free_impls_handle_duplicated_keys(impl):
    """Duplicated key frames (the t <= precede_frames first-frame quirk)
    create exact affinity ties straddling the k-boundary; the gather-free
    paths' tie-split must still match the exact gather path."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(7)
    H = W = 12
    T, C, Cv = 4, 8, 3
    f0 = rng.standard_normal((H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((H, W, C)).astype(np.float32)
    # frames 0, 1, 2 all duplicate f0 (like early propagation steps);
    # duplicated frames carry the SAME value map, as in the tracker
    k = np.stack([f0, f0, f0, f1])
    v0 = rng.standard_normal((H, W, Cv)).astype(np.float32)
    v1 = rng.standard_normal((H, W, Cv)).astype(np.float32)
    v = np.stack([v0, v0, v0, v1])
    q = rng.standard_normal((H, W, C)).astype(np.float32)

    kw = dict(radius=4.0, temperature=0.07, topk=5, tile=6)
    exact = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            topk_impl="exact", **kw,
        )
    )
    fast = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            topk_impl=impl, **kw,
        )
    )
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-5)


def test_bank_mode_matches_direct():
    import jax.numpy as jnp

    from fgvc_tpu.ops.windowed_attention import (
        masked_topk_attention_tiled,
        pad_key_bank,
    )

    rng = np.random.default_rng(2)
    Tb, H, W, C, Cv = 5, 16, 16, 8, 3
    bank = rng.standard_normal((Tb, H, W, C)).astype(np.float32)
    v = rng.standard_normal((3, H, W, Cv)).astype(np.float32)
    q = bank[4]
    frame_idx = np.array([0, 2, 3])
    valid = np.array([True, True, False])

    direct = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(bank[frame_idx]), jnp.asarray(v),
            radius=4.0, temperature=0.07, topk=4, tile=8,
            key_valid=jnp.asarray(valid),
        )
    )
    bank_pad = pad_key_bank(jnp.asarray(bank), 4.0, tile=8)
    banked = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), bank_pad, jnp.asarray(v),
            radius=4.0, temperature=0.07, topk=4, tile=8,
            key_valid=jnp.asarray(valid),
            frame_idx=jnp.asarray(frame_idx),
        )
    )
    np.testing.assert_allclose(banked, direct, rtol=1e-5, atol=1e-6)
