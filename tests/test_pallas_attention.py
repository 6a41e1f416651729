"""Pallas fused attention vs the XLA tiled kernel (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize(
    "H,W,tile,radius,mask_shape",
    [
        (16, 16, 8, 4.0, "circle"),
        (16, 16, 8, 3.0, "square"),
        (24, 16, 8, 4.0, "circle"),
    ],
)
def test_fused_matches_tiled(H, W, tile, radius, mask_shape):
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(0)
    T, C, Cv = 3, 8, 5
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    valid = np.array([True, True, False])

    ref = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=radius, temperature=0.07, topk=4, tile=tile,
            mask_shape=mask_shape, key_valid=jnp.asarray(valid),
        )
    )
    out = np.asarray(
        fused_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            radius=radius, temperature=0.07, topk=4, tile=tile,
            mask_shape=mask_shape, key_valid=jnp.asarray(valid),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_duplicate_first_frame_keys():
    """Early propagation steps duplicate frame 0 in the key set; the fused
    kernel must weight duplicates exactly like the top-k reference."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(1)
    H = W = 16
    C, Cv = 8, 3
    f0 = rng.standard_normal((H, W, C)).astype(np.float32)
    k = np.stack([f0, f0, rng.standard_normal((H, W, C)).astype(np.float32)])
    # duplicated key frames carry IDENTICAL values in the real eval (both
    # slots hold the first-frame label map) — the fused kernel's fractional
    # tie split is then bit-equivalent to pick-one-copy top-k
    v0 = rng.standard_normal((H, W, Cv)).astype(np.float32)
    v = np.stack([v0, v0, rng.standard_normal((H, W, Cv)).astype(np.float32)])

    ref = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(f0), jnp.asarray(k), jnp.asarray(v),
            radius=4.0, temperature=0.07, topk=4, tile=8,
        )
    )
    out = np.asarray(
        fused_topk_attention(
            jnp.asarray(f0), jnp.asarray(k), jnp.asarray(v),
            radius=4.0, temperature=0.07, topk=4, tile=8, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_high_mode_close_to_float32():
    """Manual bf16x3 affinity: ~1e-5-relative agreement with full f32."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention

    rng = np.random.default_rng(9)
    H = W = 16
    T, C, Cv = 3, 32, 4
    q = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, H, W, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, H, W, Cv)), jnp.float32)
    kw = dict(radius=4.0, temperature=0.07, topk=5, tile=8, interpret=True)
    a = np.asarray(fused_topk_attention(q, k, v, compute_dtype="float32", **kw))
    b = np.asarray(fused_topk_attention(q, k, v, compute_dtype="high", **kw))
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3)


def test_underfull_topk_matches_tiled():
    """Fewer valid candidates than topk (tiny radius): the tie fraction must
    clamp so every valid key is taken exactly once (review finding r2)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(11)
    H = W = 8
    T, C, Cv = 1, 8, 3
    q = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, H, W, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, H, W, Cv)), jnp.float32)
    # radius 1.5 -> at most 5 in-circle keys per pixel, topk=10 under-full
    a = np.asarray(
        fused_topk_attention(
            q, k, v, radius=1.5, temperature=0.07, topk=10, tile=8,
            interpret=True,
        )
    )
    b = np.asarray(
        masked_topk_attention_tiled(
            q, k, v, radius=1.5, temperature=0.07, topk=10, tile=8,
            topk_impl="exact",
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_bfloat16_mode_sane():
    """The promoted bf16 throughput mode (bf16 affinity matmul + bf16
    pass-C value matmul/DMA): probability values must propagate as a
    convex combination (rows sum to ~1), stay finite under the
    duplicated-first-frame tie structure, and track the f32 kernel
    closely wherever top-k membership is stable (loose mean tolerance —
    individual pixels may flip near-tied members)."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention

    rng = np.random.default_rng(12)
    H = W = 16
    T, C, P = 4, 16, 5
    q = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, H, W, C)), jnp.float32)
    logits = rng.standard_normal((T, H, W, P)).astype(np.float32)
    v = jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

    o32 = np.asarray(
        fused_topk_attention(
            q, k, v, radius=4.0, temperature=1.0, topk=3, tile=8,
            interpret=True,
        )
    )
    ob = np.asarray(
        fused_topk_attention(
            q, k, v, radius=4.0, temperature=1.0, topk=3, tile=8,
            compute_dtype="bfloat16", interpret=True,
        )
    )
    assert np.isfinite(ob).all()
    np.testing.assert_allclose(ob.sum(-1), 1.0, atol=1e-2)
    assert np.abs(ob - o32).mean() < 0.01

    # duplicated first frame (early-propagation tie structure)
    kd = jnp.concatenate([k[:1]] * T, axis=0)
    obd = np.asarray(
        fused_topk_attention(
            q, kd, v, radius=4.0, temperature=1.0, topk=3, tile=8,
            compute_dtype="bfloat16", interpret=True,
        )
    )
    assert np.isfinite(obd).all()
    np.testing.assert_allclose(obd.sum(-1), 1.0, atol=1e-2)


def test_tie_semantics_at_threshold():
    """Pin the ONE documented semantic divergence between the kernels.

    When candidates tie at the k-th affinity value but carry DIFFERENT
    values, the XLA exact path picks winners by index order (lax.top_k,
    matching torch.topk in the reference) while the fused Pallas kernel
    splits the threshold weight fractionally across the tied candidates
    (permutation-invariant; see ops/pallas/topk_attention.py docstring).
    Construct three identical-feature keys inside the query's window with
    distinct one-hot values and check both behaviors explicitly.
    """
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    H = W = 8
    C = 4
    rng = np.random.default_rng(3)
    a = rng.standard_normal(C).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    k = np.broadcast_to(b, (1, H, W, C)).copy()
    # identical vector `a` at flat positions 0, 1, 9 — all strictly inside
    # the radius-2 circle of query (0, 0)
    for (y, x) in [(0, 0), (0, 1), (1, 1)]:
        k[0, y, x] = a
    q = np.broadcast_to(a, (H, W, C)).copy()  # query (0,0) matches `a` best
    v = np.eye(H * W, dtype=np.float32).reshape(1, H, W, H * W)

    kwargs = dict(radius=2.0, temperature=0.07, topk=1, tile=8,
                  mask_shape="circle")
    tiled = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kwargs
        )
    )[0, 0]
    fused = np.asarray(
        fused_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True,
            **kwargs
        )
    )[0, 0]

    expect_tiled = np.zeros(H * W, np.float32)
    expect_tiled[0] = 1.0  # pick-one: lowest flat index among the ties
    expect_fused = np.zeros(H * W, np.float32)
    expect_fused[[0, 1, 9]] = 1.0 / 3.0  # fractional split across the ties
    np.testing.assert_allclose(tiled, expect_tiled, atol=1e-5)
    np.testing.assert_allclose(fused, expect_fused, atol=1e-5)
