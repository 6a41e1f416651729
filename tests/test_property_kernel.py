"""Property-based stress test: the Pallas fused kernel (interpret mode) must
match the XLA tiled kernel on RANDOM shapes, windows, and tie structures.

The agreement contract (see the tie-semantics note in
ops/pallas/topk_attention.py and
tests/test_pallas_attention.py::test_tie_semantics_at_threshold):

  * continuous random features (ties at the k-th value are measure-zero):
    exact agreement;
  * ties from IDENTICAL key vectors (flat regions, duplicated key frames)
    whose values are tied to the content: exact agreement — identical
    operands give bitwise-equal affinities under any fixed reduction order,
    and equal values make pick-one and fractional tie-split coincide.

NOT generated, deliberately:

  * identical-feature ties carrying DIFFERENT values — there the XLA path
    picks by index order (torch parity) while the fused kernel splits
    fractionally; that divergence is pinned by its own test above;
  * coincidental cross-vector ties (different key vectors whose dots round
    equal under one compute order but differ by an ulp under another) —
    their detection is compute-order-dependent in ANY implementation,
    including the reference's torch.topk, so no two backends can promise
    agreement on them.  (Hypothesis found exactly such a case when this
    test quantized features to a small alphabet.)
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    H=st.sampled_from([8, 16, 24]),
    W=st.sampled_from([8, 16]),
    T=st.integers(1, 3),
    C=st.sampled_from([4, 8]),
    Cv=st.integers(1, 4),
    topk=st.integers(1, 6),
    radius=st.sampled_from([2.0, 3.0, 4.5]),
    mask_shape=st.sampled_from(["circle", "square"]),
    pool_size=st.sampled_from([0, 2, 4]),  # 0 = continuous (tie-free) features
    duplicate_first=st.booleans(),
)
def test_fused_matches_tiled_property(
    seed, H, W, T, C, Cv, topk, radius, mask_shape, pool_size, duplicate_first
):
    import jax.numpy as jnp

    from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(seed)

    q = rng.standard_normal((H, W, C)).astype(np.float32)
    if pool_size:
        # flat-region ties: every position holds one of `pool_size` EXACT
        # vector copies -> massive within-frame and cross-frame affinity
        # ties from identical operands.  Values are tied to the content
        # (one value vector per pool entry), the regime where pick-one and
        # fractional tie-split provably coincide.
        pool = rng.standard_normal((pool_size, C)).astype(np.float32)
        vpool = rng.standard_normal((pool_size, Cv)).astype(np.float32)
        idx = rng.integers(pool_size, size=(T, H, W))
        k = pool[idx]
        v = vpool[idx]
    else:
        k = rng.standard_normal((T, H, W, C)).astype(np.float32)
        v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    if duplicate_first and T >= 2:
        # the eval path's t <= precede_frames structure: duplicated key
        # frames carry identical value maps
        k[1] = k[0]
        v[1] = v[0]

    # at least one valid key frame; invalid frames must not contribute
    valid = rng.random(T) < 0.8
    valid[rng.integers(T)] = True

    kwargs = dict(
        radius=radius,
        temperature=0.07,
        topk=topk,
        tile=8,
        mask_shape=mask_shape,
        key_valid=jnp.asarray(valid),
    )
    ref = np.asarray(
        masked_topk_attention_tiled(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kwargs)
    )
    out = np.asarray(
        fused_topk_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True, **kwargs
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    H=st.integers(5, 20),
    W=st.integers(5, 20),
    C=st.sampled_from([3, 8]),
    R=st.integers(1, 4),
)
def test_local_correlation_property(seed, H, W, C, R):
    """local_correlation vs the brute-force oracle on random shapes,
    including H/W smaller than the window (2R+1) and non-multiples of the
    internal tiling."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.local_corr import local_correlation
    from oracles import local_correlation_ref

    rng = np.random.default_rng(seed)
    tar = rng.standard_normal((H, W, C)).astype(np.float32)
    ref = rng.standard_normal((H, W, C)).astype(np.float32)
    out = np.asarray(local_correlation(jnp.asarray(tar), jnp.asarray(ref), R))
    expect = local_correlation_ref(tar, ref, R)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    H=st.sampled_from([8, 16]),
    W=st.sampled_from([8, 16]),
    T=st.integers(1, 3),
    topk=st.integers(1, 5),
    radius=st.sampled_from([2.0, 3.5]),
    mask_shape=st.sampled_from(["circle", "square"]),
)
def test_dense_matches_tiled_property(seed, H, W, T, topk, radius, mask_shape):
    """The dense reference-parity kernel and the tiled halo kernel must be
    numerically identical on continuous features (both pick top-k by index
    order; ties are measure-zero)."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.attention import masked_topk_attention
    from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

    rng = np.random.default_rng(seed)
    C, Cv = 6, 3
    q = rng.standard_normal((H, W, C)).astype(np.float32)
    k = rng.standard_normal((T, H, W, C)).astype(np.float32)
    v = rng.standard_normal((T, H, W, Cv)).astype(np.float32)
    valid = rng.random(T) < 0.8
    valid[rng.integers(T)] = True

    kwargs = dict(
        radius=radius,
        temperature=0.07,
        topk=topk,
        mask_shape=mask_shape,
        key_valid=jnp.asarray(valid),
    )
    dense = np.asarray(
        masked_topk_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kwargs)
    )
    tiled = np.asarray(
        masked_topk_attention_tiled(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tile=8, **kwargs
        )
    )
    np.testing.assert_allclose(tiled, dense, rtol=1e-5, atol=1e-5)
