"""Transformer heads: LoFTR attention parity vs a numpy oracle, layer/stack
shapes, SpaTempFormer trajectory head."""

import numpy as np
import pytest


def _np_linear_attention(q, k, v, eps=1e-6):
    """Numpy restatement of LoFTR LinearAttention (modules.py:31-64)."""
    fm = lambda x: np.where(x > 0, x + 1.0, np.exp(x))  # elu(x)+1
    Q, K = fm(q), fm(k)
    s = v.shape[1]
    v = v / s
    KV = np.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (np.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    return np.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s


def test_linear_attention_matches_oracle():
    import jax.numpy as jnp

    from fgvc_tpu.models.components.transformers import linear_attention

    rng = np.random.default_rng(0)
    N, L, S, H, D = 2, 6, 7, 2, 4
    q = rng.standard_normal((N, L, H, D)).astype(np.float32)
    k = rng.standard_normal((N, S, H, D)).astype(np.float32)
    v = rng.standard_normal((N, S, H, D)).astype(np.float32)
    out = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, _np_linear_attention(q, k, v), rtol=1e-4, atol=1e-5)


def test_full_attention_is_softmax_attention():
    import jax.numpy as jnp

    from fgvc_tpu.models.components.transformers import full_attention

    rng = np.random.default_rng(1)
    N, L, S, H, D = 1, 5, 5, 2, 8
    q = rng.standard_normal((N, L, H, D)).astype(np.float32)
    k = rng.standard_normal((N, S, H, D)).astype(np.float32)
    v = rng.standard_normal((N, S, H, D)).astype(np.float32)
    out = np.asarray(full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    qk = np.einsum("nlhd,nshd->nlsh", q, k) / np.sqrt(D)
    a = np.exp(qk - qk.max(axis=2, keepdims=True))
    a = a / a.sum(axis=2, keepdims=True)
    ref = np.einsum("nlsh,nshd->nlhd", a, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_position_encoding_sine_structure():
    from fgvc_tpu.models.components.transformers import position_encoding_sine

    pe = np.asarray(position_encoding_sine(32, 8, 10))
    assert pe.shape == (8, 10, 32)
    # channel 0 = sin(x * div0) with 1-indexed positions
    div0 = np.exp(0.0)
    np.testing.assert_allclose(pe[0, :, 0], np.sin((np.arange(10) + 1) * div0), atol=1e-5)
    np.testing.assert_allclose(pe[:, 0, 3], np.cos((np.arange(8) + 1) * div0), atol=1e-5)


@pytest.mark.parametrize("attention", ["linear", "full"])
def test_feature_transformer_self_cross(attention):
    import jax

    from fgvc_tpu.models.components.transformers import FeatureTransformer

    rng = np.random.default_rng(2)
    N, H, W, C = 1, 6, 6, 16
    f0 = rng.standard_normal((N, H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((N, H, W, C)).astype(np.float32)
    ft = FeatureTransformer(
        d_model=C, nhead=4, attention=attention,
        layer_names=("self", "cross"),
    )
    vars_ = ft.init(jax.random.PRNGKey(0), f0, f1)
    o0, o1 = ft.apply(vars_, f0, f1)
    assert o0.shape == o1.shape == (N, H, W, C)
    assert np.all(np.isfinite(np.asarray(o0)))
    # cross attention actually mixes: changing f1 changes o0
    o0b, _ = ft.apply(vars_, f0, f1 + 1.0)
    assert not np.allclose(np.asarray(o0), np.asarray(o0b))


def test_feature_transformer_single_map():
    import jax

    from fgvc_tpu.models.components.transformers import FeatureTransformer

    f0 = np.random.default_rng(3).standard_normal((1, 4, 4, 8)).astype(np.float32)
    ft = FeatureTransformer(d_model=8, nhead=2, layer_names=("self",))
    vars_ = ft.init(jax.random.PRNGKey(0), f0)
    out = ft.apply(vars_, f0)
    assert out.shape == (1, 4, 4, 8)


def test_spa_temp_former_shapes():
    import jax

    from fgvc_tpu.models.components.transformers import SpaTempFormer

    B, T, P, Cin = 1, 4, 6, 320
    model = SpaTempFormer(
        space_depth=2, time_depth=2, input_dim=Cin, hidden_size=64,
        num_heads=4, output_dim=130,
    )
    x = np.random.default_rng(4).standard_normal((B, T, P, Cin)).astype(np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (B, T, P, 130)
    assert np.all(np.isfinite(np.asarray(out)))


def test_spa_temp_former_as_traj_pred_head():
    """SpaTempFormer plugs into TrajPyramidDecoderV2 as the update head
    (the reference's transformer traj_pred configuration)."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.components.traj_decoder import TrajPyramidDecoderV2
    from fgvc_tpu.models.components.transformers import SpaTempFormer

    B, T, P, C, H, W = 1, 3, 2, 128, 8, 8
    head = SpaTempFormer(
        space_depth=1, time_depth=1, input_dim=456, hidden_size=64,
        num_heads=4, output_dim=C + 2,
    )
    dec = TrajPyramidDecoderV2(traj_pred=head, radius=3, iters=2, input_dim=C)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(1, 6, (B, T, P, 2)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((B, T, P, C)), jnp.float32)
    vis = jnp.ones((B, T, P, 1), jnp.float32)
    tm = jnp.ones((B, T, P, 1), jnp.float32)
    vars_ = dec.init(jax.random.PRNGKey(0), feats, coords, qf, vis, tm)
    preds, _, _ = dec.apply(vars_, feats, coords, qf, vis, tm)
    assert preds[-1].shape == (B, T, P, 2)
    assert np.all(np.isfinite(np.asarray(preds[-1])))


def test_gmflow_feature_transformer():
    import jax

    from fgvc_tpu.models.components.transformers import GMFeatureTransformer

    rng = np.random.default_rng(6)
    B, H, W, C = 1, 8, 8, 32
    f0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    m = GMFeatureTransformer(num_layers=2, d_model=C)
    v = m.init(jax.random.PRNGKey(0), f0, f1, num_splits=2)
    o0, o1 = m.apply(v, f0, f1, num_splits=2)
    assert o0.shape == o1.shape == (B, H, W, C)
    assert np.all(np.isfinite(np.asarray(o0)))
    # cross-attention couples the two frames
    o0b, _ = m.apply(v, f0, f1 + 1.0, num_splits=2)
    assert not np.allclose(np.asarray(o0), np.asarray(o0b))

    # full attention variant
    m2 = GMFeatureTransformer(num_layers=1, d_model=C, attention_type="full")
    v2 = m2.init(jax.random.PRNGKey(0), f0, f1, num_splits=1)
    o2, _ = m2.apply(v2, f0, f1, num_splits=1)
    assert np.all(np.isfinite(np.asarray(o2)))


def test_swin3d_value_propagation():
    import jax

    from fgvc_tpu.models.components.transformers import Swin3D

    rng = np.random.default_rng(7)
    B, T, H, W = 1, 4, 8, 8
    x = rng.standard_normal((B, T, H, W, 16)).astype(np.float32)
    v = rng.standard_normal((B, T, H, W, 32)).astype(np.float32)
    m = Swin3D(embed_dim=16, value_dim=32, depth=2, heads=2,
               t_window=2, s_window=4)
    vars_ = m.init(jax.random.PRNGKey(0), x, v)
    out = m.apply(vars_, x, v)
    assert out.shape == (B, T, H, W, 32)
    assert np.all(np.isfinite(np.asarray(out)))
    # features drive the attention: changing x changes the output
    out2 = m.apply(vars_, x + 1.0, v)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
