"""Ablation backbones: MAST, SE/TSM ResNet variants, Swin."""

import numpy as np
import pytest


def test_resnet18_mast_shapes():
    import jax

    from fgvc_tpu.models.backbones_extra import ResNet18MAST

    m = ResNet18MAST()
    x = np.zeros((1, 32, 32, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 16, 16, 256)  # stride 2, all stages stride 1


def test_se_resnet_variant():
    import jax

    from fgvc_tpu.models.resnet import ResNet

    m = ResNet(depth=18, se_ratio=8, out_indices=(3,))
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "se_fc1" in v["params"]["layer1_0"]
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 1, 1, 512)
    assert np.all(np.isfinite(np.asarray(out)))


def test_tsm_temporal_shift_semantics():
    import jax.numpy as jnp

    from fgvc_tpu.models.resnet import temporal_shift

    T, C = 3, 8
    x = np.arange(T * C, dtype=np.float32).reshape(T, 1, 1, C)
    out = np.asarray(temporal_shift(jnp.asarray(x), num_segments=T, shift_div=4))
    fold = C // 4
    # first fold: shifted one frame forward (frame t sees frame t+1)
    np.testing.assert_array_equal(out[0, 0, 0, :fold], x[1, 0, 0, :fold])
    np.testing.assert_array_equal(out[-1, 0, 0, :fold], 0)
    # second fold: shifted back (frame t sees frame t-1)
    np.testing.assert_array_equal(out[1, 0, 0, fold:2 * fold], x[0, 0, 0, fold:2 * fold])
    np.testing.assert_array_equal(out[0, 0, 0, fold:2 * fold], 0)
    # rest unchanged
    np.testing.assert_array_equal(out[..., 2 * fold:], x[..., 2 * fold:])


def test_tsm_resnet_runs():
    import jax

    from fgvc_tpu.models.resnet import ResNet

    m = ResNet(depth=18, tsm_segments=4, out_indices=(2,), pool_type="none",
               strides=(1, 1, 1, 4))
    x = np.random.default_rng(1).standard_normal((4, 16, 16, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (4, 8, 8, 256)
    assert np.all(np.isfinite(np.asarray(out)))


def test_swin_tiny_shapes():
    import jax

    from fgvc_tpu.models.backbones_extra import SwinTransformer

    m = SwinTransformer(
        patch=4, embed_dim=32, depths=(2, 2), heads=(2, 4), window=4,
        out_indices=(0, 1),
    )
    x = np.random.default_rng(2).standard_normal((1, 32, 32, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    o0, o1 = m.apply(v, x, train=False)
    assert o0.shape == (1, 8, 8, 32)   # stride 4
    assert o1.shape == (1, 4, 4, 64)   # stride 8 after merging
    assert np.all(np.isfinite(np.asarray(o1)))
    # shifted-window blocks present (stage has 2 blocks, one shifted)
    assert "stage0_block1" in v["params"]


def test_swin_shift_mask_blocks_cross_border_attention():
    """With a constant input, shifted and unshifted blocks must both
    produce finite, spatially-uniform outputs (mask correctness smoke)."""
    import jax

    from fgvc_tpu.models.backbones_extra import SwinBlock

    m = SwinBlock(dim=16, heads=2, window=4, shift=2)
    x = np.ones((1, 8, 8, 16), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(
        out, np.broadcast_to(out[:, :1, :1], out.shape), rtol=1e-4, atol=1e-5
    )


def test_p3da_resnet_clip_features():
    import jax

    from fgvc_tpu.models.backbones_extra import P3DAResNet

    m = P3DAResNet()
    x = np.random.default_rng(3).standard_normal((1, 4, 32, 32, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 4, 8, 8, 256)  # stride 4 (stem 2 * layer2 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_resnet18_pos_ape_toggle():
    import jax

    from fgvc_tpu.models.backbones_extra import ResNet18Pos

    m = ResNet18Pos(pos_grid=16)
    x = np.random.default_rng(4).standard_normal((1, 32, 32, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # zero-init pos embed: identical with/without APE at init
    a = m.apply(v, x, train=False, ape=True)
    b = m.apply(v, x, train=False, ape=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1, 8, 8, 256)
    # non-zero embed changes the features when APE is on
    import jax.numpy as jnp

    v2 = jax.tree_util.tree_map(lambda y: y, v)
    v2["params"] = dict(v2["params"])
    v2["params"]["pos_embed1"] = jnp.ones_like(v["params"]["pos_embed1"])
    a2 = m.apply(v2, x, train=False, ape=True)
    assert not np.allclose(np.asarray(a2), np.asarray(b))


def test_mvit_multiscale_shapes():
    import jax

    from fgvc_tpu.models.backbones_extra import MViT

    m = MViT(patch=4, embed_dim=16, depths=(1, 1, 1), heads=(1, 2, 4),
             out_indices=(0, 1, 2))
    x = np.random.default_rng(5).standard_normal((1, 32, 32, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    o0, o1, o2 = m.apply(v, x, train=False)
    assert o0.shape == (1, 8, 8, 16)    # stride 4
    assert o1.shape == (1, 4, 4, 32)    # stride 8, dims doubled
    assert o2.shape == (1, 2, 2, 64)    # stride 16
    assert np.all(np.isfinite(np.asarray(o2)))
