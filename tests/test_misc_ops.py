"""Misc ops + ViT backbone sanity/numeric tests."""

import numpy as np


def test_sinkhorn_doubly_stochastic():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import sinkhorn_knopp

    rng = np.random.default_rng(0)
    q = np.asarray(
        sinkhorn_knopp(
            jnp.asarray(rng.standard_normal((8, 12)), jnp.float32),
            n_iters=50,
            epsilon=1.0,
        )
    )
    # rows sum to 1 exactly; columns converge to n/m for soft epsilon
    np.testing.assert_allclose(q.sum(axis=1), np.ones(8), atol=1e-4)
    np.testing.assert_allclose(q.sum(axis=0), np.full(12, 8 / 12), atol=1e-2)


def test_sincos_embedding():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import sincos_embedding_1d, sincos_embedding_2d

    e = np.asarray(sincos_embedding_1d(8, jnp.asarray([0.0, 1.0])))
    assert e.shape == (2, 8)
    np.testing.assert_allclose(e[0, :4], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(e[0, 4:], 1.0, atol=1e-7)   # cos(0)
    g = sincos_embedding_2d(16, 4, 6)
    assert g.shape == (4, 6, 16)


def test_hog_descriptor():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import hog_descriptor

    # vertical edge image -> gradient energy concentrated in one bin
    img = np.zeros((16, 16), np.float32)
    img[:, 8:] = 1.0
    h = np.asarray(hog_descriptor(jnp.asarray(img), n_bins=9, cell=8))
    assert h.shape == (2, 2, 9)
    # horizontal gradient = orientation 0 -> bin 0 dominates where the edge is
    assert h[0, 0].argmax() == 0 or h[0, 1].argmax() == 0


def test_vfs_propagate():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import compute_affinity, propagate_vfs

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((10, 16)).astype(np.float32)
    labels = np.eye(10, dtype=np.float32)
    aff = compute_affinity(
        jnp.asarray(feats), jnp.asarray(feats), temperature=0.01
    )
    out = np.asarray(propagate_vfs(aff, jnp.asarray(labels), topk=3))
    # self-affinity dominates -> propagated label ~ identity
    assert (out.argmax(axis=-1) == np.arange(10)).all()


def test_vit_backbone_shapes():
    import jax

    from fgvc_tpu.models.vit import VisionTransformer

    model = VisionTransformer(patch=8, dim=64, depth=2, heads=4)
    x = np.zeros((2, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 4, 4, 64)


def test_deform_im2col_zero_offset_is_unfold():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import deform_im2col

    rng = np.random.default_rng(0)
    H, W, C = 6, 7, 2
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    out = np.asarray(
        deform_im2col(jnp.asarray(img), jnp.zeros((H, W, 2)), kernel_size=3)
    )
    assert out.shape == (H, W, 9, C)
    # center tap equals the pixel itself
    np.testing.assert_allclose(out[:, :, 4], img, rtol=1e-6)
    # top-left tap equals the up-left neighbor (zeros at the border)
    np.testing.assert_allclose(out[1:, 1:, 0], img[:-1, :-1], rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 0], 0.0)


def test_deform_im2col_fractional_offset():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import deform_im2col

    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    off = np.full((4, 4, 2), 0.5, np.float32)
    out = np.asarray(deform_im2col(jnp.asarray(img), jnp.asarray(off), 1))
    # sampling at (x+0.5, y+0.5): average of the 2x2 neighborhood
    expect = (img[1, 1] + img[1, 2] + img[2, 1] + img[2, 2]) / 4
    np.testing.assert_allclose(out[1, 1, 0, 0], expect, rtol=1e-6)
