"""Loss zoo numerics against torch/scipy-free references."""

import numpy as np


def test_soft_ce_matches_reference_formula():
    import jax.numpy as jnp

    from fgvc_tpu.models.losses import soft_ce_loss

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((6, 5)).astype(np.float32)
    tgt = rng.standard_normal((6, 5)).astype(np.float32)

    # reference: sum(-log_softmax(pred) * softmax(target)) / bsz
    def np_softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    logp = np.log(np_softmax(pred))
    expect = np.sum(-logp * np_softmax(tgt)) / pred.shape[0]
    got = float(soft_ce_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # weighted variant: mean over weighted rows
    w = np.array([1, 0, 1, 1, 0, 0], np.float32)
    per_row = np.sum(-logp * np_softmax(tgt), axis=-1)
    expect_w = (per_row * w).sum() / w.sum()
    got_w = float(soft_ce_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w)))
    np.testing.assert_allclose(got_w, expect_w, rtol=1e-4)


def test_basic_losses():
    import jax.numpy as jnp

    from fgvc_tpu.models.losses import (
        bce_with_logits,
        charbonnier_loss,
        ce_loss,
        cosine_sim_loss,
        kl_loss,
        l1_loss,
        mse_loss,
        nce_loss,
        smooth_l1_loss,
    )

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)

    assert float(l1_loss(a, a)) == 0.0
    assert float(mse_loss(a, a)) == 0.0
    assert float(smooth_l1_loss(a, a)) == 0.0
    assert float(charbonnier_loss(a, a)) < 1e-5
    assert float(cosine_sim_loss(a, a)) < 1e-6
    assert float(kl_loss(a, a)) < 1e-6
    # CE of a one-hot-confident prediction is near zero
    logits = jnp.asarray(np.eye(4, 5) * 50.0, jnp.float32)
    labels = jnp.arange(4)
    assert float(ce_loss(logits, labels)) < 1e-4
    # NCE: matching query/positive pairs beat shuffled ones
    q = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    low = float(nce_loss(q, q))
    high = float(nce_loss(q, jnp.roll(q, 3, axis=0)))
    assert low < high
    # BCE at logit 0 is log(2)
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.zeros((3,)), jnp.ones((3,)))),
        np.log(2.0),
        rtol=1e-5,
    )


def test_concentration_and_smoothness():
    import jax.numpy as jnp

    from fgvc_tpu.models.losses import concentration_loss, smoothness_loss

    # delta attention has zero concentration loss; uniform has positive
    h = w = 4
    att_delta = jnp.zeros((1, h * w)).at[0, 5].set(1.0)
    att_uniform = jnp.full((1, h * w), 1.0 / (h * w))
    assert float(concentration_loss(att_delta, h, w)) < 1e-6
    assert float(concentration_loss(att_uniform, h, w)) > 0.5

    flat = jnp.zeros((4, 4, 2))
    assert float(smoothness_loss(flat)) == 0.0
