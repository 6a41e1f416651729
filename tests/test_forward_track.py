"""Forward-warp coordinate tracking follows a known feature shift."""

import numpy as np


def test_forward_tracking_follows_shift():
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(0)
    T, H, W = 4, 32, 32
    h = w = 16  # stride-2 features

    base = rng.standard_normal((h, w, 24)).astype(np.float32)
    # features shift by 1 coarse pixel (= 2 full-res px) per frame in +x
    feats = np.stack([np.roll(base, t, axis=1) for t in range(T)])

    cfg = TestConfig(
        precede_frames=2, topk=3, temperature=0.07, neighbor_range=8,
        input_size=(H, W), frame_bucket=4, point_bucket=4,
    )

    class FeatBackbone:
        def __call__(self, v, x):
            # ignore pixels; serve the synthetic bank frame by frame
            return jnp.asarray(feats[: x.shape[0]])

    tracker = Tracker(lambda v, x: jnp.zeros((x.shape[0], h, w, 24)), {}, cfg)
    # bypass feature extraction: drive the jitted core directly
    import jax

    fwd = jax.jit(
        tracker._forward_coords_impl, static_argnames=("full_hw",)
    )
    init = jnp.asarray([[16.0, 16.0], [10.0, 20.0]], jnp.float32)
    coords = np.array(fwd(jnp.asarray(feats), init, (H, W)))

    # Reference scheme: the (start -> t) coordinate map is sampled at the
    # RUNNING estimate, so for a uniform +1-coarse-px/frame shift the
    # recurrence is coord[t] = coord[t-1] + scale * (t - start).
    expect_x = coords[0, :, 0].copy()
    for t in range(1, T):
        start = max(t - cfg.precede_frames, 0)
        expect_x = expect_x + 2 * (t - start)
        np.testing.assert_allclose(coords[t, :, 0], expect_x, atol=1.0)
        np.testing.assert_allclose(coords[t, :, 1], coords[0, :, 1], atol=1.0)
