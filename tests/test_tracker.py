"""End-to-end propagation parity vs the numpy reference oracle."""

import numpy as np

from oracles import propagate_ref


def _tiny_tracker(feat_fn, cfg):
    from fgvc_tpu.models.tracker import Tracker

    return Tracker(feat_fn, {}, cfg)


def test_propagation_matches_reference_loop():
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import draw_gaussian_maps

    rng = np.random.default_rng(0)
    T, h, w, C, P = 7, 12, 12, 8, 3
    H, W = 24, 24  # full res, stride 2
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)

    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(H, W), frame_bucket=4, point_bucket=4,
    )

    pts = rng.uniform(2, 20, size=(P, 2)).astype(np.float32)
    init_maps = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=cfg.sigma, stride=2)
    )

    tracker = Tracker(lambda v, x: x, {}, cfg)  # identity backbone (unused)
    coords = np.asarray(
        tracker._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
    )[..., :2]

    # oracle: reference python loop + same upsample/decode
    bank = propagate_ref(
        feats, init_maps, (H, W),
        precede_frames=cfg.precede_frames, topk=cfg.topk,
        temperature=cfg.temperature, radius=cfg.neighbor_range // 2,
    )
    from fgvc_tpu.ops.grids import soft_argmax_topk

    for t in range(1, T):
        up = jax.image.resize(
            jnp.asarray(np.transpose(bank[t], (1, 2, 0))), (H, W, P), "bilinear"
        )
        ref_coords = np.asarray(
            soft_argmax_topk(jnp.transpose(up, (2, 0, 1)), topk=5)
        )
        np.testing.assert_allclose(
            coords[t], ref_coords, rtol=1e-3, atol=5e-3,
        )


def test_track_points_grouping_and_padding():
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(1)
    T, H, W = 6, 16, 16
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)

    # "backbone": stride-2 average pooling so features follow the frames
    def feat_fn(variables, imgs):
        x = imgs.reshape(imgs.shape[0], H // 2, 2, W // 2, 2, 3)
        x = x.mean(axis=(2, 4))
        return jnp.tile(x, (1, 1, 1, 4))  # (B, 8, 8, 12)

    cfg = TestConfig(
        precede_frames=2, topk=3, temperature=0.07, neighbor_range=8,
        step=32, input_size=(H, W), frame_bucket=4, point_bucket=2,
    )
    tracker = Tracker(feat_fn, {}, cfg)

    query_points = np.array(
        [[0, 4.0, 5.0], [0, 10.0, 3.0], [2, 8.0, 8.0]], dtype=np.float32
    )
    out = tracker.track_points(video, query_points)
    traj = out["trajectories"]
    assert traj.shape == (T, 3, 2)
    # pre-query frames stay zero (reference zero-fills them)
    assert np.all(traj[:2, 2] == 0)
    # the query-frame decode lands near the query point (gaussian argmax)
    np.testing.assert_allclose(traj[0, 0], [4.0, 5.0], atol=0.5)
    np.testing.assert_allclose(traj[0, 1], [10.0, 3.0], atol=0.5)
    np.testing.assert_allclose(traj[2, 2], [8.0, 8.0], atol=0.5)
    # all frames produce finite coordinates for group-0 points
    assert np.all(np.isfinite(traj[:, :2]))
    assert not np.any(out["visibilities"])


def test_propagation_pallas_matches_tiled():
    """The fused Pallas scan path (bank-direct, interpret mode on CPU) must
    match the XLA tiled scan bit-for-tolerance."""
    import dataclasses

    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import draw_gaussian_maps

    rng = np.random.default_rng(4)
    T, h, w, C, P = 6, 16, 16, 8, 3
    H, W = 32, 32
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)
    base = dict(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        input_size=(H, W), frame_bucket=4, point_bucket=4, tile=8,
    )
    pts = rng.uniform(4, 28, size=(P, 2)).astype(np.float32)
    init_maps = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=6.0, stride=2)
    )

    outs = {}
    for impl in ("tiled", "pallas"):
        cfg = TestConfig(**base, attention_impl=impl)
        tr = Tracker(lambda v, x: x, {}, cfg)
        outs[impl] = np.asarray(
            tr._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
        )[..., :2]
    np.testing.assert_allclose(
        outs["pallas"], outs["tiled"], rtol=1e-3, atol=5e-3
    )


def test_save_mem_vos_matches_bank_mode():
    """Streaming (save_mem) mask propagation must match the precomputed-bank
    path — same scan semantics, window-bounded memory."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(5)
    T, H, W = 6, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    ref_mask = np.zeros((H, W), np.uint8)
    ref_mask[8:20, 10:24] = 1
    ref_mask[22:30, 2:10] = 2

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(0), (H, W))
    base = dict(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        input_size=(H, W), frame_bucket=4, point_bucket=4, tile=8,
        attention_impl="tiled",
    )
    outs = {}
    for sm in (False, True):
        cfg = TestConfig(**base, save_mem=sm)
        tr = Tracker(
            lambda v, x: model.apply(v, x, train=False), variables, cfg
        )
        outs[sm] = tr.track_masks(video, ref_mask, (H, W), num_objects=2)
    np.testing.assert_array_equal(outs[True], outs[False])


def test_save_mem_honors_zoo_preprocess():
    """uint8 video + preprocess='imagenet' (zoo encoders): the streaming
    save_mem path must apply the SAME on-device normalization as the
    bank path — a regression test for the hardcoded-Lab streaming feat()."""
    import jax

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(7)
    T, H, W = 5, 32, 32
    video = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
    ref_mask = np.zeros((H, W), np.uint8)
    ref_mask[6:22, 8:26] = 1

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(2), (H, W))
    base = dict(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        input_size=(H, W), frame_bucket=4, point_bucket=4, tile=8,
        attention_impl="tiled", preprocess="imagenet",
    )
    outs = {}
    for sm in (False, True):
        cfg = TestConfig(**base, save_mem=sm)
        tr = Tracker(
            lambda v, x: model.apply(v, x, train=False), variables, cfg
        )
        outs[sm] = tr.track_masks(video, ref_mask, (H, W), num_objects=1)
    np.testing.assert_array_equal(outs[True], outs[False])


def test_coarse_decode_close_to_upsample_decode():
    """decode_impl='coarse' stays within a few full-res pixels of the exact
    upsample decode (random-feature maps are adversarially spiky; real
    gaussian-like propagation maps agree within ~1 px)."""
    import dataclasses

    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import draw_gaussian_maps

    rng = np.random.default_rng(6)
    T, h, w, C, P = 5, 16, 16, 8, 3
    H, W = 32, 32
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)
    base = dict(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        input_size=(H, W), frame_bucket=4, point_bucket=4, tile=8,
        attention_impl="tiled",
    )
    pts = rng.uniform(6, 26, size=(P, 2)).astype(np.float32)
    init_maps = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=6.0, stride=2)
    )
    outs = {}
    for mode in ("upsample", "coarse"):
        cfg = TestConfig(**base, decode_impl=mode)
        tr = Tracker(lambda v, x: x, {}, cfg)
        outs[mode] = np.asarray(
            tr._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
        )[..., :2]
    d = np.abs(outs["coarse"][1:] - outs["upsample"][1:])
    assert d.max() < 5.0  # within ~2 coarse pixels at stride 2
    assert np.median(d) < 2.0


def test_with_first_false_drops_frame0_keys():
    """with_first=False: the key window is only the preceding frames
    (reference key_start:frame_idx without the frame-0 concat,
    vanilla_tracker.py:353-362) — checked against the oracle loop."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import draw_gaussian_maps, soft_argmax_topk

    rng = np.random.default_rng(7)
    T, h, w, C, P = 7, 12, 12, 8, 3
    H, W = 24, 24
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)
    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(H, W), frame_bucket=4, point_bucket=4,
        attention_impl="tiled", tile=6, with_first=False,
    )
    pts = rng.uniform(2, 20, size=(P, 2)).astype(np.float32)
    init_maps = np.asarray(
        draw_gaussian_maps(jnp.asarray(pts), H, W, sigma=cfg.sigma, stride=2)
    )
    tracker = Tracker(lambda v, x: x, {}, cfg)
    coords = np.asarray(
        tracker._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
    )[..., :2]
    bank = propagate_ref(
        feats, init_maps, (H, W),
        precede_frames=cfg.precede_frames, topk=cfg.topk,
        temperature=cfg.temperature, radius=cfg.neighbor_range // 2,
        with_first=False,
    )
    for t in range(1, T):
        up = jax.image.resize(
            jnp.asarray(np.transpose(bank[t], (1, 2, 0))), (H, W, P),
            "bilinear",
        )
        ref_coords = np.asarray(
            soft_argmax_topk(jnp.transpose(up, (2, 0, 1)), topk=5)
        )
        np.testing.assert_allclose(coords[t], ref_coords, rtol=1e-3, atol=5e-3)

    # sanity: differs from the with_first=True trajectory somewhere
    cfg_wf = TestConfig(**{**cfg.__dict__, "with_first": True})
    tr_wf = Tracker(lambda v, x: x, {}, cfg_wf)
    coords_wf = np.asarray(
        tr_wf._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
    )[..., :2]
    assert np.abs(coords - coords_wf).max() > 1e-3


def test_hard_prop_matches_oracle():
    """hard_prop: bank entries are argmax→one-hot, emitted frames decode
    from the soft logits (vanilla_tracker.py:762-765)."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker
    from fgvc_tpu.ops.grids import soft_argmax_topk

    rng = np.random.default_rng(8)
    T, h, w, P = 6, 12, 12, 4
    H, W = 24, 24
    feats = rng.standard_normal((T, h, w, 8)).astype(np.float32)
    # one-hot style init maps (VOS-like): P channels, argmax-partitioned
    labels = rng.integers(0, P, size=(h, w))
    init_maps = np.eye(P, dtype=np.float32)[labels].transpose(2, 0, 1)

    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(H, W), frame_bucket=4, point_bucket=4,
        attention_impl="tiled", tile=6, hard_prop=True,
    )
    tracker = Tracker(lambda v, x: x, {}, cfg)
    coords = np.asarray(
        tracker._propagate(jnp.asarray(feats), jnp.asarray(init_maps), (H, W))
    )[..., :2]
    bank = propagate_ref(
        feats, init_maps, (H, W),
        precede_frames=cfg.precede_frames, topk=cfg.topk,
        temperature=cfg.temperature, radius=cfg.neighbor_range // 2,
        hard_prop=True,
    )
    for t in range(1, T):
        up = jax.image.resize(
            jnp.asarray(np.transpose(bank[t], (1, 2, 0))), (H, W, P),
            "bilinear",
        )
        ref_coords = np.asarray(
            soft_argmax_topk(jnp.transpose(up, (2, 0, 1)), topk=5)
        )
        np.testing.assert_allclose(coords[t], ref_coords, rtol=1e-3, atol=5e-3)
