"""Bank-parallel (memory-parallel) propagation: frame-sharded banks.

The capacity-scaling axis: the feature bank's FRAMES shard over a 'bank'
mesh axis so banks larger than one chip's HBM fit.  The distributed exact
top-k (local top-k lists -> all_gather merge -> psum'd partial softmax
mix) must reproduce the single-device kernel up to partial-sum
reassociation.  Verified at the op level (shard_map call vs the unsharded
tiled bank mode, including cross-shard affinity ties) and end-to-end
(Tracker with bank_mesh vs without, points + VOS protocols).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as PSpec


def _bank_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("bank",))


# ------------------------------------------------------------------ #
# op level: sharded call matches the unsharded tiled bank mode
# ------------------------------------------------------------------ #
def _op_case(n, feats, vals, idx, kv, qt, radius=4.0, tile=8, topk=3):
    from fgvc_tpu.ops.attention import l2_normalize
    from fgvc_tpu.ops.windowed_attention import (
        masked_topk_attention_tiled,
        masked_topk_attention_tiled_bank_sharded,
        pad_key_bank,
    )

    mesh = _bank_mesh(n)
    T = feats.shape[0]
    bank = pad_key_bank(feats, radius, tile)
    query = l2_normalize(feats[qt])

    full = masked_topk_attention_tiled(
        query, bank, vals, radius=radius, temperature=0.07, topk=topk,
        normalize=False, tile=tile, key_valid=kv, frame_idx=idx,
    )

    Tl = -(-T // n)
    bank_p = jnp.pad(bank, ((0, Tl * n - T), (0, 0), (0, 0), (0, 0)))

    def run(bank_shard, query, vals):
        lo = jax.lax.axis_index("bank") * Tl
        return masked_topk_attention_tiled_bank_sharded(
            query, bank_shard, vals, frame_idx=idx, shard_lo=lo,
            radius=radius, temperature=0.07, topk=topk, tile=tile,
            key_valid=kv,
        )

    sharded = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PSpec("bank"), PSpec(), PSpec()),
            out_specs=PSpec(),
            check_vma=False,
        )
    )
    out = sharded(bank_p, query, vals)
    np.testing.assert_allclose(np.array(out), np.array(full), atol=1e-5)


def test_bank_sharded_op_matches_full_2dev():
    rng = np.random.default_rng(0)
    T, h, w, C, P = 5, 24, 16, 32, 6
    feats = jnp.asarray(rng.standard_normal((T, h, w, C)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((4, h, w, P)), jnp.float32)
    idx = jnp.asarray([0, 2, 3, 4])
    kv = jnp.asarray([True, False, True, True])
    _op_case(2, feats, vals, idx, kv, qt=4)


def test_bank_sharded_op_matches_full_4dev_uneven():
    """T=5 over 4 shards: Tl=2, 3 padded frames; window slots land on
    three different shards; square mask."""
    from fgvc_tpu.ops.attention import l2_normalize
    from fgvc_tpu.ops.windowed_attention import (
        masked_topk_attention_tiled,
        masked_topk_attention_tiled_bank_sharded,
        pad_key_bank,
    )

    mesh = _bank_mesh(4)
    rng = np.random.default_rng(1)
    T, h, w, C, P = 5, 16, 16, 16, 4
    radius, tile, topk = 4.0, 8, 3
    feats = jnp.asarray(rng.standard_normal((T, h, w, C)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((3, h, w, P)), jnp.float32)
    idx = jnp.asarray([0, 3, 4])
    kv = jnp.asarray([True, True, True])

    bank = pad_key_bank(feats, radius, tile)
    query = l2_normalize(feats[2])
    full = masked_topk_attention_tiled(
        query, bank, vals, radius=radius, temperature=0.07, topk=topk,
        normalize=False, tile=tile, key_valid=kv, frame_idx=idx,
        mask_shape="square",
    )
    Tl = -(-T // 4)
    bank_p = jnp.pad(bank, ((0, Tl * 4 - T), (0, 0), (0, 0), (0, 0)))

    def run(bank_shard, query, vals):
        lo = jax.lax.axis_index("bank") * Tl
        return masked_topk_attention_tiled_bank_sharded(
            query, bank_shard, vals, frame_idx=idx, shard_lo=lo,
            radius=radius, temperature=0.07, topk=topk, tile=tile,
            key_valid=kv, mask_shape="square",
        )

    out = jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(PSpec("bank"), PSpec(), PSpec()),
            out_specs=PSpec(), check_vma=False,
        )
    )(bank_p, query, vals)
    np.testing.assert_allclose(np.array(out), np.array(full), atol=1e-5)


def test_bank_sharded_op_cross_shard_ties():
    """Duplicated frames on DIFFERENT shards (the duplicated-first-frame
    scenario of early propagation steps): identical keys AND values tie at
    the top-k threshold across devices — the psum'd global tie count must
    reproduce the single-device fractional split."""
    rng = np.random.default_rng(2)
    T, h, w, C, P = 4, 16, 16, 16, 4
    f = rng.standard_normal((T, h, w, C)).astype(np.float32)
    v = rng.standard_normal((4, h, w, P)).astype(np.float32)
    f[3] = f[1]  # shard0 holds frame 1, shard1 holds frame 3 (n=2, Tl=2)
    v[3] = v[1]
    idx = jnp.asarray([0, 1, 2, 3])
    kv = jnp.asarray([True, True, True, True])
    _op_case(2, jnp.asarray(f), jnp.asarray(v), idx, kv, qt=2, topk=4)


# ------------------------------------------------------------------ #
# end-to-end: Tracker with bank_mesh == Tracker without
# ------------------------------------------------------------------ #
def _stride2_backbone(H, W, C_rep):
    def feat_fn(variables, imgs):
        x = imgs.reshape(imgs.shape[0], H // 2, 2, W // 2, 2, 3)
        x = x.mean(axis=(2, 4))
        return jnp.tile(x, (1, 1, 1, C_rep))

    return feat_fn


def _bp_cfg(**kw):
    from fgvc_tpu.config import TestConfig

    base = dict(
        precede_frames=2, topk=3, temperature=0.07, neighbor_range=8,
        step=64, input_size=(32, 32), frame_bucket=4, point_bucket=4,
        attention_impl="tiled", tile=8,
    )
    base.update(kw)
    return TestConfig(**base)


def test_bank_track_points_matches_single():
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(2)
    rng = np.random.default_rng(3)
    T, H, W = 6, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    qpts = np.array(
        [[0, 5.0, 7.0], [0, 20.0, 11.0], [2, 9.0, 25.0]], np.float32
    )

    cfg = _bp_cfg()
    feat_fn = _stride2_backbone(H, W, 4)
    single = Tracker(feat_fn, {}, cfg).track_points(video, qpts)
    bp = Tracker(feat_fn, {}, cfg, bank_mesh=mesh).track_points(video, qpts)
    np.testing.assert_allclose(
        bp["trajectories"], single["trajectories"], atol=1e-4
    )


def test_bank_track_points_4dev_uneven_matches_single():
    """4-way shard of a bank whose padded length isn't a multiple of 4,
    with a mid-video query group (t0 > 0 slices a shifted bank window)."""
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(4)
    rng = np.random.default_rng(4)
    T, H, W = 7, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    qpts = np.array([[0, 5.0, 7.0], [3, 20.0, 11.0]], np.float32)

    cfg = _bp_cfg()
    feat_fn = _stride2_backbone(H, W, 4)
    single = Tracker(feat_fn, {}, cfg).track_points(video, qpts)
    bp = Tracker(feat_fn, {}, cfg, bank_mesh=mesh).track_points(video, qpts)
    np.testing.assert_allclose(
        bp["trajectories"], single["trajectories"], atol=1e-4
    )


def test_bank_hard_prop_close_to_single():
    """hard_prop re-encodes bank entries to one-hots, so propagated maps
    carry many EXACTLY-equal values; the sharded kernel's fractional
    tie-split vs the unsharded gather path (the documented cross-kernel
    divergence, see test_tie_semantics_at_threshold) plus last-ulp
    reassociation can flip tied top-5 decode members.  With well-peaked
    maps (every point valid) trajectories agree to within a pixel."""
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(2)
    rng = np.random.default_rng(7)
    T, H, W = 6, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    qpts = np.array(
        [[0, 5.0, 7.0], [0, 20.0, 11.0], [0, 9.0, 25.0], [0, 26.0, 22.0]],
        np.float32,
    )

    cfg = _bp_cfg(hard_prop=True)
    feat_fn = _stride2_backbone(H, W, 4)
    single = Tracker(feat_fn, {}, cfg).track_points(video, qpts)
    bp = Tracker(feat_fn, {}, cfg, bank_mesh=mesh).track_points(video, qpts)
    np.testing.assert_allclose(
        bp["trajectories"], single["trajectories"], atol=1.5
    )


def test_bank_track_masks_matches_single():
    """VOS protocol (square window, one-hot labels) under the bank mesh.

    The sharded kernel matches unsharded only to partial-sum
    reassociation (~1e-7 on logits), and one-hot label maps carry many
    EXACTLY-equal values, so argmax label ties can flip on isolated
    pixels; ≥99.5% pixel agreement is the tolerated tie/ulp budget
    (exact equality would be flaky by construction — same rationale as
    test_bank_hard_prop_close_to_single)."""
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(2)
    rng = np.random.default_rng(5)
    T, H, W = 5, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    ref = (rng.uniform(0, 1, size=(32, 32)) * 3).astype(np.int32)

    cfg = _bp_cfg()
    feat_fn = _stride2_backbone(H, W, 4)
    single = Tracker(feat_fn, {}, cfg).track_masks(video, ref, (32, 32), 2)
    bp = Tracker(feat_fn, {}, cfg, bank_mesh=mesh).track_masks(
        video, ref, (32, 32), 2
    )
    assert (np.asarray(bp) == np.asarray(single)).mean() > 0.995


def test_bank_with_first_false_matches_single():
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(2)
    rng = np.random.default_rng(6)
    T, H, W = 6, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    qpts = np.array([[0, 5.0, 7.0], [1, 20.0, 11.0]], np.float32)

    cfg = _bp_cfg(with_first=False)
    feat_fn = _stride2_backbone(H, W, 4)
    single = Tracker(feat_fn, {}, cfg).track_points(video, qpts)
    bp = Tracker(feat_fn, {}, cfg, bank_mesh=mesh).track_points(video, qpts)
    np.testing.assert_allclose(
        bp["trajectories"], single["trajectories"], atol=1e-4
    )


# ------------------------------------------------------------------ #
# harness: build_tracker(bank_mesh) scores like the single-device loop
# ------------------------------------------------------------------ #
def test_bank_eval_harness_matches_single(tmp_path):
    import dataclasses
    import pickle

    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    mesh = _bank_mesh(2)
    rng = np.random.default_rng(8)
    rec = {
        "video": rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8),
        "points": rng.uniform(0.2, 0.8, (3, 4, 2)).astype(np.float32),
        "occluded": np.zeros((3, 4), bool),
    }
    with open(tmp_path / "vid1.pkl", "wb") as f:
        pickle.dump(rec, f)

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"],
        frame_bucket=4, point_bucket=16, neighbor_range=6, tile=8,
        input_size=(24, 24), attention_impl="tiled",
    )
    ds = TapVidDataset(str(tmp_path), input_size=(24, 24))
    single = eval_tapvid(build_tracker(cfg), ds)
    banked = eval_tapvid(build_tracker(cfg, bank_mesh=mesh), ds)
    assert banked["average_pts_within_thresh"] == pytest.approx(
        single["average_pts_within_thresh"], abs=1e-4
    )


# ------------------------------------------------------------------ #
# capacity: the bank is BORN frame-sharded (never replicated)
# ------------------------------------------------------------------ #
def test_bank_features_born_sharded():
    """_features_padded under a bank mesh must return a frame-sharded
    array whose per-device shards are 1/n of the bank — extracting
    replicated and resharding would put a full bank on the default
    device first, the exact OOM bank_mesh exists to avoid."""
    from jax.sharding import NamedSharding

    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(4)
    rng = np.random.default_rng(9)
    T, H, W = 10, 32, 32
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)

    tr = Tracker(_stride2_backbone(H, W, 4), {}, _bp_cfg(), bank_mesh=mesh)
    feats = tr._features_padded(video)

    assert isinstance(feats.sharding, NamedSharding)
    assert feats.sharding.spec == PSpec("bank")
    t_pad = feats.shape[0]
    assert t_pad % 4 == 0
    shards = feats.addressable_shards
    assert len({s.device for s in shards}) == 4
    for s in shards:
        assert s.data.shape[0] == t_pad // 4
    # values must still be the plain per-frame features
    ref = Tracker(_stride2_backbone(H, W, 4), {}, _bp_cfg())._features_padded(
        video
    )
    np.testing.assert_allclose(
        np.asarray(feats)[:T], np.asarray(ref)[:T], atol=1e-6
    )


def test_run_task_bank_devices_requires_tiled_early(tmp_path):
    """--bank-devices with the task-default pallas impl must fail fast
    with a message naming --attention-impl tiled (not later from the
    Tracker constructor)."""
    from fgvc_tpu.apis.test import run_task

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    with pytest.raises(ValueError, match="--attention-impl tiled"):
        run_task(
            "davis", data_root=str(tmp_path), bank_devices=2,
        )


# ------------------------------------------------------------------ #
# constructor validation
# ------------------------------------------------------------------ #
def test_bank_mesh_validation():
    from fgvc_tpu.models.tracker import Tracker

    mesh = _bank_mesh(2)
    feat_fn = _stride2_backbone(32, 32, 4)

    with pytest.raises(ValueError, match="'tiled'"):
        Tracker(feat_fn, {}, _bp_cfg(attention_impl="pallas"), bank_mesh=mesh)
    with pytest.raises(ValueError, match="topk"):
        Tracker(feat_fn, {}, _bp_cfg(topk=None), bank_mesh=mesh)
    with pytest.raises(ValueError, match="save_mem"):
        Tracker(feat_fn, {}, _bp_cfg(save_mem=True), bank_mesh=mesh)
    with pytest.raises(ValueError, match="axis named 'bank'"):
        wrong = Mesh(np.array(jax.devices()[:2]), ("space",))
        Tracker(feat_fn, {}, _bp_cfg(), bank_mesh=wrong)
    with pytest.raises(ValueError, match="at most one"):
        sp = Mesh(np.array(jax.devices()[:2]), ("space",))
        Tracker(feat_fn, {}, _bp_cfg(), spatial_mesh=sp, bank_mesh=mesh)
