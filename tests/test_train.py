"""Mixed training step: loss composition, gradients, SPMD consistency."""

import numpy as np
import pytest


def _tiny_setup(batch=2, crop=16, radius=2):
    import jax

    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.train import MixedTrainer

    cfg = TrainConfig(radius=radius, crop_size=crop, batch_size=batch)
    trainer = MixedTrainer(cfg)
    state, teacher_vars, tx = trainer.init(jax.random.PRNGKey(0), 10)
    rng = np.random.default_rng(0)
    batch_data = {
        "imgs": rng.standard_normal((batch, 2, crop, crop, 3)).astype(np.float32),
        "imgs_sup": rng.standard_normal((batch, 2, crop, crop, 3)).astype(
            np.float32
        ),
        "flow": (rng.standard_normal((batch, crop, crop, 2))).astype(np.float32),
        "flow_back": (rng.standard_normal((batch, crop, crop, 2))).astype(
            np.float32
        ),
    }
    return cfg, trainer, state, teacher_vars, tx, batch_data


def test_loss_components_and_gradients():
    import jax

    cfg, trainer, state, teacher_vars, tx, batch = _tiny_setup()
    (total, (losses, new_stats)), grads = jax.value_and_grad(
        trainer.loss_fn, has_aux=True
    )(state.params, state.batch_stats, teacher_vars, batch, jax.random.PRNGKey(1))

    assert np.isfinite(float(total))
    for k in ("l1_loss", "sup_loss", "corr_da_loss"):
        assert k in losses and np.isfinite(float(losses[k]))

    # gradients reach the student backbone AND both discriminators
    def grad_norm(tree):
        return sum(
            float(np.abs(np.asarray(leaf)).sum())
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    assert grad_norm(grads["backbone"]) > 0
    assert grad_norm(grads["corr_disc"]) > 0
    # BN statistics updated by the two student passes
    leaves_old = jax.tree_util.tree_leaves(state.batch_stats)
    leaves_new = jax.tree_util.tree_leaves(new_stats)
    changed = any(
        not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new)
    )
    assert changed


def test_train_step_reduces_loss():
    import jax

    cfg, trainer, state, teacher_vars, tx, batch = _tiny_setup()
    step_fn = trainer.make_train_step(tx)
    rng = jax.random.PRNGKey(2)
    first = None
    for i in range(8):
        state, losses = step_fn(state, teacher_vars, batch, rng)  # fixed rng
        if first is None:
            # the adversarial term is a minimax game (gradient reversal) and
            # need not decrease — check the cooperative objectives only
            first = float(losses["l1_loss"]) + float(losses["sup_loss"])
    final = float(losses["l1_loss"]) + float(losses["sup_loss"])
    assert final < first


def test_spmd_matches_single_device():
    """DP-sharded step must match the unsharded step (SyncBN + grad psum)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from fgvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg, trainer, state, teacher_vars, tx, batch = _tiny_setup(batch=4)
    step_fn = trainer.make_train_step(tx)
    rng = jax.random.PRNGKey(3)

    # the step donates its input state — keep a host copy for the 2nd run
    state_copy = jax.tree_util.tree_map(np.array, state)
    s1, l1 = step_fn(state, teacher_vars, batch, rng)
    l1 = {k: float(v) for k, v in l1.items()}
    state = state_copy

    mesh = make_mesh(jax.devices()[:4])
    with mesh:
        sharded = shard_batch(batch, mesh)
        state_r = replicate(state, mesh)
        teacher_r = replicate(teacher_vars, mesh)
        s2, l2 = step_fn(state_r, teacher_r, sharded, rng)
        l2 = {k: float(v) for k, v in l2.items()}

    for k in l1:
        np.testing.assert_allclose(l1[k], l2[k], rtol=2e-4, atol=2e-4)


def test_per_module_optimizers():
    """Dict-of-optimizers parity: discriminators can run at their own LR."""
    import jax
    import jax.numpy as jnp
    import optax

    from fgvc_tpu.core.train import make_multi_optimizer

    cfg, trainer, state, teacher_vars, _, batch = _tiny_setup()
    tx = make_multi_optimizer(
        cfg, 10, {"corr_disc": optax.sgd(0.0)}  # freeze the corr discriminator
    )
    opt_state = tx.init(state.params)
    (_, _), grads = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
        state.params, state.batch_stats, teacher_vars, batch,
        jax.random.PRNGKey(0),
    )
    updates, _ = tx.update(grads, opt_state, state.params)
    disc_delta = sum(
        float(jnp.abs(leaf).sum())
        for leaf in jax.tree_util.tree_leaves(updates["corr_disc"])
    )
    bb_delta = sum(
        float(jnp.abs(leaf).sum())
        for leaf in jax.tree_util.tree_leaves(updates["backbone"])
    )
    assert disc_delta == 0.0  # frozen by the zero-lr override
    assert bb_delta > 0.0


def test_grad_clip_and_loss_scale_equivalence():
    """loss_scale must be a numerical no-op (scale then unscale); grad_clip
    bounds the global update norm (OptimizerHook_Custom parity)."""
    import dataclasses

    import jax

    from fgvc_tpu.core.train import MixedTrainer, make_optimizer

    cfg, trainer, state0, teacher_vars, tx, batch = _tiny_setup()
    rng = jax.random.PRNGKey(2)
    init_kernel = np.asarray(state0.params["backbone"]["conv1"]["kernel"]).copy()

    # the train step donates its state: re-init (same seed) per run
    def fresh():
        s, _, _ = trainer.init(jax.random.PRNGKey(0), 10)
        return s

    s1, l1 = trainer.make_train_step(tx)(state0, teacher_vars, batch, rng)

    cfg_scaled = dataclasses.replace(cfg, loss_scale=512.0)
    trainer2 = MixedTrainer(cfg_scaled)
    s2, l2 = trainer2.make_train_step(tx)(fresh(), teacher_vars, batch, rng)
    # reported losses stay UNSCALED; only the backward pass is scaled
    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-5)
    a = np.asarray(s1.params["backbone"]["conv1"]["kernel"])
    b = np.asarray(s2.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)

    cfg_clip = dataclasses.replace(cfg, grad_clip=1e-8)
    trainer3 = MixedTrainer(cfg_clip)
    tx3 = make_optimizer(cfg_clip, 10)
    state3 = fresh().replace(opt_state=tx3.init(fresh().params))
    s3, _ = trainer3.make_train_step(tx3)(state3, teacher_vars, batch, rng)
    # with a vanishing clip threshold the clipped gradient is ~0, so the
    # Adam update is ~0: params must move far less than the unclipped step
    d_clip = np.abs(
        np.asarray(s3.params["backbone"]["conv1"]["kernel"]) - init_kernel
    ).sum()
    d_base = np.abs(a - init_kernel).sum()
    assert np.isfinite(d_clip) and d_clip < 0.1 * d_base


def test_best_checkpoint_tracking(tmp_path):
    """train_model saves/points at the best val checkpoint."""
    from fgvc_tpu.apis.train import train_model
    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.checkpoint import best_checkpoint

    cfg = TrainConfig(radius=2, crop_size=16, batch_size=8)
    rng = np.random.default_rng(3)

    def batches():
        while True:
            yield {
                "imgs": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
                "imgs_sup": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
                "flow": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
                "flow_back": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
            }

    vals = iter([{"average_pts_within_thresh": 10.0},
                 {"average_pts_within_thresh": 30.0},
                 {"average_pts_within_thresh": 20.0}])
    seen_steps = []

    def val_fn(state):
        seen_steps.append(int(np.asarray(state.step)))
        return next(vals)

    train_model(
        cfg,
        batches(),
        str(tmp_path),
        steps_per_epoch=3,
        max_steps=3,
        ckpt_interval=100,
        log_interval=100,
        resume=False,
        val_fn=val_fn,
        val_interval=1,
    )
    assert seen_steps == [1, 2, 3]
    best = best_checkpoint(str(tmp_path))
    assert best is not None and best.endswith("step_2")
    import json as _json

    meta = _json.load(open(tmp_path / "best.json"))
    assert meta == {
        "step": 2,
        "metric": "average_pts_within_thresh",
        "value": 30.0,
    }


def test_remat_matches_plain_step():
    """remat=True must be numerically identical (recompute, not approximate)."""
    import dataclasses

    import jax

    from fgvc_tpu.core.train import MixedTrainer

    cfg, trainer, state0, teacher_vars, tx, batch = _tiny_setup()
    rng = jax.random.PRNGKey(7)
    s1, l1 = trainer.make_train_step(tx)(state0, teacher_vars, batch, rng)

    trainer_r = MixedTrainer(dataclasses.replace(cfg, remat=True))
    state_r, _, _ = trainer_r.init(jax.random.PRNGKey(0), 10)
    s2, l2 = trainer_r.make_train_step(tx)(state_r, teacher_vars, batch, rng)
    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["backbone"]["conv1"]["kernel"]),
        np.asarray(s2.params["backbone"]["conv1"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )


def test_batch_shuffle_roundtrip_on_mesh():
    """MoCo shuffle-BN equivalent: permutation + inverse under a data mesh."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.parallel.mesh import (
        batch_shuffle,
        batch_unshuffle,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh(jax.devices()[:4])
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    with mesh:
        xs = shard_batch({"x": x}, mesh)["x"]

        @jax.jit
        def roundtrip(x, rng):
            s, inv = batch_shuffle(x, rng)
            return s, batch_unshuffle(s, inv)

        shuffled, restored = roundtrip(xs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(restored), x)
    assert not np.array_equal(np.asarray(shuffled), x)


def test_check_numerics_flags_nonfinite_steps():
    """The detect_anomaly equivalent (reference tools/train.py:69):
    check_numerics adds an all-gradients-finite flag to the step losses —
    true on a clean batch, false when the batch poisons the gradients."""
    import dataclasses

    import jax

    from fgvc_tpu.core.train import MixedTrainer

    cfg, _, state, teacher_vars, tx, batch_data = _tiny_setup()
    trainer = MixedTrainer(dataclasses.replace(cfg, check_numerics=True))
    step_fn = trainer.make_train_step(tx)
    rng = jax.random.PRNGKey(1)

    _, losses = step_fn(state, teacher_vars, batch_data, rng)
    assert bool(losses["all_finite"])

    poisoned = dict(batch_data)
    poisoned["imgs_sup"] = batch_data["imgs_sup"].copy()
    poisoned["imgs_sup"][0, 0, 0, 0, 0] = np.nan
    # state was donated by the first call — rebuild
    state2, teacher_vars2, tx2 = trainer.init(jax.random.PRNGKey(0), 10)
    _, losses = trainer.make_train_step(tx2)(
        state2, teacher_vars2, poisoned, rng
    )
    assert not bool(losses["all_finite"])


def test_check_numerics_raises_in_train_loop(tmp_path):
    """train_model raises FloatingPointError on the first poisoned batch."""
    import dataclasses

    import pytest

    from fgvc_tpu.apis.train import train_model

    cfg, _, _, _, _, batch_data = _tiny_setup(batch=8)
    cfg = dataclasses.replace(cfg, check_numerics=True)
    poisoned = dict(batch_data)
    poisoned["flow"] = batch_data["flow"].copy()
    poisoned["flow"][:] = np.inf

    with pytest.raises(FloatingPointError, match="step 2"):
        train_model(
            cfg,
            [batch_data, poisoned],
            str(tmp_path),
            steps_per_epoch=2,
            max_steps=2,
            log_interval=100,
            resume=False,
        )


def test_teacher_init_from_checkpoint_dir(tmp_path):
    """teacher_init can point at an fgvc checkpoint dir: the saved STUDENT
    backbone becomes the new run's frozen teacher (the reference's staged
    recipe — the mixed objective distills an earlier self-supervised
    encoder)."""
    import jax

    from fgvc_tpu.apis.train import train_model
    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.checkpoint import save_checkpoint
    from fgvc_tpu.core.train import MixedTrainer

    cfg = TrainConfig(radius=2, crop_size=16, batch_size=8)
    trainer = MixedTrainer(cfg)
    state, teacher_vars, _ = trainer.init(jax.random.PRNGKey(7), 10)
    prev_dir = tmp_path / "prev"
    ckpt = save_checkpoint(str(prev_dir), state, teacher_vars, 5)

    rng = np.random.default_rng(4)
    batch = {
        "imgs": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
        "imgs_sup": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
        "flow": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
        "flow_back": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
    }
    _, new_teacher = train_model(
        cfg,
        [batch],
        str(tmp_path / "work"),
        steps_per_epoch=1,
        max_steps=1,
        log_interval=100,
        resume=False,
        teacher_init=ckpt,
    )
    # the new teacher == the saved run's student backbone params
    want = jax.device_get(state.params)["backbone"]
    got = jax.device_get(new_teacher)["params"]
    flat_w = jax.tree_util.tree_leaves(want)
    flat_g = jax.tree_util.tree_leaves(got)
    assert len(flat_w) == len(flat_g)
    for a, b in zip(flat_w, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a work_dir 'best'/'latest' POINTER FILE must resolve the same way
    # --checkpoint pointers do (it used to be fed to torch.load)
    ptr = prev_dir / "best"
    ptr.write_text("step_5")
    _, teacher_via_ptr = train_model(
        cfg,
        [batch],
        str(tmp_path / "work2"),
        steps_per_epoch=1,
        max_steps=1,
        log_interval=100,
        resume=False,
        teacher_init=str(ptr),
    )
    for a, b in zip(
        flat_w, jax.tree_util.tree_leaves(
            jax.device_get(teacher_via_ptr)["params"]
        )
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """Graceful preemption: SIGTERM mid-run -> checkpoint at the step
    boundary + clean return; a rerun resumes from the preempt step and
    finishes.  The reference has no preemption story (SURVEY.md §5.3)."""
    import signal

    from fgvc_tpu.apis.train import train_model
    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.checkpoint import latest_checkpoint

    cfg = TrainConfig(radius=2, crop_size=16, batch_size=8)
    rng = np.random.default_rng(7)
    batch = {
        "imgs": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
        "imgs_sup": rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
        "flow": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
        "flow_back": rng.standard_normal((8, 16, 16, 2)).astype(np.float32),
    }

    def batches():
        n = 0
        while True:
            n += 1
            if n == 4:
                # runs on the prefetch worker thread; Python still delivers
                # the handler on the main thread — like an external SIGTERM
                signal.raise_signal(signal.SIGTERM)
            yield batch

    prev = signal.getsignal(signal.SIGTERM)
    train_model(
        cfg,
        batches(),
        str(tmp_path),
        steps_per_epoch=10,
        max_steps=100,
        ckpt_interval=1000,
        log_interval=1000,
        resume=False,
    )
    # handler restored, stopped early, checkpoint written at the stop step
    assert signal.getsignal(signal.SIGTERM) is prev
    path = latest_checkpoint(str(tmp_path))
    assert path is not None
    stop_step = int(path.rsplit("step_", 1)[1])
    assert 1 <= stop_step < 100

    # resume: exactly 2 more batches reach stop_step + 2 == max_steps,
    # which only happens if the run really starts from the checkpoint
    train_model(
        cfg,
        [batch, batch],
        str(tmp_path),
        steps_per_epoch=10,
        max_steps=stop_step + 2,
        ckpt_interval=1000,
        log_interval=1000,
        resume=True,
    )
    final = latest_checkpoint(str(tmp_path))
    assert final is not None and final.endswith(f"step_{stop_step + 2}")


def test_resume_is_step_exact(tmp_path):
    """Preempt→resume reproduces the uninterrupted run exactly: optimizer
    moments ride the checkpoint, the per-step RNG key is
    fold_in(rng, global_step) — NOT sequential splits from the loop head —
    and the caller replays the post-checkpoint batches (cli/train.py does
    it via make_batches(skip=)).  tools/rehearse_train.py proves the same
    property through the full launch.py → tools/train.py stack on a
    2-process mesh; this pins it at unit scale.  The reference has no
    elastic-resume story (mmcv runner resume restores state but replays
    the epoch's loader from scratch)."""
    import jax

    from fgvc_tpu.apis.train import train_model
    from fgvc_tpu.config import TrainConfig

    cfg = TrainConfig(radius=2, crop_size=16, batch_size=8)

    def mk(i):
        r = np.random.default_rng(100 + i)
        return {
            "imgs": r.standard_normal((8, 2, 16, 16, 3)).astype(np.float32),
            "imgs_sup": r.standard_normal((8, 2, 16, 16, 3)).astype(
                np.float32
            ),
            "flow": r.standard_normal((8, 16, 16, 2)).astype(np.float32),
            "flow_back": r.standard_normal((8, 16, 16, 2)).astype(np.float32),
        }

    seq = [mk(i) for i in range(4)]
    kw = dict(steps_per_epoch=10, log_interval=1000)
    state_a, _ = train_model(
        cfg, list(seq), str(tmp_path / "a"), max_steps=4,
        ckpt_interval=1000, resume=False, **kw
    )
    # interrupted twin: checkpoint at step 2, then resume on the suffix
    train_model(
        cfg, seq[:2], str(tmp_path / "b"), max_steps=2,
        ckpt_interval=2, resume=False, **kw
    )
    state_b, _ = train_model(
        cfg, seq[2:], str(tmp_path / "b"), max_steps=4,
        ckpt_interval=1000, resume=True, **kw
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7
        )


def test_fused_encoder_mode():
    """fused_encoder=True batches the rec+sup pairs through one backbone
    call.  Same objective; BN normalizes over the union batch, so values
    differ slightly from the sequential default — at a fresh init both
    modes must produce all three branches, finite and close."""
    import dataclasses

    import jax

    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.train import MixedTrainer

    rng = np.random.default_rng(11)
    batch = {
        "imgs": rng.standard_normal((4, 2, 16, 16, 3)).astype(np.float32),
        "imgs_sup": rng.standard_normal((4, 2, 16, 16, 3)).astype(np.float32),
        "flow": rng.standard_normal((4, 16, 16, 2)).astype(np.float32),
        "flow_back": rng.standard_normal((4, 16, 16, 2)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    results = {}
    for fused in (False, True):
        cfg = TrainConfig(
            radius=2, crop_size=16, batch_size=4, fused_encoder=fused
        )
        trainer = MixedTrainer(cfg)
        state, teacher_vars, tx = trainer.init(key, 10)
        step_fn = trainer.make_train_step(tx)
        new_state, losses = step_fn(
            state, teacher_vars, batch, jax.random.PRNGKey(1)
        )
        losses = {k: float(v) for k, v in losses.items()}
        assert all(np.isfinite(v) for v in losses.values()), losses
        assert losses["l1_loss"] > 0 and losses["sup_loss"] > 0
        assert int(new_state.step) == 1
        results[fused] = losses
    # the union-batch BN shifts values, but not the loss scale
    for k in ("l1_loss", "sup_loss", "corr_da_loss"):
        a, b = results[False][k], results[True][k]
        assert abs(a - b) / max(abs(a), 1e-6) < 0.5, (k, a, b)


def test_bfloat16_compute_dtype_matches_f32_closely():
    """compute_dtype='bfloat16' (mixed precision: bf16 conv stacks, f32
    params/optimizer/BN stats/losses) must keep master state f32 and land
    every loss within ~1% of the full-f32 step at a fresh init."""
    import dataclasses

    import jax

    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.core.train import MixedTrainer

    rng = np.random.default_rng(12)
    batch = {
        "imgs": rng.standard_normal((2, 2, 16, 16, 3)).astype(np.float32),
        "imgs_sup": rng.standard_normal((2, 2, 16, 16, 3)).astype(np.float32),
        "flow": rng.standard_normal((2, 16, 16, 2)).astype(np.float32),
        "flow_back": rng.standard_normal((2, 16, 16, 2)).astype(np.float32),
    }
    results = {}
    for cd in ("float32", "bfloat16"):
        cfg = TrainConfig(
            radius=2, crop_size=16, batch_size=2, compute_dtype=cd
        )
        trainer = MixedTrainer(cfg)
        state, teacher_vars, tx = trainer.init(jax.random.PRNGKey(0), 10)
        # master weights and BN statistics stay float32 regardless
        for leaf in jax.tree_util.tree_leaves(
            (state.params, state.batch_stats)
        ):
            assert leaf.dtype == np.float32, (cd, leaf.dtype)
        step_fn = trainer.make_train_step(tx)
        new_state, losses = step_fn(
            state, teacher_vars, batch, jax.random.PRNGKey(1)
        )
        losses = {k: float(v) for k, v in losses.items()}
        assert all(np.isfinite(v) for v in losses.values()), losses
        # updated state stays f32 too (no dtype drift through the step)
        for leaf in jax.tree_util.tree_leaves(
            (new_state.params, new_state.batch_stats)
        ):
            assert leaf.dtype == np.float32, (cd, leaf.dtype)
        results[cd] = losses
    for k in ("l1_loss", "sup_loss", "corr_da_loss", "loss"):
        a, b = results["float32"][k], results["bfloat16"][k]
        assert abs(a - b) / max(abs(a), 1e-6) < 0.01, (k, a, b)

    with pytest.raises(ValueError, match="compute_dtype"):
        MixedTrainer(TrainConfig(compute_dtype="float16"))
