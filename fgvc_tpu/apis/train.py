"""Training harness: the train_model equivalent.

Replaces the reference's runner/hook orchestration
(/root/reference/mmpt/apis/train.py:43, core/runner/*) with a plain loop:

  * data-parallel mesh (batch sharded over 'data'; XLA inserts gradient
    psum and global-batch BN — the DDP + SyncBN equivalent),
  * jitted MixedTrainer step, per-step loss logging (JSONL + optional
    TensorBoard via tensorboardX),
  * orbax checkpoint every `ckpt_interval` steps + resume,
  * optional teacher EMA update (the EMAHook_MoCo equivalent,
    /root/reference/mmpt/core/hooks/ema_hook.py:5) — the shipped recipe
    freezes the teacher instead, so it defaults off.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import time
from typing import Iterable, Optional

import jax
import numpy as np

from fgvc_tpu.config import TrainConfig
from fgvc_tpu.core.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from fgvc_tpu.core.train import MixedTrainer
from fgvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _sync_stop(local_flag: bool, world: int) -> bool:
    """Agree on a stop decision across hosts.

    On a multi-host run every process receives the scheduler's SIGTERM at
    a slightly different time; if each host stopped on its OWN flag, one
    could leave the lockstep step collectives a step before its peers and
    the survivors would hang.  With world > 1 every host therefore calls
    this every step (the allgather IS the agreement — a one-byte DCN
    collective, noise next to a training step) and all hosts stop at the
    same step boundary.  The reference has no preemption story at all
    (SURVEY.md §5.3: no elastic launch, no signal handling).
    """
    if world > 1:
        from jax.experimental import multihost_utils

        return bool(
            multihost_utils.process_allgather(np.asarray(local_flag)).any()
        )
    return local_flag


@jax.jit
def _ema_mix(teacher_params, student_params, momentum):
    return jax.tree_util.tree_map(
        lambda t, s: momentum * t + (1.0 - momentum) * s,
        teacher_params,
        student_params,
    )


def ema_update(teacher_vars, params_backbone, momentum: float = 0.999):
    """teacher ← m·teacher + (1-m)·student (MoCo-style).

    Jitted: one fused dispatch instead of ~3 eager ops per parameter leaf
    (each eager dispatch costs ~1.4 ms through the tunnel link)."""
    new_params = _ema_mix(teacher_vars["params"], params_backbone, momentum)
    return {**teacher_vars, "params": new_params}


def make_tapvid_val_fn(data_root: str, test_cfg=None, max_videos: int = 4):
    """Mid-training evaluation on TAP-Vid — the DistEvalHook_Custom
    equivalent (/root/reference/mmpt/core/evaluation/eval_hooks.py:345):
    the current student weights become the eval twin (copy_params →
    VanillaTracker) and the standard propagation eval runs on a few videos.
    """
    from fgvc_tpu.apis.test import TASK_CONFIGS, eval_tapvid
    from fgvc_tpu.datasets.tapvid import TapVidDataset
    from fgvc_tpu.models.resnet import resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    cfg = test_cfg or TASK_CONFIGS["davis"]
    dataset = TapVidDataset(
        data_root,
        subset_name="davis",
        query_mode="first",
        input_size=cfg.input_size,
    )
    model = resnet18_d1()

    def val_fn(state):
        variables = {
            "params": jax.device_get(state.params)["backbone"],
            "batch_stats": jax.device_get(state.batch_stats),
        }
        tracker = Tracker(
            lambda v, x: model.apply(v, x, train=False), variables, cfg
        )
        return eval_tapvid(tracker, dataset, max_videos=max_videos)

    return val_fn


def make_synthetic_val_fn(
    work_dir: str,
    num_videos: int = 2,
    frames: int = 6,
    size=(64, 64),
    max_videos: int = 2,
    seed: int = 0,
):
    """Mid-train eval smoke without real data: writes tiny synthetic TAP-Vid
    shards under `work_dir/synth_val` and evaluates on them — exercises the
    same copy-params → eval-twin → propagate → score path as the real
    DistEvalHook (eval_hooks.py:345-364)."""
    import dataclasses
    import pickle

    from fgvc_tpu.apis.test import TASK_CONFIGS

    root = os.path.join(work_dir, "synth_val")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    for v in range(num_videos):
        path = os.path.join(root, f"synth{v}.pkl")
        if not os.path.exists(path):
            rec = {
                "video": rng.integers(
                    0, 256, (frames, *size, 3), dtype=np.uint8
                ),
                "points": rng.uniform(0.2, 0.8, (4, frames, 2)).astype(
                    np.float32
                ),
                "occluded": np.zeros((4, frames), bool),
            }
            with open(path, "wb") as f:
                pickle.dump(rec, f)
    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"],
        input_size=tuple(size),
        frame_bucket=8,
        point_bucket=16,
        neighbor_range=6,
        tile=8,
    )
    return make_tapvid_val_fn(root, test_cfg=cfg, max_videos=max_videos)


def train_model(
    cfg: TrainConfig,
    batches: Iterable,
    work_dir: str,
    steps_per_epoch: int,
    max_steps: Optional[int] = None,
    ckpt_interval: Optional[int] = None,
    log_interval: int = 50,
    resume: bool = True,
    teacher_init: Optional[str] = None,
    teacher_ema: Optional[float] = None,
    val_fn=None,
    val_interval: Optional[int] = None,
    val_metric_key: str = "average_pts_within_thresh",
    val_rule: str = "greater",
):
    """Run mixed training over an iterable of host batches.

    When `val_fn` reports `val_metric_key`, the best checkpoint is tracked
    (save + `best` pointer + best.json) — the EvalHook_Custom save-best
    behavior (/root/reference/mmpt/core/evaluation/eval_hooks.py:177-292).
    """
    os.makedirs(work_dir, exist_ok=True)
    mesh = make_mesh()
    trainer = MixedTrainer(cfg)
    state, teacher_vars, tx = trainer.init(
        jax.random.PRNGKey(cfg.seed), steps_per_epoch
    )
    if teacher_init:
        # a work_dir 'best'/'latest' pointer FILE resolves to its sibling
        # step directory — same convention --checkpoint already follows
        # (apis/test.py _restore_orbax); without this the pointer file was
        # handed to torch.load as if it were a .pth.  Only the basenames
        # train itself writes are treated as pointers, so binary torch
        # checkpoints under any other name still reach torch.load
        if os.path.isfile(teacher_init) and os.path.basename(
            teacher_init
        ) in ("best", "latest"):
            with open(teacher_init) as f:
                target = f.read().strip()
            cand = os.path.join(os.path.dirname(teacher_init), target)
            if os.path.isdir(cand):
                teacher_init = cand
        if os.path.isdir(teacher_init):
            # an fgvc orbax checkpoint dir: the trained STUDENT of that run
            # becomes this run's frozen teacher — the reference's staged
            # recipe, where the mixed objective distills an earlier
            # self-supervised encoder (mixed_tracker.py teacher pretrained
            # path; configs/train/...py teacher backbone init)
            prev_state, _, prev_step = restore_checkpoint(
                teacher_init, state, teacher_vars, to_host=True
            )
            teacher_vars = {
                "params": prev_state.params["backbone"],
                "batch_stats": prev_state.batch_stats,
            }
            print(
                f"teacher <- student of {teacher_init} (step {prev_step})",
                flush=True,
            )
        else:
            from fgvc_tpu.models.torch_convert import (
                convert_resnet_state_dict,
                load_torch_state_dict,
            )

            teacher_vars = convert_resnet_state_dict(
                load_torch_state_dict(teacher_init)
            )

    start = 0
    best_metric = None
    if resume:
        path = latest_checkpoint(work_dir)
        if path:
            state, teacher_vars, start = restore_checkpoint(
                path, state, teacher_vars, to_host=True
            )
            print(f"resumed from {path} (step {start})", flush=True)
            # keep the best-checkpoint tracking across restarts: a fresh
            # None would let the first (possibly worse) post-resume val
            # overwrite the recorded best
            best_path = os.path.join(work_dir, "best.json")
            if os.path.exists(best_path):
                with open(best_path) as f:
                    meta = json.load(f)
                if meta.get("metric") == val_metric_key:
                    best_metric = meta.get("value")
                    print(f"best so far: {best_metric}", flush=True)

    step_fn = trainer.make_train_step(tx)
    total = max_steps or cfg.max_epochs * steps_per_epoch
    ckpt_interval = ckpt_interval or max(total // 2, 1)

    # graceful preemption: TPU pods are routinely preempted with SIGTERM —
    # finish the in-flight step, checkpoint, and exit cleanly so the next
    # incarnation resumes exactly (orbax state includes Adam moments).
    preempt = {"flag": False}

    def _on_sigterm(signum, frame):
        preempt["flag"] = True
        print(
            "SIGTERM: will checkpoint and stop at the step boundary",
            flush=True,
        )

    import contextlib

    _restore = contextlib.ExitStack()
    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        _restore.callback(signal.signal, signal.SIGTERM, prev_sigterm)
    except ValueError:  # not the main thread — run without the handler
        pass
    world = jax.process_count()
    # host-side logging is process-0 only: every process runs the same
    # SPMD program (checkpoint saves and val_fn MUST stay all-process —
    # orbax and the eval collectives are coordinated), but JSONL / TB /
    # wandb / best-pointer files would duplicate or interleave if every
    # rank wrote them to a shared work_dir
    is_lead = jax.process_index() == 0

    log_path = os.path.join(work_dir, "train_log.jsonl")
    tb = None
    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(os.path.join(work_dir, "tb")) if is_lead else None
    except Exception:
        pass
    # WandbLoggerHook_Custom equivalent (core/hooks/wandb.py:10-108):
    # activates when wandb is installed AND WANDB_PROJECT is set.
    wandb_run = None
    if is_lead and os.environ.get("WANDB_PROJECT"):
        try:
            import wandb

            wandb_run = wandb.init(
                project=os.environ["WANDB_PROJECT"],
                dir=work_dir,
                config=dataclasses.asdict(cfg),
                resume="allow",
            )
        except Exception:
            wandb_run = None

    with _restore, mesh:
        state = replicate(state, mesh)
        teacher_vars = replicate(teacher_vars, mesh)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
        step = start
        last_logged = start
        # host-side loader pipeline: batch n+1's augmentation/decode runs
        # on a worker thread while step n executes on device (the
        # reference's DataLoader-workers role; data_io/prefetch.py)
        from fgvc_tpu.data_io.prefetch import prefetch_iter

        for batch in prefetch_iter(batches, depth=2):
            if step >= total:
                break
            # fold the GLOBAL step into the key (not sequential splits from
            # the loop head): a resumed run draws the exact per-step keys
            # the uninterrupted run would have — with the loader's resume
            # fast-forward (make_batches skip) this makes preempt → resume
            # bitwise step-exact (tools/rehearse_train.py proves it)
            sub = jax.random.fold_in(rng, step)
            batch = shard_batch(batch, mesh)
            state, losses = step_fn(state, teacher_vars, batch, sub)
            if cfg.check_numerics and not bool(losses["all_finite"]):
                vals = {
                    k: float(v) for k, v in losses.items() if k != "all_finite"
                }
                raise FloatingPointError(
                    f"non-finite loss or gradient at step {step + 1}: {vals}"
                )
            if teacher_ema is not None:
                teacher_vars = ema_update(
                    teacher_vars, state.params["backbone"], teacher_ema
                )
            step += 1

            if (step % log_interval == 0 or step == total) and is_lead:
                vals = {k: float(v) for k, v in losses.items()}
                vals["step"] = step
                vals["steps_per_sec"] = (step - last_logged) / max(
                    time.time() - t0, 1e-9
                )
                last_logged = step
                t0 = time.time()
                with open(log_path, "a") as f:
                    f.write(json.dumps(vals) + "\n")
                if tb:
                    for k, v in vals.items():
                        tb.add_scalar(k, v, step)
                if wandb_run is not None:
                    wandb_run.log(vals, step=step)
                print(
                    f"step {step}/{total} "
                    + " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                    flush=True,
                )
            if step % ckpt_interval == 0 or step == total:
                path = save_checkpoint(work_dir, state, teacher_vars, step)
                if is_lead:
                    print(f"saved {path}", flush=True)
            if (
                val_fn is not None
                and val_interval
                and (step % val_interval == 0 or step == total)
            ):
                metrics = val_fn(state)
                if is_lead:
                    with open(log_path, "a") as f:
                        f.write(
                            json.dumps({"step": step, "val": metrics}) + "\n"
                        )
                    print(f"[val @ {step}] {metrics}", flush=True)
                cur = metrics.get(val_metric_key)
                if cur is not None:
                    better = best_metric is None or (
                        cur > best_metric
                        if val_rule == "greater"
                        else cur < best_metric
                    )
                    if better:
                        # every process tracks best_metric and joins the
                        # (coordinated) checkpoint save; only the lead
                        # writes the pointer files
                        best_metric = float(cur)
                        save_checkpoint(work_dir, state, teacher_vars, step)
                        if is_lead:
                            with open(
                                os.path.join(work_dir, "best"), "w"
                            ) as f:
                                f.write(f"step_{step}")
                            with open(
                                os.path.join(work_dir, "best.json"), "w"
                            ) as f:
                                json.dump(
                                    {
                                        "step": step,
                                        "metric": val_metric_key,
                                        "value": best_metric,
                                    },
                                    f,
                                )
                            print(
                                f"[best @ {step}] "
                                f"{val_metric_key}={best_metric}",
                                flush=True,
                            )
            if _sync_stop(preempt["flag"], world):
                if step % ckpt_interval != 0 and step != total:
                    path = save_checkpoint(work_dir, state, teacher_vars, step)
                    print(f"preempted: saved {path}", flush=True)
                print(f"preempted: stopping at step {step}", flush=True)
                break

    return state, teacher_vars
