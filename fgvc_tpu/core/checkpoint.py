"""Checkpoint save/resume via orbax — the mmcv checkpoint equivalent.

Replaces epoch_{n}.pth + latest.pth symlinks + runner.resume
(/root/reference/mmpt/core/runner/epoch_based_runner.py:135-241) with orbax
StandardCheckpointer directories `step_{n}` plus a `latest` pointer file.
Saves params, batch_stats, optimizer state, and step together so resume is
exact (including Adam moments, like save_optimizer=True).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_checkpoint(work_dir: str, state, teacher_vars, step: int) -> str:
    import jax
    import orbax.checkpoint as ocp

    os.makedirs(work_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(work_dir, f"step_{step}"))
    ckpt = ocp.StandardCheckpointer()
    # use the state's OWN step array: it carries the same global (mesh-
    # replicated) sharding as every other leaf, which orbax requires in a
    # multi-process run — a freshly created jnp.asarray(step) would be a
    # host-local SingleDeviceSharding array that orbax refuses to
    # serialize once jax.process_count() > 1
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": jax.numpy.asarray(state.step),
        "teacher": teacher_vars,
    }
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(work_dir, "latest"), "w") as f:
        f.write(f"step_{step}")
    return path


def _pointer(work_dir: str, name: str) -> Optional[str]:
    pointer = os.path.join(work_dir, name)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        target = f.read().strip()
    path = os.path.join(work_dir, target)
    return path if os.path.exists(path) else None


def latest_checkpoint(work_dir: str) -> Optional[str]:
    return _pointer(work_dir, "latest")


def best_checkpoint(work_dir: str) -> Optional[str]:
    """Best-metric checkpoint tracked by train_model's eval hook
    (the EvalHook_Custom save-best equivalent, eval_hooks.py:177-292)."""
    return _pointer(work_dir, "best")


def restore_checkpoint(
    path: str, state, teacher_vars, to_host: bool = False
) -> Tuple[Any, Any, int]:
    """Restore into the given (abstract or concrete) state structures.

    `to_host=True` restores every leaf as a HOST numpy array (the target is
    numpy-ified first — orbax follows the target's placement).  Required
    when the caller will re-place the state onto a fresh global mesh
    (train_model resume): restoring onto the template's single local device
    and then device_put-ing to a multi-process sharding is a cross-host
    transfer, which the CPU backend refuses; numpy → global sharding is the
    supported placement path (every process holds the full value)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "teacher": teacher_vars,
    }
    if to_host:
        target = jax.tree_util.tree_map(np.asarray, target)
    restored = ckpt.restore(os.path.abspath(path), target)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, restored["teacher"], int(restored["step"])
