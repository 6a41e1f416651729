"""REAL 2-process data-parallel training step: two jax.distributed CPU
processes (1 device each) form a global 2-device mesh and run one
MixedTrainer step through the actual cross-process collectives (gradient
psum + global-batch BN inserted by XLA) — then the losses and updated
parameters must match a single-process unsharded step on the same global
batch.

Completes the distributed story of SURVEY §5.8: tests/test_train.py covers
DP on a virtual in-process mesh and tests/test_dist_allgather_real.py covers
the eval-side result gather; this is the DDP-equivalent training path
(/root/reference/mmpt/apis/train.py:137-141) with real process boundaries.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache_tests")
rank = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="localhost:%PORT%", num_processes=2, process_id=rank
)
repo = %REPO%
sys.path.insert(0, repo)
sys.path.insert(0, repo + "/tests")
import numpy as np
from test_train import _tiny_setup
from fgvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch

cfg, trainer, state, teacher_vars, tx, batch = _tiny_setup(batch=2)
step_fn = trainer.make_train_step(tx)
mesh = make_mesh(jax.devices())
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
with mesh:
    sharded = shard_batch(batch, mesh)
    state_r = replicate(state, mesh)
    teacher_r = replicate(teacher_vars, mesh)
    s2, losses = step_fn(state_r, teacher_r, sharded, jax.random.PRNGKey(3))
    losses = {k: float(v) for k, v in losses.items()}
    leaves = jax.tree_util.tree_leaves(s2.params)
    checksum = float(sum(jax.numpy.sum(jax.numpy.abs(l)) for l in leaves))
    # multi-process orbax save (both ranks call into the SAME work_dir):
    # every leaf incl. step must carry the global mesh sharding —
    # regression for the host-local step array orbax rejects once
    # process_count() > 1
    from fgvc_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    path = save_checkpoint(%WORKDIR%, s2, teacher_r, int(s2.step))
    _, _, got_step = restore_checkpoint(path, s2, teacher_r)
    assert got_step == int(s2.step), (got_step, int(s2.step))
print("RESULT" + json.dumps({"losses": losses, "checksum": checksum}))
"""


def test_two_process_train_step_matches_unsharded(tmp_path):
    import jax

    from test_train import _tiny_setup

    # ---- ground truth: unsharded single-process step, same global batch --- #
    cfg, trainer, state, teacher_vars, tx, batch = _tiny_setup(batch=2)
    step_fn = trainer.make_train_step(tx)
    s1, losses1 = step_fn(state, teacher_vars, batch, jax.random.PRNGKey(3))
    losses1 = {k: float(v) for k, v in losses1.items()}
    leaves = jax.tree_util.tree_leaves(s1.params)
    checksum1 = float(sum(jax.numpy.sum(jax.numpy.abs(l)) for l in leaves))

    # ---- two real processes over a global 2-device mesh ------------------- #
    import socket
    with socket.socket() as _s:  # a free port, not a fixed one:
        _s.bind(("127.0.0.1", 0))  # two suites on one box must
        port = _s.getsockname()[1]  # not cross-connect clusters
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = str(tmp_path / "dist_ckpt")
    script = (
        _WORKER.replace("%PORT%", str(port))
        .replace("%REPO%", repr(repo))
        .replace("%WORKDIR%", repr(workdir))
    )
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=repo,
        )
        for rank in (0, 1)
    ]
    results = []
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"rank {rank}: {err.decode()[-2000:]}"
        lines = [
            l for l in out.decode().splitlines() if l.startswith("RESULT")
        ]
        assert lines, f"rank {rank} produced no result"
        results.append(json.loads(lines[0][len("RESULT"):]))

    for rank, res in enumerate(results):
        for k, v in losses1.items():
            np.testing.assert_allclose(
                res["losses"][k], v, rtol=2e-4, atol=2e-4,
                err_msg=f"rank {rank} loss {k}",
            )
        np.testing.assert_allclose(
            res["checksum"], checksum1, rtol=2e-4,
            err_msg=f"rank {rank} param checksum",
        )
