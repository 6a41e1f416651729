"""tools/launch.py: the dist_train.sh/dist_test.sh equivalent, for real.

Launches 2 coordinated CPU processes through the actual launcher; each
worker picks its rank up from the FGVC_* env vars via
`initialize_from_flags` (no rank-specific argv) and the pair exchanges
shards through the real allgather — the torch.distributed.launch shape
(/root/reference/tools/dist_train.sh:9-11) on jax.distributed.
"""

import os
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %REPO%)
from fgvc_tpu.parallel.dist import (
    allgather_objects, initialize_from_flags, process_info,
)

assert initialize_from_flags()  # rank/world/coordinator all from FGVC_* env
rank, world = process_info()
assert world == 2, world
merged = allgather_objects([f"shard-{rank}"])
assert sorted(merged) == ["shard-0", "shard-1"], merged
print(f"WORKER_OK rank={rank}", flush=True)
"""


def test_launcher_spawns_coordinated_workers(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("%REPO%", repr(repo)))
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    out = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "launch.py"),
            "--nprocs", "2", "--",
            sys.executable, str(worker),
        ],
        capture_output=True, text=True, timeout=280, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("WORKER_OK") == 2, out.stdout


def test_launcher_detects_late_rank_failure_fast(tmp_path):
    """A crash in a HIGHER rank must terminate the fleet promptly — the
    launcher polls all workers rather than waiting in rank order."""
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    w = tmp_path / "w.py"
    w.write_text(
        "import os, sys, time\n"
        "if os.environ['FGVC_PROCESS_ID'] == '1':\n"
        "    sys.exit(5)\n"
        "time.sleep(120)\n"
    )
    t0 = time.monotonic()
    out = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "launch.py"),
            "--nprocs", "2", "--",
            sys.executable, str(w),
        ],
        capture_output=True, text=True, timeout=110, cwd=repo,
    )
    assert out.returncode == 5
    assert time.monotonic() - t0 < 60, "launcher waited on rank 0 instead"


def test_launcher_propagates_failure(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(7)\n")
    out = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "launch.py"),
            "--nprocs", "2", "--",
            sys.executable, str(bad),
        ],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    assert out.returncode == 7
