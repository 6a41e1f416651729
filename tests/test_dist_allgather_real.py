"""REAL 2-process allgather: two jax.distributed CPU processes exchange eval
shards through the actual `_allgather_bytes` path (no injected fake).

The reference's collect_results (/root/reference/mmpt/apis/test.py:131-236)
is only exercised by actually launching N processes; this does the same for
our `parallel/dist.py` using subprocesses + a localhost coordinator.
"""

import json
import os
import subprocess
import sys

_WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="localhost:%PORT%", num_processes=2, process_id=rank
)
sys.path.insert(0, %REPO%)
from fgvc_tpu.parallel.dist import allgather_objects, process_info

r, w = process_info()
assert (r, w) == (rank, 2), (r, w)
# unequal payload sizes across ranks exercise the padding path
shard = [(i, {"vid": i, "pts": list(range(i + 1))}) for i in range(rank, 5, 2)]
merged = allgather_objects(shard)
merged = sorted(merged, key=lambda p: p[0])
print("RESULT" + json.dumps([[i, d["vid"], len(d["pts"])] for i, d in merged]))
"""


def test_two_process_allgather_real():
    import socket
    with socket.socket() as _s:  # a free port, not a fixed one:
        _s.bind(("127.0.0.1", 0))  # two suites on one box must
        port = _s.getsockname()[1]  # not cross-connect clusters
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.replace("%PORT%", str(port)).replace("%REPO%", repr(repo))
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_")
    }
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
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=280)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode())

    expect = [[i, i, i + 1] for i in range(5)]
    for rank, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, f"rank {rank} produced no result: {out[-500:]}"
        got = json.loads(lines[0][len("RESULT"):])
        assert got == expect, (rank, got)
