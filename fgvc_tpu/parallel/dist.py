"""Multi-process coordination for evaluation — the collect_results equivalent.

The reference gathers per-rank eval outputs with pickled tensors over NCCL
all_gather or a broadcast tmpdir + barrier (/root/reference/mmpt/apis/test.py:131-236).
Here: videos are sharded `rank::world` (samplers/distributed_sampler.py:9)
and per-point summary dicts are exchanged through
`multihost_utils.process_allgather` on fixed-size float arrays when
`jax.distributed` is initialized; single-process runs are pass-through.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np


def process_info():
    """(rank, world) — (0, 1) when jax.distributed isn't initialized."""
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def initialize(coordinator: Optional[str] = None, **kwargs) -> None:
    """jax.distributed.initialize passthrough (the init_dist equivalent)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def initialize_from_flags(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-process init from CLI flags, falling back to the FGVC_* env
    vars tools/launch.py injects (the torch.distributed.launch equivalent:
    the reference's workers read LOCAL_RANK the same way,
    /root/reference/tools/train.py:51-56). Explicit flags win; returns
    False (no-op) when neither source names a coordinator."""
    import os

    coordinator = coordinator or os.environ.get("FGVC_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None and os.environ.get("FGVC_NUM_PROCESSES"):
        num_processes = int(os.environ["FGVC_NUM_PROCESSES"])
    if process_id is None and os.environ.get("FGVC_PROCESS_ID"):
        process_id = int(os.environ["FGVC_PROCESS_ID"])
    initialize(
        coordinator, num_processes=num_processes, process_id=process_id
    )
    return True


def _allgather_bytes(payload: bytes) -> List[bytes]:
    """Exchange one byte-string per process; returns all, rank order.

    Payloads are padded to the global max length and exchanged as uint8
    arrays via process_allgather (the reference pads pickled byte tensors
    the same way before dist.all_gather — apis/test.py:204-222).
    """
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    _, world = process_info()
    n = np.array([len(payload)], np.int32)
    lens = np.asarray(multihost_utils.process_allgather(jnp.asarray(n)))
    lens = lens.reshape(world)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = np.asarray(multihost_utils.process_allgather(jnp.asarray(buf)))
    bufs = bufs.reshape(world, -1)
    return [bytes(bufs[r][: int(lens[r])]) for r in range(world)]


def allgather_objects(objs: list, _gather_bytes=None) -> list:
    """Gather and concatenate a list of picklable objects from every process.

    The collect_results equivalent (/root/reference/mmpt/apis/test.py:192-236):
    every process contributes its shard; every process receives the
    concatenation in rank order. Single-process runs are pass-through.
    `_gather_bytes` is injectable for tests.
    """
    import pickle

    _, world = process_info()
    if world == 1 and _gather_bytes is None:
        return list(objs)
    gather = _gather_bytes or _allgather_bytes
    merged: list = []
    for raw in gather(pickle.dumps(objs)):
        merged.extend(pickle.loads(raw))
    return merged


def allgather_summaries(summaries: List[Dict[str, float]]) -> List[Dict[str, float]]:
    """Gather per-point summary dicts from every process (json payloads)."""
    _, world = process_info()
    if world == 1:
        return summaries
    merged: List[Dict[str, float]] = []
    for raw in _allgather_bytes(json.dumps(summaries).encode()):
        merged.extend(json.loads(raw))
    return merged
