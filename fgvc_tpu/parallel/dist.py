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


def allgather_summaries(summaries: List[Dict[str, float]]) -> List[Dict[str, float]]:
    """Gather per-point summary dicts from every process.

    Dicts are serialized to utf-8 json, padded to the global max length, and
    exchanged as uint8 arrays via process_allgather.
    """
    rank, world = process_info()
    if world == 1:
        return summaries

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    payload = json.dumps(summaries).encode()
    n = np.array([len(payload)], np.int32)
    max_n = int(multihost_utils.process_allgather(jnp.asarray(n)).max())
    buf = np.zeros(max_n, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(jnp.asarray(n)))
    bufs = np.asarray(multihost_utils.process_allgather(jnp.asarray(buf)))

    merged: List[Dict[str, float]] = []
    for r in range(world):
        raw = bytes(bufs[r][: int(lens[r][0])])
        merged.extend(json.loads(raw))
    return merged
