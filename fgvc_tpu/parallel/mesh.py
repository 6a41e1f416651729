"""Device mesh + sharding helpers — the NCCL/DDP replacement.

The reference scales with one-process-per-GPU DDP over NCCL
(/root/reference/mmpt/apis/train.py:137, SURVEY §2.9).  Here the same
data-parallel strategy is a `jax.sharding.Mesh` with the global batch sharded
over a 'data' axis: gradients are summed by XLA collectives over ICI, and
BatchNorm statistics are computed over the GLOBAL batch inside the jitted
step — SyncBN (tools/train.py:135) falls out for free instead of being a
special wrapper.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in `batch` with its leading dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def batch_shuffle(x: jax.Array, rng: jax.Array):
    """MoCo shuffle-BN equivalent (_batch_shuffle_ddp,
    /root/reference/mmpt/models/common/utils.py:98-177).

    The reference shuffles the global batch across GPUs with an all_gather +
    broadcast-ed permutation so per-GPU BatchNorm sees mixed samples. On a
    TPU mesh the global batch is ONE sharded jax.Array, so the shuffle is a
    plain permutation gather inside jit — XLA inserts the collective.

    Returns (shuffled, unshuffle_idx); apply `batch_unshuffle` after.
    """
    import jax.numpy as jnp

    n = x.shape[0]
    perm = jax.random.permutation(rng, n)
    inv = jnp.argsort(perm)
    return jnp.take(x, perm, axis=0), inv


def batch_unshuffle(x: jax.Array, unshuffle_idx: jax.Array):
    import jax.numpy as jnp

    return jnp.take(x, unshuffle_idx, axis=0)
