"""Official RAFT torch-checkpoint → fgvc_tpu flax RAFT conversion.

The reference evaluates a RAFT baseline through its tracker harness
(/root/reference/mmpt/models/trackers/raft.py:26-288); the published weights
use the princeton-vl naming (``module.fnet.conv1.weight``,
``update_block.gru.convz1.weight``, …).  This converts that naming into the
fgvc_tpu ``RAFT`` module's {params, batch_stats} pytree.

Conversion starts from an initialized variables pytree and overwrites the
matched leaves, so parameter-free torch norms (InstanceNorm2d affine=False)
keep their identity-initialized flax GroupNorm scale/bias. Raises on any
unconsumed checkpoint key (silent partial loads forbidden — same policy as
torch_convert.convert_resnet_state_dict).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW (torch) → HWIO (flax)."""
    return np.transpose(w, (2, 3, 1, 0))


# torch module path → (collection-agnostic flax path)
_GRU_MAP = {
    "convz1": "convz_h", "convr1": "convr_h", "convq1": "convq_h",
    "convz2": "convz_v", "convr2": "convr_v", "convq2": "convq_v",
}
_MOTION_MAP = {
    "convc1": "conv_c1", "convc2": "conv_c2",
    "convf1": "conv_f1", "convf2": "conv_f2", "conv": "conv",
}


def convert_raft_state_dict(
    state: Mapping[str, np.ndarray],
    variables: Dict[str, Any] | None = None,
    iters: int = 12,
) -> Dict[str, Any]:
    """Convert an official RAFT .pth state dict to fgvc_tpu RAFT variables.

    `variables`: an initialized pytree to overwrite (created with
    cnet_norm='batch' if None — the official full-model configuration).
    """
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.raft import RAFT

    if variables is None:
        dummy = jnp.zeros((32, 32, 3), jnp.float32)
        variables = RAFT(iters=iters, cnet_norm="batch").init(
            jax.random.PRNGKey(0), dummy, dummy
        )
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params = variables["params"]
    stats = variables.setdefault("batch_stats", {})

    state = {k.removeprefix("module."): np.asarray(v) for k, v in state.items()}
    consumed = set()

    def put(tree, path, leaf, expect_shape=True):
        node = tree
        for p in path[:-1]:
            node = node[p]
        if expect_shape and path[-1] in node:
            old = node[path[-1]]
            assert old.shape == leaf.shape, (path, old.shape, leaf.shape)
        node[path[-1]] = leaf

    def conv(flax_path, torch_base):
        k = f"{torch_base}.weight"
        if k not in state:
            return False
        put(params, (*flax_path, "kernel"), _conv_kernel(state[k]))
        consumed.add(k)
        kb = f"{torch_base}.bias"
        if kb in state:
            put(params, (*flax_path, "bias"), state[kb])
            consumed.add(kb)
        return True

    def batchnorm(flax_path, torch_base):
        k = f"{torch_base}.weight"
        if k not in state or f"{torch_base}.running_mean" not in state:
            return False
        put(params, (*flax_path, "scale"), state[k])
        put(params, (*flax_path, "bias"), state[f"{torch_base}.bias"])
        put(stats, (*flax_path, "mean"), state[f"{torch_base}.running_mean"])
        put(stats, (*flax_path, "var"), state[f"{torch_base}.running_var"])
        consumed.update(
            f"{torch_base}.{s}"
            for s in ("weight", "bias", "running_mean", "running_var")
        )
        consumed.add(f"{torch_base}.num_batches_tracked")
        return True

    for enc in ("fnet", "cnet"):
        conv((enc, "conv1"), f"{enc}.conv1")
        batchnorm((enc, "norm1"), f"{enc}.norm1")
        conv((enc, "conv2"), f"{enc}.conv2")
        for li in (1, 2, 3):
            for bj in (0, 1):
                tb = f"{enc}.layer{li}.{bj}"
                fb = (enc, f"layer{li - 1}_{bj}")
                conv((*fb, "conv1"), f"{tb}.conv1")
                conv((*fb, "conv2"), f"{tb}.conv2")
                batchnorm((*fb, "norm1"), f"{tb}.norm1")
                batchnorm((*fb, "norm2"), f"{tb}.norm2")
                conv((*fb, "down"), f"{tb}.downsample.0")
                batchnorm((*fb, "norm3"), f"{tb}.downsample.1")

    for tk, fk in _MOTION_MAP.items():
        conv(("motion", fk), f"update_block.encoder.{tk}")
    for tk, fk in _GRU_MAP.items():
        conv(("gru", fk), f"update_block.gru.{tk}")
    conv(("flow_head", "conv1"), "update_block.flow_head.conv1")
    conv(("flow_head", "conv2"), "update_block.flow_head.conv2")
    conv(("mask_head", "conv1"), "update_block.mask.0")
    conv(("mask_head", "conv2"), "update_block.mask.2")

    leftover = {
        k
        for k in state
        if k not in consumed and not k.endswith("num_batches_tracked")
    }
    if leftover:
        raise ValueError(
            f"unconverted RAFT checkpoint keys: {sorted(leftover)[:8]}"
            f"{' ...' if len(leftover) > 8 else ''}"
        )

    import jax.numpy as jnp

    out = jax.tree_util.tree_map(jnp.asarray, variables)
    if not out.get("batch_stats"):
        out.pop("batch_stats", None)
    return out
