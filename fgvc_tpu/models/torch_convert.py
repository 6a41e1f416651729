"""Torch-checkpoint → flax-pytree conversion for the ResNet encoder.

The reference releases ``.pth`` checkpoints (mmcv format with a ``backbone.``
prefix and ConvModule stem naming, or torchvision naming — see the remapping
logic at /root/reference/mmpt/models/backbones/resnet.py:525-603).  This
module converts either naming into the fgvc_tpu flax ResNet's
{params, batch_stats} pytree so released weights reproduce reference features.

Only numpy is required here; loading the .pth itself uses torch (CPU) when
available and falls back to a plain pickle of numpy arrays.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into a flat {name: numpy array} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW (torch) → HWIO (flax)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_resnet_state_dict(
    state: Mapping[str, np.ndarray], prefix: str = "backbone."
) -> Dict[str, Any]:
    """Convert a torch ResNet state dict to fgvc_tpu ResNet variables.

    Handles both mmcv naming (``conv1.conv.weight`` / ``conv1.bn.weight``)
    and torchvision naming (``conv1.weight`` / ``bn1.weight``).

    Returns a pytree {'params': {...}, 'batch_stats': {...}} matching
    fgvc_tpu.models.resnet.ResNet's variable structure.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def add_conv(flax_name: str, torch_key: str):
        if torch_key in state:
            put(params, (flax_name, "kernel"), _conv_kernel(state[torch_key]))
            return True
        return False

    def add_bn(flax_name: str, torch_base: str):
        if f"{torch_base}.weight" not in state:
            return False
        put(params, (flax_name, "scale"), state[f"{torch_base}.weight"])
        put(params, (flax_name, "bias"), state[f"{torch_base}.bias"])
        put(stats, (flax_name, "mean"), state[f"{torch_base}.running_mean"])
        put(stats, (flax_name, "var"), state[f"{torch_base}.running_var"])
        return True

    p = prefix
    # Stem: mmcv ConvModule naming first, torchvision second.
    if not add_conv("conv1", f"{p}conv1.conv.weight"):
        add_conv("conv1", f"{p}conv1.weight")
    if not add_bn("bn1", f"{p}conv1.bn"):
        add_bn("bn1", f"{p}bn1")

    block_re = re.compile(rf"^{re.escape(p)}layer(\d+)\.(\d+)\.")
    seen = {
        (int(m.group(1)), int(m.group(2)))
        for key in state
        if (m := block_re.match(key))
    }
    for (li, bj) in sorted(seen):
        base = f"{p}layer{li}.{bj}"
        flax_block = f"layer{li}_{bj}"
        for conv_i in (1, 2, 3):
            tk = f"{base}.conv{conv_i}.weight"
            if tk in state:
                put(params, (flax_block, f"conv{conv_i}", "kernel"), _conv_kernel(state[tk]))
                put(params, (flax_block, f"bn{conv_i}", "scale"), state[f"{base}.bn{conv_i}.weight"])
                put(params, (flax_block, f"bn{conv_i}", "bias"), state[f"{base}.bn{conv_i}.bias"])
                put(stats, (flax_block, f"bn{conv_i}", "mean"), state[f"{base}.bn{conv_i}.running_mean"])
                put(stats, (flax_block, f"bn{conv_i}", "var"), state[f"{base}.bn{conv_i}.running_var"])
        dk = f"{base}.downsample.0.weight"
        if dk in state:
            put(params, (flax_block, "downsample_conv", "kernel"), _conv_kernel(state[dk]))
            put(params, (flax_block, "downsample_bn", "scale"), state[f"{base}.downsample.1.weight"])
            put(params, (flax_block, "downsample_bn", "bias"), state[f"{base}.downsample.1.bias"])
            put(stats, (flax_block, "downsample_bn", "mean"), state[f"{base}.downsample.1.running_mean"])
            put(stats, (flax_block, "downsample_bn", "var"), state[f"{base}.downsample.1.running_var"])

    params = _to_jnp(params)
    stats = _to_jnp(stats)
    return {"params": params, "batch_stats": stats}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
