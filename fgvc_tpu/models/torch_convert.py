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

    Handles both namings that appear in the reference's checkpoints
    (/root/reference/mmpt/models/backbones/resnet.py:525-603):

      * mmcv ConvModule naming — what the released
        ``res18_d1_fly_ytv_mixed_training.pth`` actually uses:
        ``conv1.conv.weight`` / ``conv1.bn.*`` for the stem,
        ``layerX.Y.convN.conv.weight`` / ``layerX.Y.convN.bn.*`` for blocks,
        ``layerX.Y.downsample.conv.weight`` / ``downsample.bn.*``.
      * torchvision naming — ``conv1.weight`` / ``bn1.*``,
        ``layerX.Y.convN.weight`` / ``layerX.Y.bnN.*``,
        ``layerX.Y.downsample.0.weight`` / ``downsample.1.*``.

    Raises if any ``{prefix}``-matching weight is left unconverted (except
    ``num_batches_tracked``) — a silent partial load would otherwise ship
    random weights for the dropped layers.

    Returns a pytree {'params': {...}, 'batch_stats': {...}} matching
    fgvc_tpu.models.resnet.ResNet's variable structure.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    consumed = set()

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def add_conv(flax_name, torch_key):
        if torch_key in state:
            put(params, (*flax_name, "kernel"), _conv_kernel(state[torch_key]))
            consumed.add(torch_key)
            return True
        return False

    def add_bn(flax_name, torch_base):
        if f"{torch_base}.weight" not in state:
            return False
        put(params, (*flax_name, "scale"), state[f"{torch_base}.weight"])
        put(params, (*flax_name, "bias"), state[f"{torch_base}.bias"])
        put(stats, (*flax_name, "mean"), state[f"{torch_base}.running_mean"])
        put(stats, (*flax_name, "var"), state[f"{torch_base}.running_var"])
        consumed.update(
            f"{torch_base}.{s}"
            for s in ("weight", "bias", "running_mean", "running_var")
        )
        return True

    p = prefix
    # Stem: mmcv ConvModule naming first, torchvision second.
    if add_conv(("conv1",), f"{p}conv1.conv.weight"):
        add_bn(("bn1",), f"{p}conv1.bn")
    elif add_conv(("conv1",), f"{p}conv1.weight"):
        add_bn(("bn1",), f"{p}bn1")

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
            # mmcv ConvModule: convN.conv.weight + convN.bn.*
            if add_conv((flax_block, f"conv{conv_i}"), f"{base}.conv{conv_i}.conv.weight"):
                add_bn((flax_block, f"bn{conv_i}"), f"{base}.conv{conv_i}.bn")
            # torchvision: convN.weight + bnN.*
            elif add_conv((flax_block, f"conv{conv_i}"), f"{base}.conv{conv_i}.weight"):
                add_bn((flax_block, f"bn{conv_i}"), f"{base}.bn{conv_i}")
        if add_conv((flax_block, "downsample_conv"), f"{base}.downsample.conv.weight"):
            add_bn((flax_block, "downsample_bn"), f"{base}.downsample.bn")
        elif add_conv((flax_block, "downsample_conv"), f"{base}.downsample.0.weight"):
            add_bn((flax_block, "downsample_bn"), f"{base}.downsample.1")

    scope_re = re.compile(
        rf"^{re.escape(p)}(conv1|bn1|layer\d+)\."
        if p
        else r"^(conv1|bn1|layer\d+)\."
    )
    leftover = {
        k
        for k in state
        if scope_re.match(k)
        and k not in consumed
        and not k.endswith("num_batches_tracked")
    }
    if leftover:
        raise ValueError(
            f"unconverted checkpoint keys (naming mismatch?): {sorted(leftover)[:8]}"
            f"{' ...' if len(leftover) > 8 else ''}"
        )

    params = _to_jnp(params)
    stats = _to_jnp(stats)
    return {"params": params, "batch_stats": stats}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def export_resnet_state_dict(
    variables: Mapping[str, Any], prefix: str = "backbone."
) -> Dict[str, np.ndarray]:
    """Inverse of convert_resnet_state_dict: flax ResNet variables →
    a torch state dict in the reference's mmcv ConvModule naming
    (conv1.conv.weight / conv1.bn.* / layerX.Y.convN.{conv.weight,bn.*} /
    downsample.{conv.weight,bn.*} — resnet.py:525-603), so an encoder
    trained HERE loads into the reference's `ResNet` for cross-checking.

    Returns {name: numpy array}; save it for torch with
    ``torch.save({'state_dict': {k: torch.from_numpy(v) ...}}, path)``
    (tools/export.py --format torch does this).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def kern(w):
        # HWIO (flax) -> OIHW (torch)
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def put_bn(torch_base, flax_bn_params, flax_bn_stats):
        out[f"{torch_base}.weight"] = np.asarray(flax_bn_params["scale"])
        out[f"{torch_base}.bias"] = np.asarray(flax_bn_params["bias"])
        out[f"{torch_base}.running_mean"] = np.asarray(flax_bn_stats["mean"])
        out[f"{torch_base}.running_var"] = np.asarray(flax_bn_stats["var"])
        out[f"{torch_base}.num_batches_tracked"] = np.asarray(0, np.int64)

    p = prefix
    out[f"{p}conv1.conv.weight"] = kern(params["conv1"]["kernel"])
    put_bn(f"{p}conv1.bn", params["bn1"], stats["bn1"])

    block_re = re.compile(r"^layer(\d+)_(\d+)$")
    for name in sorted(params):
        m = block_re.match(name)
        if not m:
            continue
        li, bj = m.groups()
        base = f"{p}layer{li}.{bj}"
        blk_p, blk_s = params[name], stats[name]
        for conv_i in (1, 2, 3):
            if f"conv{conv_i}" not in blk_p:
                continue
            out[f"{base}.conv{conv_i}.conv.weight"] = kern(
                blk_p[f"conv{conv_i}"]["kernel"]
            )
            put_bn(
                f"{base}.conv{conv_i}.bn",
                blk_p[f"bn{conv_i}"], blk_s[f"bn{conv_i}"],
            )
        if "downsample_conv" in blk_p:
            out[f"{base}.downsample.conv.weight"] = kern(
                blk_p["downsample_conv"]["kernel"]
            )
            put_bn(
                f"{base}.downsample.bn",
                blk_p["downsample_bn"], blk_s["downsample_bn"],
            )
    return out
