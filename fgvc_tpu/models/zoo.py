"""Eval backbone zoo: every encoder the tracker can propagate with, by name.

The reference evaluates alternative encoders by swapping the config's
backbone dict (/root/reference/configs/eval/res18_d1_eval.py:6 +
mmpt/models/backbones/__init__.py — ResNet, HRNet, DINO/ViT, Swin, MAST,
positional variants are all registered for ablations).  Here the same swap
is `--backbone <name>` on tools/test.py (or `backbone=` on
apis.test.build_tracker): each entry constructs the flax module, inits or
converts weights, and reports which on-device preprocessing it expects
('lab' for the paper's Lab-trained encoders, 'imagenet' for the DINO/ViT
family).

Checkpoints: torch `.pth` files route through the per-family converter
(mmcv ResNet naming, mmcv HRNet naming, DINO release naming); orbax dirs
restore the trained student backbone.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np


def _simple_init(model, rng, input_hw):
    x = np.zeros((1, *input_hw, 3), np.float32)
    return model.init(rng, x, train=False)


def _entry(ctor, converter=None, preprocess="lab", init=None):
    return {
        "ctor": ctor,
        "converter": converter,
        "preprocess": preprocess,
        "init": init or _simple_init,
    }


def _registry() -> Dict[str, Dict]:
    # imported lazily so `--backbone resnet18_d1` never pays for the zoo
    from fgvc_tpu.models import backbones_extra, hrnet, resnet, vit
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    return {
        # the paper's eval encoder (stride-2 features; resnet.py:231)
        "resnet18_d1": _entry(
            resnet.resnet18_d1,
            converter=convert_resnet_state_dict,
            init=lambda m, rng, hw: resnet.init_resnet_params(m, rng, hw),
        ),
        "hrnet_w18": _entry(
            hrnet.hrnet_w18,
            converter=hrnet.convert_hrnet_state_dict,
            init=lambda m, rng, hw: hrnet.init_hrnet_params(m, rng, hw),
        ),
        "vit_small_d8": _entry(vit.vit_small_d8, preprocess="imagenet"),
        "dino_vit_s8": _entry(
            lambda: vit.dino_vit_small(patch=8),
            converter=vit.convert_dino_vit_state_dict,
            preprocess="imagenet",
        ),
        "dino_vit_s16": _entry(
            lambda: vit.dino_vit_small(patch=16),
            converter=vit.convert_dino_vit_state_dict,
            preprocess="imagenet",
        ),
        "dino_vit_b8": _entry(
            lambda: vit.dino_vit_base(patch=8),
            converter=vit.convert_dino_vit_state_dict,
            preprocess="imagenet",
        ),
        # window 8 (not the ImageNet-classifier 7): it divides the 256²
        # eval grids exactly (64/32/16/8) — no window padding needed; the
        # stride-8 stage gives correspondence-density features
        "swin_tiny": _entry(
            lambda: backbones_extra.swin_tiny(window=8, out_indices=(1,)),
            preprocess="imagenet",
        ),
        "resnet18_mast": _entry(backbones_extra.ResNet18MAST),
        "resnet18_pos": _entry(backbones_extra.ResNet18Pos),
    }


def backbone_names() -> Tuple[str, ...]:
    return tuple(sorted(_registry()))


def make_eval_backbone(
    name: str,
    checkpoint: Optional[str] = None,
    input_hw: Tuple[int, int] = (256, 256),
    seed: int = 0,
) -> Tuple[Callable, Dict, str]:
    """Build (apply_fn, variables, expected_preprocess) for a zoo entry.

    `checkpoint` may be a torch .pth (routed through the family's
    converter) or an orbax dir / work_dir pointer (the trained student
    backbone, apis/test._restore_orbax semantics); None = random init.
    """
    reg = _registry()
    if name not in reg:
        raise ValueError(
            f"unknown backbone {name!r}; available: {', '.join(sorted(reg))}"
        )
    e = reg[name]
    model = e["ctor"]()
    if checkpoint and checkpoint.endswith(".pth"):
        if e["converter"] is None:
            raise ValueError(
                f"backbone {name!r} has no torch checkpoint converter; "
                "pass an orbax dir or drop --checkpoint"
            )
        from fgvc_tpu.models.torch_convert import load_torch_state_dict

        state = load_torch_state_dict(checkpoint)
        prefix = (
            "backbone." if any(k.startswith("backbone.") for k in state) else ""
        )
        variables = e["converter"](state, prefix=prefix)
    elif checkpoint:
        from fgvc_tpu.apis.test import _restore_orbax

        variables = _restore_orbax(checkpoint)
        if "backbone" in variables.get("params", {}):
            variables = {
                "params": variables["params"]["backbone"],
                "batch_stats": variables["batch_stats"],
            }
    else:
        variables = e["init"](model, jax.random.PRNGKey(seed), input_hw)
    return (
        lambda v, x: model.apply(v, x, train=False),
        variables,
        e["preprocess"],
    )
