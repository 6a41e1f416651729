"""Export the flagship serving step as a serialized StableHLO artifact.

TPU-native re-scope of the reference's ONNX export wrappers
(/root/reference/mmpt/core/export/wrappers.py:13-93): one self-contained
file (weights embedded) that a serving process deserializes with
``jax.export.deserialize`` and calls — no Python model code needed.

Examples:
    python tools/export.py --out /tmp/fgvc_step.jaxexp --check
    python tools/export.py --checkpoint res18_d1_*.pth --platforms tpu \
        --attention-impl pallas --input-size 256 256 --out step.jaxexp

``--format torch`` instead exports the encoder as a reference-compatible
torch ``.pth`` (mmcv naming), so a student trained HERE can be evaluated
with the reference's own tools/test.py — the reverse of loading their
released checkpoints:
    python tools/export.py --format torch --checkpoint runs/mixed/best \
        --out student.pth
"""

from __future__ import annotations

import argparse
import dataclasses



def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True, help="artifact path")
    parser.add_argument("--checkpoint", default=None,
                        help="torch .pth to embed (random init if omitted)")
    parser.add_argument("--input-size", type=int, nargs=2, default=None,
                        metavar=("H", "W"))
    parser.add_argument("--value-dim", type=int, default=8,
                        help="propagated channels (points per group / classes)")
    parser.add_argument("--attention-impl", default="tiled",
                        choices=["tiled", "dense", "pallas", "c2f"],
                        help="'tiled' lowers on every platform; 'pallas' is "
                        "TPU-only (embeds the Mosaic kernel)")
    parser.add_argument("--platforms", nargs="+", default=None,
                        help="e.g. 'tpu cpu' for a multi-platform artifact; "
                        "default = current backend")
    parser.add_argument("--platform", default=None,
                        help="force the local jax platform (cpu for tests)")
    parser.add_argument("--check", action="store_true",
                        help="round-trip: deserialize and compare against "
                        "direct execution")
    parser.add_argument("--format", default="stablehlo",
                        choices=["stablehlo", "torch"],
                        help="torch = reference-compatible encoder .pth")
    args = parser.parse_args(argv)

    if args.format == "torch":
        _export_torch(args)
        return

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    import jax
    import numpy as np

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.core.export import (
        export_flagship,
        load_exported,
        save_exported,
    )

    cfg = dataclasses.replace(TestConfig(), attention_impl=args.attention_impl)
    if args.input_size:
        cfg = dataclasses.replace(cfg, input_size=tuple(args.input_size))

    variables = None
    if args.checkpoint:
        from fgvc_tpu.models.torch_convert import (
            convert_resnet_state_dict,
            load_torch_state_dict,
        )

        variables = convert_resnet_state_dict(
            load_torch_state_dict(args.checkpoint)
        )

    exported, fn, example_args = export_flagship(
        cfg,
        variables=variables,
        value_dim=args.value_dim,
        platforms=args.platforms,
    )
    size = save_exported(exported, args.out)
    print(
        f"exported {args.out}: {size / 1e6:.2f} MB, "
        f"platforms={exported.platforms}, "
        f"in={[str(s) for s in exported.in_avals]}"
    )

    if args.check:
        restored = load_exported(args.out)
        got = np.asarray(restored.call(*example_args))
        want = np.asarray(jax.jit(fn)(*example_args))
        err = float(np.max(np.abs(got - want)))
        print(f"round-trip max|Δ| = {err:.3e}")
        assert err < 1e-5, err
        print("check ok")


def _export_torch(args):
    """Encoder variables -> reference-compatible torch .pth."""
    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)

    import torch

    from fgvc_tpu.models.torch_convert import export_resnet_state_dict

    if not args.checkpoint:
        raise SystemExit("--format torch needs --checkpoint (orbax dir, "
                         "work_dir best/latest pointer, or a .pth to "
                         "re-normalize)")
    if args.checkpoint.endswith(".pth"):
        from fgvc_tpu.models.torch_convert import (
            convert_resnet_state_dict,
            load_torch_state_dict,
        )

        variables = convert_resnet_state_dict(
            load_torch_state_dict(args.checkpoint)
        )
    else:
        from fgvc_tpu.apis.test import _restore_orbax

        variables = _restore_orbax(args.checkpoint)
        if "backbone" in variables.get("params", {}):
            variables = {
                "params": variables["params"]["backbone"],
                "batch_stats": variables["batch_stats"],
            }
    state = export_resnet_state_dict(variables)
    torch.save(
        {"state_dict": {k: torch.from_numpy(
            __import__("numpy").ascontiguousarray(v)) for k, v in state.items()}},
        args.out,
    )
    print(f"wrote reference-compatible checkpoint: {args.out} "
          f"({len(state)} tensors, mmcv naming, 'backbone.' prefix)")


if __name__ == "__main__":
    main()
