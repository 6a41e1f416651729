#!/usr/bin/env python
"""One-command reproduction of the reference's published benchmarks.

Executes the real-data validation plan (CLAUDE.md) end to end the moment
datasets are mounted:

    python tools/reproduce.py \
        --checkpoint res18_d1_fly_ytv_mixed_training.pth \
        --davis-root /data/tapvid_davis \
        --kinetics-root /data/tapvid_kinetics \
        --jhmdb-root /data/jhmdb --jhmdb-list /data/jhmdb/val_list.txt \
        --badja-root /data/badja

Steps (each skipped when its input is absent):
  1. checkpoint load — the released torch .pth converts on the fly
     (mmcv ConvModule naming; models/torch_convert.py), orbax dirs and
     work_dir 'best'/'latest' pointers also accepted;
  2. feature parity probe — the SAME .pth loaded into a torch ResNet-18-d1
     twin (the reference encoder, /root/reference/mmpt/models/backbones/
     resnet.py:454-473 stem + :54-79 BasicBlock, eval-mode BN) and into the
     flax model; layer3 features on random frames must agree to ~1e-4 with
     HIGHEST-precision matmuls — catches converter/BN slips before burning
     hours of eval;
  3. benchmark runs — every task with a provided root runs through
     apis/test.run_task at the reference's exact settings and is compared
     against the published number (/root/reference/README.md:104-109) with
     the 0.5 pt parity bar (BASELINE.md);
  4. optional --fast-modes — re-runs TAP-Vid-DAVIS in the study-promoted
     speed modes (bf16 matmuls, pallas bf16 attention, coarse decode;
     docs/precision_study.md) and reports each mode's metric delta, the
     promotion check for making a fast mode the library default.

Writes report.json + report.md under --output-dir and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# task -> (headline metric key, published reference value)
# /root/reference/README.md:104-109
EXPECTED = {
    "davis": ("average_pts_within_thresh", 62.8),
    "kinetics": ("average_pts_within_thresh", 54.6),
    "jhmdb": ("PCK@0.1", 66.8),
    "badja": ("PCK@0.2", 69.7),
}
PARITY_BAR = 0.5  # points (BASELINE.md "match within 0.5")


def _torch_twin():
    """The reference encoder as a plain-torch twin (same structure the
    oracle in tests/test_resnet.py validates against the flax model)."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            if stride != 1 or inplanes != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            else:
                self.downsample = None

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class ResNet18D1(nn.Module):
        """strides=(1,1,1,4), no stem pool, layer3 output — the d1 eval
        encoder (configs/eval/res18_d1_eval.py:6)."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            inplanes = 64
            for i, s in enumerate((1, 1, 1, 4)):
                planes = 64 * 2**i
                setattr(
                    self,
                    f"layer{i + 1}",
                    nn.Sequential(Block(inplanes, planes, s), Block(planes, planes, 1)),
                )
                inplanes = planes

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            for i in range(3):
                x = getattr(self, f"layer{i + 1}")(x)
            return x

    return torch, ResNet18D1()


def _from_mmcv_naming(state):
    """mmcv ConvModule checkpoint keys -> torch-twin keys (inverse of the
    released checkpoint's naming; resnet.py:454-473 wraps conv+bn in
    ConvModule so keys read 'conv1.conv.weight' / 'layer1.0.conv1.bn.*')."""
    import re

    out = {}
    for k, v in state.items():
        nk = k
        nk = re.sub(r"^conv1\.conv\.weight$", "conv1.weight", nk)
        nk = re.sub(r"^conv1\.bn\.", "bn1.", nk)
        nk = re.sub(r"(layer\d+\.\d+)\.conv(\d)\.conv\.weight$", r"\1.conv\2.weight", nk)
        nk = re.sub(r"(layer\d+\.\d+)\.conv(\d)\.bn\.", r"\1.bn\2.", nk)
        nk = re.sub(
            r"(layer\d+\.\d+)\.downsample\.conv\.weight$", r"\1.downsample.0.weight", nk
        )
        nk = re.sub(r"(layer\d+\.\d+)\.downsample\.bn\.", r"\1.downsample.1.", nk)
        out[nk] = v
    return out


def probe_forward(model):
    """The probe's jitted forward with HIGHEST-precision matmuls bound
    INSIDE the traced function.  On TPU the default precision rounds conv
    operands to bf16, which puts flax-vs-torch-f32 layer3 deltas at ~1e-1
    and fails the probe's 1e-3 bar on correctly-converted weights — caught
    by the round-5 on-chip dress rehearsal (docs/rehearsal_eval.md); the
    probe had only ever run on CPU, where the default IS f32.  Exposed at
    module level so tests can assert the precision survives into the
    lowered HLO (tests/test_reproduce_cli.py)."""
    import jax

    def _fwd(v, x):
        with jax.default_matmul_precision("highest"):
            return model.apply(v, x, train=False)

    return jax.jit(_fwd)


def parity_probe(checkpoint: str, frames: int = 2, size: int = 256) -> dict:
    """Plan step 2: flax-vs-torch layer3 features from the SAME weights.

    Returns {'max_abs': float, 'ok': bool}; requires a torch .pth."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgvc_tpu.models.resnet import resnet18_d1
    from fgvc_tpu.models.torch_convert import (
        convert_resnet_state_dict,
        load_torch_state_dict,
    )

    torch, twin = _torch_twin()
    raw = load_torch_state_dict(checkpoint)
    # keep the student backbone ('backbone.'); teacher/discriminator keys drop
    prefix = "backbone."
    state = {k[len(prefix):]: v for k, v in raw.items() if k.startswith(prefix)}
    if not state:  # already backbone-only (converted/stripped checkpoints)
        state, prefix = raw, ""
    twin_state = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in _from_mmcv_naming(state).items()
    }
    missing, unexpected = twin.load_state_dict(twin_state, strict=False)
    # num_batches_tracked etc. may be absent; conv/bn weights must not be
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    if real_missing:
        raise KeyError(f"torch twin missing weights: {real_missing[:8]}")
    twin.eval()

    variables = convert_resnet_state_dict(raw, prefix=prefix)
    fwd = probe_forward(resnet18_d1())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((frames, size, size, 3)).astype(np.float32)
    ours = np.asarray(fwd(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = twin(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    max_abs = float(np.max(np.abs(ours - ref)))
    return {"max_abs": max_abs, "ok": max_abs < 1e-3, "unexpected_keys": len(unexpected)}


def main():
    p = argparse.ArgumentParser(description="reproduce the reference benchmarks")
    p.add_argument("--checkpoint", required=True,
                   help="released .pth / orbax dir / work_dir best|latest pointer")
    p.add_argument("--davis-root", default=None)
    p.add_argument("--kinetics-root", default=None)
    p.add_argument("--jhmdb-root", default=None)
    p.add_argument("--jhmdb-list", default=None)
    p.add_argument("--badja-root", default=None)
    p.add_argument("--output-dir", default="reproduce_results")
    p.add_argument("--max-videos", type=int, default=None,
                   help="cap videos per task (smoke runs; full runs omit this)")
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="run the benchmark tasks even if the feature-parity "
                        "probe fails (default: abort — evaluating known-bad "
                        "weights wastes hours of chip time)")
    p.add_argument("--fast-modes", action="store_true",
                   help="also run DAVIS in the study-promoted speed modes "
                        "and report metric deltas (plan step 3)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    os.makedirs(args.output_dir, exist_ok=True)
    report = {"checkpoint": args.checkpoint, "tasks": {}, "max_videos": args.max_videos}

    # ---- step 2: feature parity -------------------------------------- #
    if not args.skip_parity and args.checkpoint.endswith(".pth"):
        try:
            import torch  # noqa: F401  (probe needs torch installed)

            probe = parity_probe(args.checkpoint)
            report["feature_parity"] = probe
            status = "OK" if probe["ok"] else "FAILED"
            print(f"[parity] layer3 max|Δ| = {probe['max_abs']:.2e} -> {status}")
            if not probe["ok"]:
                print("[parity] conversion mismatch — fix before trusting "
                      "any benchmark number below")
                if not args.force:
                    print("[parity] aborting (pass --force to evaluate "
                          "anyway)")
                    sys.exit(2)
        except ImportError:
            print("[parity] torch not installed — skipping probe")

    # ---- steps 3-4: benchmark tasks ----------------------------------- #
    from fgvc_tpu.apis.test import run_task

    roots = {
        "davis": (args.davis_root, None),
        "kinetics": (args.kinetics_root, None),
        "jhmdb": (args.jhmdb_root, args.jhmdb_list),
        "badja": (args.badja_root, None),
    }
    rows = []
    for task, (root, list_path) in roots.items():
        if not root:
            continue
        key, expected = EXPECTED[task]
        print(f"[{task}] running on {root} ...")
        res = run_task(
            task, root, checkpoint=args.checkpoint, list_path=list_path,
            max_videos=args.max_videos,
            output_dir=os.path.join(args.output_dir, task),
        )
        value = float(res[key])
        delta = value - expected
        within = abs(delta) <= PARITY_BAR
        report["tasks"][task] = {
            "metric": key, "value": value, "expected": expected,
            "delta": delta, "within_bar": within, "all_metrics": res,
        }
        rows.append((task, key, value, expected, delta, within))
        print(f"[{task}] {key} = {value:.2f} (ref {expected}, Δ {delta:+.2f}, "
              f"{'PASS' if within else 'CHECK' } @ ±{PARITY_BAR})")

    # ---- plan step 3 second half: fast-mode deltas on DAVIS ----------- #
    if args.fast_modes and args.davis_root:
        import dataclasses

        from fgvc_tpu.apis.test import TASK_CONFIGS

        base = report["tasks"].get("davis")
        modes = {
            "bf16_matmuls": dict(matmul_precision="default"),
            "pallas_bf16_yuv": dict(matmul_precision="default",
                                    upload_format="yuv420"),
            "coarse_decode": dict(decode_impl="coarse"),
        }
        report["fast_modes"] = {}
        for name, overrides in modes.items():
            cfg = dataclasses.replace(TASK_CONFIGS["davis"], **overrides)
            res = run_task(
                "davis", args.davis_root, checkpoint=args.checkpoint,
                max_videos=args.max_videos, test_cfg=cfg,
            )
            v = float(res["average_pts_within_thresh"])
            d = v - base["value"] if base else float("nan")
            report["fast_modes"][name] = {"value": v, "delta_vs_exact": d}
            print(f"[fast:{name}] <D = {v:.2f} (Δ vs exact {d:+.2f})")

    # ---- report -------------------------------------------------------- #
    md = ["| task | metric | ours | reference | Δ | within ±0.5 |",
          "|---|---|---|---|---|---|"]
    for task, key, value, expected, delta, within in rows:
        md.append(f"| {task} | {key} | {value:.2f} | {expected} "
                  f"| {delta:+.2f} | {'yes' if within else 'NO'} |")
    md_text = "\n".join(md)
    print(md_text)
    with open(os.path.join(args.output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=float)
    with open(os.path.join(args.output_dir, "report.md"), "w") as f:
        f.write(md_text + "\n")
    print(f"report written to {args.output_dir}/report.{{json,md}}")
    # exit nonzero when any task misses the ±0.5 reproduction bar, so a
    # wrapping script / CI can detect a failed reproduction
    if any(not within for *_, within in rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
