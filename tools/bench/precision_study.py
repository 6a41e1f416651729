#!/usr/bin/env python
"""Precision/approximation-mode accuracy study on synthetic 256-square
MOVi shards (VERDICT round-2 task 3).

Runs the DAVIS TestConfig across affinity-precision, top-k, and decode
modes on TAP-Vid-format synthetic data (tools/data/generate_movi.py) and
records the <D / AJ deltas vs the reference-exact configuration, writing a
markdown table to docs/precision_study.md.  The fidelity bar from
BASELINE.md is 0.5 <D points: any mode within it is promotable.

Usage: python tools/bench/precision_study.py --data-root /root/data/movi_study
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--max-videos", type=int, default=10)
    p.add_argument("--out", default="docs/precision_study.md")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fgvc_tpu.apis.test import TASK_CONFIGS, run_task

    # (label, overrides) — pallas maps matmul_precision onto its
    # compute_dtype (highest=f32 6-pass, high=bf16x3, default=bf16);
    # the XLA tiled rows bound the approx-top-k recall loss.
    modes = [
        ("pallas f32 exact + upsample (reference-exact)", {}),
        ("pallas high (bf16x3) + upsample", {"matmul_precision": "high"}),
        ("pallas bf16 + upsample", {"matmul_precision": "default"}),
        ("pallas f32 + coarse decode", {"decode_impl": "coarse"}),
        ("pallas high + coarse decode",
         {"matmul_precision": "high", "decode_impl": "coarse"}),
        ("pallas bf16 + coarse decode",
         {"matmul_precision": "default", "decode_impl": "coarse"}),
        ("tiled f32 + approx topk",
         {"attention_impl": "tiled", "topk_impl": "approx"}),
        ("tiled bf16 + approx topk",
         {"attention_impl": "tiled", "topk_impl": "approx",
          "matmul_precision": "default"}),
        # upload wire format (ops/color.py YUV420 codec): halves the
        # host→device bytes; sources are JPEG (already 4:2:0)
        ("pallas f32 + yuv420 upload", {"upload_format": "yuv420"}),
        ("pallas bf16 + yuv420 upload",
         {"matmul_precision": "default", "upload_format": "yuv420"}),
    ]

    rows = []
    for label, ov in modes:
        cfg = dataclasses.replace(TASK_CONFIGS["davis"], **ov)
        t0 = time.time()
        res = run_task(
            "davis", args.data_root, max_videos=args.max_videos, test_cfg=cfg
        )
        rows.append(
            (
                label,
                res["average_pts_within_thresh"],
                res["average_jaccard"],
                time.time() - t0,
            )
        )
        print(
            f"{label}: <D={rows[-1][1]:.3f} AJ={rows[-1][2]:.3f} "
            f"({rows[-1][3]:.0f}s)",
            flush=True,
        )

    base_d = rows[0][1]
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# Precision / approximation mode study (synthetic MOVi 256²)\n\n"
            f"{args.max_videos} procedural scenes "
            "(tools/data/generate_movi.py --synthetic), 48 frames, 64 "
            "tracks each, random-init ResNet-18-d1 features, DAVIS "
            "TestConfig. <D = average_pts_within_thresh. The fidelity bar "
            "(BASELINE.md) is 0.5 <D points vs the exact mode.\n\n"
            "| mode | <D | Δ<D vs exact | AJ | promotable |\n"
            "|---|---|---|---|---|\n"
        )
        for label, d, aj, _ in rows:
            delta = d - base_d
            f.write(
                f"| {label} | {d:.3f} | {delta:+.3f} | {aj:.3f} | "
                f"{'yes' if abs(delta) <= 0.5 else 'NO'} |\n"
            )
    print(json.dumps({"rows": rows}, default=float))


if __name__ == "__main__":
    main()
