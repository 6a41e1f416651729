#!/usr/bin/env python
"""Calibrate the heatmap-peak visibility estimator on synthetic MOVi data.

The reference predicts no visibility at all (VanillaTracker returns
constant-zero visibilities, vanilla_tracker.py:227-303), so its AJ/OA are
degenerate.  TestConfig.visibility_mode='heatmap' predicts a point visible
at frame t when the propagated heatmap retains at least
`visibility_threshold` of its query-frame peak.  This study sweeps the
threshold on MOVi scenes with ground-truth occlusion
(tools/data/generate_movi.py) and writes docs/visibility_study.md.

The tracker runs ONCE per video; raw peak ratios are thresholded offline,
so the sweep costs one propagation pass regardless of grid size.

Usage:
  python tools/bench/visibility_study.py --data-root /root/data/movi_study \
      [--checkpoint runs/convergence_staged_r3/best] [--max-videos 10]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

THRESHOLDS = [
    0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
    # peak ratios compress toward 1 (attention latches onto the best
    # in-radius match and copies its value), so the high band is dense
    0.85, 0.9, 0.925, 0.95, 0.975, 0.99,
]


def collect_raw(tracker, sample):
    """One tracking pass; returns (traj, ratio, seen) with raw peak ratios
    (mirrors Tracker.track_points_collect before thresholding)."""
    import numpy as np

    disp = tracker.track_points_dispatch(
        sample["video"], sample["query_points"]
    )
    T, P = disp["T"], disp["P"]
    traj = np.zeros((T, P, 2), np.float32)
    ratio = np.zeros((T, P), np.float32)
    seen = np.zeros((T, P), bool)  # frames at/after the query frame
    for t, sel, coords in disp["pending"]:
        arr = np.array(coords)[: T - int(t), : len(sel)]
        traj[int(t):, sel] = arr[..., :2]
        # the tracker's own ratio definition — calibrate exactly what
        # track_points_collect will threshold
        ratio[int(t):, sel] = type(tracker).peak_ratios(arr)
        seen[int(t):, sel] = True
    return traj, ratio, seen


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or torch .pth; default = random init")
    p.add_argument("--max-videos", type=int, default=10)
    p.add_argument("--out", default="docs/visibility_study.md")
    p.add_argument("--label", default=None,
                   help="feature label for the report (default from ckpt)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax platform (env var is plugin-overridden)")
    p.add_argument("--input-size", type=int, default=None,
                   help="square input resolution override (e.g. 128 for a "
                        "CPU-feasible provisional calibration; the DAVIS "
                        "default is 256)")
    p.add_argument("--attention-impl", default=None,
                   help="TestConfig.attention_impl override (tiled on CPU)")
    args = p.parse_args()

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker
    from fgvc_tpu.datasets.tapvid import TapVidDataset

    over = {"visibility_mode": "heatmap"}
    if args.input_size:
        over["input_size"] = (args.input_size, args.input_size)
    if args.attention_impl:
        over["attention_impl"] = args.attention_impl
    cfg = dataclasses.replace(TASK_CONFIGS["davis"], **over)
    tracker = build_tracker(cfg, args.checkpoint)
    ds = TapVidDataset(
        args.data_root, subset_name="movi", input_size=cfg.input_size
    )
    n = min(args.max_videos, len(ds))

    raw = []
    for i in range(n):
        sample = ds[i]
        traj, ratio, seen = collect_raw(tracker, sample)
        raw.append((sample, traj, ratio, seen))
        print(f"[{i}] T={len(sample['video'])} done", flush=True)

    def score(vis_fn):
        results = [
            {
                "trajectories_gt": s["trajectories"],
                "visibilities_gt": s["visibilities"],
                "trajectories_pred": traj,
                "visibilities_pred": vis_fn(ratio, seen),
                "query_points": s["query_points"],
            }
            for s, traj, ratio, seen in raw
        ]
        return ds.evaluate(results)

    rows = [
        ("zeros (reference parity)", score(lambda r, s: np.zeros_like(s))),
        ("all-visible from query on", score(lambda r, s: s)),
    ]
    for thr in THRESHOLDS:
        rows.append(
            (f"peak ratio >= {thr}", score(lambda r, s, t=thr: s & (r >= t)))
        )
    # A ratio-vs-RUNNING-max variant was measured and is mathematically
    # identical to the query ratio: each propagation step is a convex
    # combination of value-buffer entries in [0, 1], so the peak can only
    # decay — the running max is always the query frame's 1.0 (verified:
    # all 'ratio/cummax >= t' rows equal 'peak ratio >= t' exactly in the
    # trained-features section of docs/visibility_study.md).

    # pick the threshold maximizing AJ (OA tiebreak).  OA is dominated by
    # the majority class (most TAP-Vid points are visible most frames, so
    # "always visible" already scores ~90 OA); average_jaccard is the
    # benchmark's occlusion-aware headline and only improves when the
    # predictor separates the classes.
    # promotable = the query-ratio family only (what visibility_mode=
    # 'heatmap' implements); cummax rows are informational
    best = max(
        rows[2:2 + len(THRESHOLDS)],
        key=lambda kv: (
            kv[1]["average_jaccard"], kv[1]["occlusion_accuracy"]
        ),
    )
    label = args.label or (
        "trained features" if args.checkpoint else "random-init features"
    )
    label += f" @ {cfg.input_size[0]}²"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    exists = os.path.exists(args.out)
    with open(args.out, "a") as f:
        if not exists:
            f.write(
                "# Heatmap-peak visibility calibration (synthetic MOVi"
                " 256²)\n\n"
                "Ground-truth occlusion from tools/data/generate_movi.py "
                "scenes; DAVIS TestConfig, visibility_mode='heatmap'. "
                "OA = occlusion accuracy, AJ = average jaccard, <D = "
                "average_pts_within_thresh (threshold-independent). The "
                "reference predicts no visibility (zeros row).\n"
            )
        f.write(f"\n## {label} ({n} scenes)\n\n")
        f.write("| predictor | OA | AJ | <D |\n|---|---|---|---|\n")
        for name, agg in rows:
            f.write(
                f"| {name} | {agg['occlusion_accuracy']:.3f} | "
                f"{agg['average_jaccard']:.3f} | "
                f"{agg['average_pts_within_thresh']:.3f} |\n"
            )
        f.write(
            f"\nBest threshold by AJ (OA is majority-class dominated): "
            f"**{best[0]}** (AJ {best[1]['average_jaccard']:.3f}, "
            f"OA {best[1]['occlusion_accuracy']:.3f}).\n"
        )
    print(json.dumps({name: agg for name, agg in rows}, default=float))


if __name__ == "__main__":
    main()
