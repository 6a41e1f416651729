#!/usr/bin/env python
"""Precompute per-pair RAFT flows for a frame dataset (YTV layout).

Equivalent of the reference's flow preparation
(/root/reference/tools/data/utils/prepare_youtube_flow.py): for every
video directory under --frames-root, run forward and backward RAFT flow
for each consecutive frame pair and write
``<out>/<video>/{forward,backward}_<frame>.flo`` (Middlebury format, the
files the reference's flow-reading pipelines consume) — or quantized
uint8 images with --format uint8 --bound 20 (its '0-1' mode).

The reference shards videos across GPUs by launching one DDP process per
card; here one process drives the chip and --shard I --num-shards N gives
the same horizontal split for multi-host runs:

    python tools/data/precompute_flow.py --frames-root .../JPEGImages_s256 \
        --out .../Flows_flo_s256 --checkpoint raft-things.pth --iters 30
"""

import argparse
import glob
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    p = argparse.ArgumentParser(description="precompute RAFT flows")
    p.add_argument("--frames-root", required=True,
                   help="dir of per-video frame dirs (jpg/png)")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="RAFT weights: torch .pth (official naming) or orbax")
    p.add_argument("--iters", type=int, default=30,
                   help="RAFT refinement iterations (reference uses 30)")
    p.add_argument("--format", default="flo", choices=["flo", "uint8"])
    p.add_argument("--bound", type=float, default=20.0,
                   help="clip for uint8 quantization (reference bound=20)")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from fgvc_tpu.apis.test import build_raft_tracker
    from fgvc_tpu.data_io.flo import write_flo

    tracker = build_raft_tracker(args.checkpoint, iters=args.iters)

    videos = sorted(
        d for d in glob.glob(os.path.join(args.frames_root, "*"))
        if os.path.isdir(d)
    )
    videos = videos[args.shard :: args.num_shards]
    if not videos:
        raise SystemExit(f"no video dirs under {args.frames_root}")

    import cv2

    n_pairs = 0
    for vid in videos:
        frames = sorted(
            glob.glob(os.path.join(vid, "*.jpg"))
            + glob.glob(os.path.join(vid, "*.png"))
        )
        if len(frames) < 2:
            continue
        out_dir = os.path.join(args.out, os.path.basename(vid))
        os.makedirs(out_dir, exist_ok=True)
        raw = np.stack([
            cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in frames
        ])
        # RAFT's stride-8 encoder needs 8-divisible frames (the reference
        # wraps this in InputPadder, prepare_youtube_flow.py:80-88): pad
        # bottom/right with edge replication, crop the flow back after —
        # otherwise real s256 frames (e.g. 256x455) would silently produce
        # misaligned 256x456 flows
        H, W = raw.shape[1:3]
        ph, pw = (-H) % 8, (-W) % 8
        if ph or pw:
            raw = np.pad(raw, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        imgs = tracker._preprocess(raw)
        for a, b in zip(range(len(frames) - 1), range(1, len(frames))):
            base = os.path.splitext(os.path.basename(frames[a]))[0]
            for mode, (i, j) in (("forward", (a, b)), ("backward", (b, a))):
                flow = np.asarray(
                    tracker._flow_fn(tracker.variables, imgs[i], imgs[j])
                )[:H, :W]
                if args.format == "flo":
                    write_flo(os.path.join(out_dir, f"{mode}_{base}.flo"), flow)
                else:
                    # the reference's '0-1' quantization: clip to ±bound,
                    # scale to 0..255, u/v in the first two channels
                    q = np.clip(flow, -args.bound, args.bound)
                    q = np.round((q + args.bound) * (255.0 / (2 * args.bound)))
                    img = np.full((*flow.shape[:2], 3), 128, np.uint8)
                    img[..., :2] = q.astype(np.uint8)
                    cv2.imwrite(os.path.join(out_dir, f"{mode}_{base}.jpg"), img)
            n_pairs += 1
        print(f"{os.path.basename(vid)}: {len(frames) - 1} pairs", flush=True)
    print(f"done: {len(videos)} videos, {n_pairs} pairs -> {args.out}")


if __name__ == "__main__":
    main()
