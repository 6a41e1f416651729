#!/usr/bin/env python
"""Point-tracking demo on a raw frame directory (tools/demo.py equivalent,
/root/reference/tools/demo.py).

    python tools/demo.py --frames <dir-of-jpgs> --checkpoint ckpt.pth \
        --points 30,40 120,200 --query-frame 0 --out demo.mp4

Frames are resized to 256², tracked with the label-propagation tracker, and
rendered with per-point trajectory tails.  With --grid N, an N×N grid of
query points is used instead of explicit --points.

--correspondence renders a frame-pair dense-match overlay (the notebook
demo path) instead of a trajectory video.

--mask <png> propagates a first-frame label mask through the video and
renders colorized mask overlays (the VOS path; no reference demo
equivalent — their VOS results are bare .npy dumps).

--video <file.mp4> decodes a video file instead of a frame directory,
through the pipeline's loading stages (datasets/video_decode.py — the
loading.py:81-1171 equivalents), with --stride / --max-frames.
"""

import argparse
import glob
import os


import numpy as np


def load_frames(frame_dir, size):
    import cv2

    paths = sorted(
        glob.glob(os.path.join(frame_dir, "*.jpg"))
        + glob.glob(os.path.join(frame_dir, "*.png"))
    )
    if not paths:
        raise SystemExit(f"no frames in {frame_dir}")
    frames = [
        cv2.resize(
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB),
            (size, size),
            interpolation=cv2.INTER_LINEAR,
        )
        for p in paths
    ]
    return np.stack(frames)


def load_video(video_path, size, stride=1, max_frames=0):
    """Decode a video file through the pipeline's loading stages
    (datasets/video_decode.py, the loading.py:81-1171 equivalents)."""
    import cv2

    from fgvc_tpu.datasets.video_decode import VideoDecode, VideoInit

    res = VideoInit()({"filename": video_path})
    if res["total_frames"] == 0:
        raise SystemExit(f"no decodable frames in {video_path}")
    inds = np.arange(0, res["total_frames"], max(stride, 1))
    if max_frames:
        inds = inds[:max_frames]
    res["frame_inds"] = inds
    res = VideoDecode()(res)
    return np.stack(
        [
            cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
            for img in res["imgs"]
        ]
    )


def main():
    parser = argparse.ArgumentParser(description="fgvc_tpu demo")
    parser.add_argument("--frames", default=None,
                        help="directory of jpg/png frames")
    parser.add_argument("--video", default=None,
                        help="video file (mp4/mkv/webm) decoded via the "
                             "pipeline's cv2 loading stages")
    parser.add_argument("--stride", type=int, default=1,
                        help="temporal stride when decoding --video")
    parser.add_argument("--max-frames", type=int, default=0,
                        help="cap decoded frames of --video (0 = all)")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--points", nargs="*", default=[])
    parser.add_argument("--grid", type=int, default=0)
    parser.add_argument("--query-frame", type=int, default=0)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out", default="demo.mp4")
    parser.add_argument("--correspondence", action="store_true")
    parser.add_argument(
        "--mask",
        default=None,
        metavar="PNG",
        help="first-frame integer label mask — propagate it (VOS) and "
             "render colorized overlays instead of point tracks",
    )
    parser.add_argument(
        "--backbone",
        default="resnet18_d1",
        help="eval encoder from the zoo (models/zoo.py) — see "
             "tools/test.py --backbone",
    )
    parser.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="force a jax platform (the JAX_PLATFORMS env var is overridden "
             "by device plugins in some environments; the config API wins)",
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker
    from fgvc_tpu.utils.visualize import (
        correspondence_overlay,
        draw_trajectory_tails,
        paint_point_track,
        save_video,
    )

    if bool(args.frames) == bool(args.video):
        raise SystemExit("give exactly one of --frames / --video")
    if args.video:
        video = load_video(
            args.video, args.size, stride=args.stride,
            max_frames=args.max_frames,
        )
    else:
        video = load_frames(args.frames, args.size)
    import dataclasses

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"], input_size=(args.size, args.size)
    )
    tracker = build_tracker(cfg, args.checkpoint, backbone=args.backbone)

    if args.correspondence:
        import jax
        import jax.numpy as jnp

        from fgvc_tpu.ops.attention import non_local_attention

        feats = tracker.extract_features(jnp.asarray(video[:2]))
        h, w = feats.shape[1:3]
        stride = args.size // h

        @jax.jit
        def best_match(f0, f1):
            aff = non_local_attention(f0, f1, temperature=0.001)
            return jnp.argmax(aff, axis=-1)  # argmax only crosses the link

        best = np.asarray(best_match(feats[0], feats[1]))
        rng = np.random.default_rng(0)
        idx = rng.choice(h * w, size=64, replace=False)
        matches = np.stack(
            [
                (idx % w) * stride,
                (idx // w) * stride,
                (best[idx] % w) * stride,
                (best[idx] // w) * stride,
            ],
            axis=-1,
        ).astype(np.float32)
        out_img = correspondence_overlay(video[0], video[1], matches)
        import cv2

        cv2.imwrite(args.out, cv2.cvtColor(out_img, cv2.COLOR_RGB2BGR))
        print(f"wrote {args.out}")
        return

    if args.mask:
        import cv2

        from fgvc_tpu.utils.visualize import mask_overlay

        mask0 = cv2.imread(args.mask, cv2.IMREAD_GRAYSCALE)
        if mask0 is None:
            raise SystemExit(f"cannot read mask {args.mask}")
        num_objects = int(mask0.max())
        if num_objects == 0:
            raise SystemExit(f"{args.mask} has no nonzero labels")
        masks = tracker.track_masks(
            video, mask0.astype(np.uint8),
            (video.shape[1], video.shape[2]), num_objects,
        )
        vid = mask_overlay(video, np.asarray(masks))
        save_video(vid, args.out)
        print(
            f"wrote {args.out} ({video.shape[0]} frames, "
            f"{num_objects} objects)"
        )
        return

    if args.grid:
        xs = np.linspace(16, args.size - 16, args.grid)
        pts = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    elif args.points:
        pts = np.array(
            [[float(v) for v in p.split(",")] for p in args.points]
        )
    else:
        raise SystemExit("give --points x,y ... or --grid N")

    query_points = np.concatenate(
        [np.full((len(pts), 1), args.query_frame, np.float32), pts], axis=1
    ).astype(np.float32)

    out = tracker.track_points(video, query_points)
    tracks = np.transpose(out["trajectories"], (1, 0, 2))  # (P, T, 2)
    vid = paint_point_track(video, tracks)
    vid = draw_trajectory_tails(vid, tracks)
    save_video(vid, args.out)
    print(f"wrote {args.out} ({video.shape[0]} frames, {len(pts)} points)")


if __name__ == "__main__":
    main()
