#!/usr/bin/env python
"""MOVi-style point-track data generator.

The reference extracts point-track training data from Kubric MOVi-B/F TFDS
renders (/root/reference/tools/data/kubric/movi_b.py:1-657, movi_f.py:1-1678,
generate_kubric.py) — a pipeline around `tensorflow_datasets` + pre-rendered
Blender scenes, neither of which exists in this environment.

This tool provides the same CAPABILITY two ways:

  * --movi-root <tfds dir>: documented external-dependency path — points at
    a Kubric TFDS download (refuses with instructions if absent),
  * --synthetic (default): a self-contained procedural generator: layered
    moving/rotating textured sprites with exact analytic point tracks and
    depth-ordered occlusion flags, written as TAP-Vid-format pickles
    (video uint8, points in [0,1], occluded bool) — consumable by
    TapVidDataset for train/val and by the PIPs-style trajectory datasets.

(The reference's tools/data/ytv/chain_flow.py is an EMPTY file — there is
no flow-chaining tool to reproduce.)
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def _texture(rng, h, w):
    """Smooth random RGB texture (sum of a few low-frequency waves)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(4):
        fx, fy = rng.uniform(0.02, 0.2, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(20, 60)
        for c in range(3):
            img[..., c] += amp * np.sin(fx * xx + fy * yy + phase[c])
    img += rng.uniform(60, 180, 3)
    return np.clip(img, 0, 255)


def _sprite_mask(kind, hw):
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    if kind == "ellipse":
        return ((yy - cy) / (h / 2)) ** 2 + ((xx - cx) / (w / 2)) ** 2 <= 1.0
    return np.ones((h, w), bool)  # box


def generate_scene(
    rng,
    num_frames: int = 24,
    size: int = 256,
    num_objects: int = 6,
    tracks_per_object: int = 8,
    background_tracks: int = 16,
    return_segmentation: bool = False,
):
    """One MOVi-style scene.

    Returns dict(video (T,H,W,3) uint8, points (P,T,2) in [0,1] (x,y),
    occluded (P,T) bool) — the TAP-Vid pickle record format.
    `return_segmentation` adds "segmentation" (T,H,W) uint8 instance
    labels (0 = background) from the same per-pixel depth ownership the
    occlusion flags use — a ground-truth mask stack for VOS-format
    rehearsal datasets (tools/rehearse_eval.py).
    """
    T, S = num_frames, size
    bg = _texture(rng, S, S).astype(np.uint8)
    # slow background pan (camera motion)
    bg_vel = rng.uniform(-1.5, 1.5, 2)

    objects = []
    for oi in range(num_objects):
        oh, ow = rng.integers(S // 8, S // 3, 2)
        kind = rng.choice(["box", "ellipse"])
        tex = _texture(rng, int(oh), int(ow)).astype(np.uint8)
        mask = _sprite_mask(kind, (int(oh), int(ow)))
        pos0 = rng.uniform(0, S, 2)          # top-left (y, x) at t=0
        vel = rng.uniform(-4, 4, 2)          # px/frame
        acc = rng.uniform(-0.15, 0.15, 2)
        objects.append(dict(tex=tex, mask=mask, pos0=pos0, vel=vel, acc=acc,
                            depth=oi))  # later objects are nearer

        # object-attached track points (valid mask pixels)
        ys, xs = np.nonzero(mask)
        sel = rng.choice(len(ys), size=min(tracks_per_object, len(ys)),
                         replace=False)
        objects[-1]["track_off"] = np.stack([ys[sel], xs[sel]], -1).astype(
            np.float32
        )

    # background tracks move with the pan
    bg_pts = rng.uniform(0, S, (background_tracks, 2)).astype(np.float32)

    video = np.zeros((T, S, S, 3), np.uint8)
    seg = np.zeros((T, S, S), np.uint8) if return_segmentation else None
    P = sum(len(o["track_off"]) for o in objects) + background_tracks
    points = np.zeros((P, T, 2), np.float32)   # (x, y) pixels
    occluded = np.ones((P, T), bool)

    for t in range(T):
        # integer pan so the rendered texture and the track/occlusion
        # labels describe the exact same pixels
        sy, sx = (np.floor(bg_vel * t)).astype(np.int64) % S
        frame = np.roll(bg, (int(sy), int(sx)), axis=(0, 1)).copy()
        owner = np.full((S, S), -1, np.int32)  # nearest object per pixel

        for oi, o in enumerate(objects):
            pos = o["pos0"] + o["vel"] * t + 0.5 * o["acc"] * t * t
            y0, x0 = int(round(pos[0])) % S, int(round(pos[1])) % S
            oh, ow = o["mask"].shape
            ys = (np.arange(oh) + y0) % S
            xs = (np.arange(ow) + x0) % S
            sub = np.ix_(ys, xs)
            m = o["mask"]
            frame[sub] = np.where(m[..., None], o["tex"], frame[sub])
            owner_region = owner[sub]
            owner[sub] = np.where(m, oi, owner_region)

        video[t] = frame
        if seg is not None:
            seg[t] = (owner + 1).astype(np.uint8)

        pi = 0
        for oi, o in enumerate(objects):
            pos = o["pos0"] + o["vel"] * t + 0.5 * o["acc"] * t * t
            y0, x0 = round(pos[0]) % S, round(pos[1]) % S
            for off in o["track_off"]:
                py, px = (y0 + off[0]) % S, (x0 + off[1]) % S
                points[pi, t] = (px, py)
                # visible iff this object still owns the pixel (not covered
                # by a nearer sprite)
                occluded[pi, t] = owner[int(py) % S, int(px) % S] != oi
                pi += 1
        for b in range(background_tracks):
            py = (bg_pts[b, 0] + sy) % S
            px = (bg_pts[b, 1] + sx) % S
            points[pi, t] = (px, py)
            occluded[pi, t] = owner[int(py) % S, int(px) % S] != -1
            pi += 1

    rec = {
        "video": video,
        "points": points / float(S),  # TAP-Vid convention: [0, 1]
        "occluded": occluded,
    }
    if seg is not None:
        rec["segmentation"] = seg
    return rec


def main():
    p = argparse.ArgumentParser(description="MOVi-style track data generator")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-scenes", type=int, default=4)
    p.add_argument("--num-frames", type=int, default=24)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--objects", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--movi-root", default=None,
                   help="Kubric MOVi TFDS directory (external dependency)")
    p.add_argument("--synthetic", action="store_true",
                   help="procedural scenes (the default behavior; flag "
                        "accepted for explicitness)")
    args = p.parse_args()

    if args.movi_root:
        raise SystemExit(
            "Kubric TFDS extraction needs `tensorflow_datasets` and a "
            "downloaded movi_b/movi_f render tree (see the reference's "
            "tools/data/kubric/download_movi.py). Neither is available in "
            "this environment; use --synthetic scenes instead."
        )

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.num_scenes):
        rec = generate_scene(
            rng, num_frames=args.num_frames, size=args.size,
            num_objects=args.objects,
        )
        path = os.path.join(args.out_dir, f"movi_synth_{i:05d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(rec, f)
        print(
            f"{path}: video {rec['video'].shape} points {rec['points'].shape}"
            f" visible {np.mean(~rec['occluded']):.2f}"
        )


if __name__ == "__main__":
    main()
