#!/usr/bin/env python
"""Build TAP-Vid-Kinetics per-video pickles from the DeepMind CSV + videos.

Equivalent of /root/reference/tools/data/generate_tapvid.py: joins the
released tapvid_kinetics annotation CSVs with locally downloaded Kinetics
clips and writes one ``{video_id}.pkl`` per video in the eval loader's
format ({'video': (T,H,W,3) uint8, 'points': (N,T,2) in [0,1],
'occluded': (N,T) bool}).

    python tools/data/generate_tapvid_kinetics.py \
        --csv tapvid_kinetics.csv --video-root <clips> --out all_split/
"""

import argparse
import csv
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def read_annotations(csv_path):
    """CSV rows: video_id, point_id, frame, x, y, occluded."""
    per_video = defaultdict(lambda: defaultdict(dict))
    with open(csv_path) as f:
        for row in csv.reader(f):
            if not row or row[0] == "video_id":
                continue
            vid, pid, frame = row[0], int(row[1]), int(row[2])
            x, y, occ = float(row[3]), float(row[4]), int(float(row[5]))
            per_video[vid][pid][frame] = (x, y, occ)
    return per_video


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--video-root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()

    import pickle

    import cv2

    os.makedirs(args.out, exist_ok=True)
    annos = read_annotations(args.csv)
    n_ok = 0
    for vid, points in annos.items():
        path = None
        for ext in (".mp4", ".mkv", ".webm"):
            cand = os.path.join(args.video_root, vid + ext)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            continue
        # decode through the pipeline stages (datasets/video_decode.py —
        # the loading.py equivalents) rather than an ad-hoc cv2 loop
        from fgvc_tpu.datasets.video_decode import VideoDecode, VideoInit

        res = VideoInit()({"filename": path})
        if res["total_frames"] == 0:
            continue
        res["frame_inds"] = np.arange(res["total_frames"])
        res = VideoDecode()(res)
        frames = [
            cv2.resize(img, (args.size, args.size)) for img in res["imgs"]
        ]
        video = np.stack(frames)
        T = len(frames)
        pids = sorted(points)
        pts = np.zeros((len(pids), T, 2), np.float32)
        occ = np.ones((len(pids), T), bool)
        for i, pid in enumerate(pids):
            for t, (x, y, o) in points[pid].items():
                if t < T:
                    pts[i, t] = (x, y)  # already normalized [0, 1]
                    occ[i, t] = bool(o)
        with open(os.path.join(args.out, f"{vid}.pkl"), "wb") as f:
            pickle.dump({"video": video, "points": pts, "occluded": occ}, f)
        n_ok += 1
    print(f"wrote {n_ok} video pickles to {args.out}")


if __name__ == "__main__":
    main()
