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
    """CSV join shared with the no-pickle eval path
    (fgvc_tpu/datasets/tapvid_kinetics.py — `--task kinetics
    --annotations csv` evaluates clips directly, making this tool
    optional)."""
    from fgvc_tpu.datasets.tapvid_kinetics import read_annotations as _ra

    return _ra(csv_path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True)
    parser.add_argument("--video-root", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()

    import pickle

    from fgvc_tpu.datasets.tapvid_kinetics import assemble_tracks, find_clip
    from fgvc_tpu.datasets.video_decode import decode_video

    os.makedirs(args.out, exist_ok=True)
    annos = read_annotations(args.csv)
    n_ok = 0
    for vid, points in annos.items():
        path = find_clip(args.video_root, vid)
        if path is None:
            continue
        # stream-decode + per-frame resize through the pipeline module
        # (datasets/video_decode.py): peak memory is one native frame +
        # the resized output, and the frame count is the decodable count
        try:
            video = decode_video(path, resize=(args.size, args.size))
        except IOError:
            continue
        pts, occ = assemble_tracks(points, video.shape[0])  # [0,1] coords
        with open(os.path.join(args.out, f"{vid}.pkl"), "wb") as f:
            pickle.dump({"video": video, "points": pts, "occluded": occ}, f)
        n_ok += 1
    print(f"wrote {n_ok} video pickles to {args.out}")


if __name__ == "__main__":
    main()
