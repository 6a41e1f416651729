"""TAP-Vid-Kinetics from the released annotation CSV + video clips.

The DeepMind release ships Kinetics as annotation CSVs plus the original
video clips; the reference requires materializing per-video pickles first
(/root/reference/tools/data/generate_tapvid.py).  This module shares that
CSV-join logic with our generator tool (tools/data/generate_tapvid_kinetics
.py) and additionally provides `TapVidKineticsVideoDataset`, which decodes
clips lazily per __getitem__ through the pipeline loading stages
(datasets/video_decode.py) — the pickle step becomes optional:

    python tools/test.py --task kinetics --data-root <clips> \
        --annotations tapvid_kinetics.csv
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from typing import Dict, Tuple

import numpy as np

from fgvc_tpu.datasets.tapvid import TapVidDataset

VIDEO_EXTS = (".mp4", ".mkv", ".webm")


def read_annotations(csv_path: str) -> Dict:
    """CSV rows: video_id, point_id, frame, x, y, occluded (x/y in [0,1]).

    Returns {video_id: {point_id: {frame: (x, y, occ)}}}.
    """
    per_video: Dict = defaultdict(lambda: defaultdict(dict))
    with open(csv_path) as f:
        for row in csv.reader(f):
            if not row or row[0] == "video_id":
                continue
            vid, pid, frame = row[0], int(row[1]), int(row[2])
            x, y, occ = float(row[3]), float(row[4]), int(float(row[5]))
            per_video[vid][pid][frame] = (x, y, occ)
    return per_video


def assemble_tracks(points: Dict, T: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-video CSV records -> ((N, T, 2) points in [0,1], (N, T) occluded).

    Frames without an annotation row stay occluded at (0, 0) — the same
    convention the generator has always written into the pickles.
    """
    pids = sorted(points)
    pts = np.zeros((len(pids), T, 2), np.float32)
    occ = np.ones((len(pids), T), bool)
    for i, pid in enumerate(pids):
        for t, (x, y, o) in points[pid].items():
            if t < T:
                pts[i, t] = (x, y)
                occ[i, t] = bool(o)
    return pts, occ


def find_clip(video_root: str, video_id: str):
    for ext in VIDEO_EXTS:
        cand = os.path.join(video_root, video_id + ext)
        if os.path.exists(cand):
            return cand
    return None


class TapVidKineticsVideoDataset(TapVidDataset):
    """TAP-Vid-Kinetics evaluated straight from CSV + clips (no pickles).

    Protocol-identical to `TapVidDataset(subset_name='kinetics')`: the
    parent's __getitem__/evaluate run unchanged; only sample discovery and
    `load_raw` differ (clip decode instead of a pickle read).
    """

    def __init__(
        self,
        video_root: str,
        annotations: str,
        query_mode: str = "first",
        input_size=(256, 256),
        eval_size=(256, 256),
    ):
        super().__init__(
            video_root, subset_name="kinetics", query_mode=query_mode,
            input_size=input_size, eval_size=eval_size,
        )
        per_video = read_annotations(annotations)
        self.samples = []  # (video_id, clip_path, per-point records)
        missing = 0
        for vid in sorted(per_video):
            path = find_clip(video_root, vid)
            if path is None:
                missing += 1
                continue
            self.samples.append((vid, path, per_video[vid]))
        if not self.samples:
            raise ValueError(
                f"no annotated clips found under {video_root!r} "
                f"({missing} CSV video ids have no clip file)"
            )
        self.missing_clips = missing

    def load_raw(self, idx: int) -> Dict:
        from fgvc_tpu.datasets.video_decode import decode_video

        _, path, points = self.samples[idx]
        # stream-decode with a per-frame resize: peak memory stays
        # T×input_size, not T×native (Kinetics clips can be 1080p), and T
        # is the DECODABLE count (container metadata often overreports;
        # CSV rows past the end drop, as the pickle generator always did)
        video = decode_video(
            path, resize=(self.input_size[1], self.input_size[0])
        )
        pts, occ = assemble_tracks(points, video.shape[0])
        return {"video": video, "points": pts, "occluded": occ}
