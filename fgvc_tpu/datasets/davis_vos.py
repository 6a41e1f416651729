"""DAVIS-2017 semi-supervised VOS dataset: mask propagation + J&F eval.

The reference evaluates VOS through HRVanillaTracker's mask-propagation path
(one-hot first-frame masks, per-frame .npy dumps scored by the DAVIS J&F code
— /root/reference/mmpt/models/trackers/vanilla_tracker.py:663,
mmpt/core/evaluation/metrics.py:231).  Here the propagation lives in
Tracker.track_masks and scoring in core/metrics/vos.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from fgvc_tpu.core.metrics.vos import aggregate_jf, evaluate_video_jf


class DavisVosDataset:
    """DAVIS 2017 val split: frames + first-frame annotation masks."""

    def __init__(
        self,
        root: str,
        split_list: Optional[str] = None,
        resolution: str = "480p",
        input_size=(480, 880),
    ):
        self.root = root
        self.resolution = resolution
        self.input_size = tuple(input_size)
        if split_list and not os.path.exists(split_list):
            raise FileNotFoundError(
                f"split list {split_list!r} does not exist — refusing to "
                "silently fall back to the default split"
            )
        if split_list and os.path.exists(split_list):
            if split_list.endswith(".json"):
                with open(split_list) as f:
                    self.sequences = sorted(json.load(f))
            else:
                with open(split_list) as f:
                    self.sequences = sorted(
                        ln.strip() for ln in f if ln.strip()
                    )
        else:
            seq_file = os.path.join(root, "ImageSets/2017/val.txt")
            if os.path.exists(seq_file):
                with open(seq_file) as f:
                    self.sequences = sorted(ln.strip() for ln in f if ln.strip())
            else:
                self.sequences = sorted(
                    os.path.basename(p)
                    for p in glob.glob(
                        os.path.join(root, "JPEGImages", resolution, "*")
                    )
                )

    def __len__(self):
        return len(self.sequences)

    def _frame_paths(self, seq: str) -> List[str]:
        return sorted(
            glob.glob(
                os.path.join(self.root, "JPEGImages", self.resolution, seq, "*.jpg")
            )
        )

    def _anno_paths(self, seq: str) -> List[str]:
        return sorted(
            glob.glob(
                os.path.join(self.root, "Annotations", self.resolution, seq, "*.png")
            )
        )

    def load_mask(self, path: str) -> np.ndarray:
        """Palette PNG -> integer label map."""
        from PIL import Image

        return np.array(Image.open(path))

    def __getitem__(self, idx: int) -> Dict:
        import cv2

        seq = self.sequences[idx]
        frame_paths = self._frame_paths(seq)
        frames = [
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in frame_paths
        ]
        original_shape = frames[0].shape[:2]
        H, W = self.input_size
        video = np.stack(
            [cv2.resize(f, (W, H), interpolation=cv2.INTER_LINEAR) for f in frames]
        )
        first_mask = self.load_mask(self._anno_paths(seq)[0])
        return {
            "sequence": seq,
            "video": video,                      # (T, H, W, 3) uint8
            "first_mask": first_mask,            # (H0, W0) labels at original
            "original_shape": original_shape,
            "num_objects": int(first_mask.max()),
        }

    def load_gt_masks(self, idx: int) -> np.ndarray:
        seq = self.sequences[idx]
        return np.stack([self.load_mask(p) for p in self._anno_paths(seq)])

    def score_video(self, idx: int, pred: np.ndarray):
        """Per-video DAVIS J&F stats — the single scoring implementation
        shared by evaluate() and apis/test.eval_vos.

        Protocol: drop frame 0 (given GT) and the LAST GT frame; when the
        prediction stack is truncated mid-video, only the truncation point
        bounds the range (the mid-video 'last' frame is still scored).
        Returns None when no frames remain (e.g. 2-frame smoke runs).
        """
        gt = self.load_gt_masks(idx)
        n = min(len(gt), len(pred))
        num_obj = int(gt.max())
        end = n - 1 if n == len(gt) else n
        if end <= 1:
            return None
        return evaluate_video_jf(gt[1:end], pred[1:end], num_obj)

    def evaluate(
        self,
        pred_masks_list: Sequence[np.ndarray],  # per video (T, H0, W0) labels
        indices=None,
        output_dir=None,
    ) -> Dict[str, float]:
        """DAVIS semi-supervised protocol: score frames [1:-1] per object.

        `indices` gives the dataset index of each prediction (sharded /
        truncated runs); defaults to 0..len(preds)-1.
        """
        if indices is None:
            indices = range(len(pred_masks_list))
        per_video = [
            s
            for idx, pred in zip(indices, pred_masks_list)
            if (s := self.score_video(idx, pred)) is not None
        ]
        results = aggregate_jf(per_video)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "result.txt"), "a") as f:
                for k, v in results.items():
                    f.write(f"{k}: {v}\n")
        return results
