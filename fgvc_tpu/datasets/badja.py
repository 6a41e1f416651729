"""BADJA animal-keypoint dataset — DAVIS full-res videos + SMAL joints.

Protocol from the reference BadjaDataset
(/root/reference/mmpt/datasets/badja_dataset.py:145):

  * per-animal JSON in ``{list_path}/joint_annotations/*.json``: a list of
    {image_path, segmentation_path, joints (y, x), visibility} entries on a
    subset of frames; the video spans first..last annotated frame with
    frames/segs read from ``{root}/JPEGImages/Full-Resolution`` /
    ``Annotations/Full-Resolution``,
  * the 20 annotated SMAL joint classes (badja_dataset.py:95-104),
  * frames resized to (320, 512); reference heatmaps drawn at 1/scale
    resolution with truncated σ=3 gaussians,
  * PCK@α with threshold α·sqrt(mask area) over visible joints.

Resize-protocol equivalence: the eval config's pipeline starts with
``Resize(scale=(-1, 320), keep_ratio=True)`` (configs/eval/base_data.py:29),
but ``prepare_test_data`` has ALREADY resized every frame to the fixed
(320, 512) via ``mmcv.imresize`` (badja_dataset.py:359) before the pipeline
runs.  ``rescale_size((512, 320), (inf, 320))`` yields scale factor
320/min(512,320) = 1.0 → (512, 320), i.e. the keep-ratio resize is an exact
identity on those frames.  The effective reference geometry therefore IS the
fixed (320, 512) resize that this class implements directly.

Note: the reference's IGNORE_ANIMALS list has a missing comma, so it is a
single string "cat_jump.jsontiger.json" that matches no file — effectively
no animal is ignored; we reproduce the effective behavior (none ignored).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from fgvc_tpu.core.metrics.pck import badja_pck
from fgvc_tpu.datasets.jhmdb import draw_keypoint_maps

# The 20 annotated SMAL joint-catalog indices (badja_dataset.py:95-104).
ANNOTATED_CLASSES = np.array(
    [8, 9, 10, 12, 13, 14, 15, 18, 19, 20, 22, 23, 24, 25, 28, 31, 32, 33, 35, 36]
)


class BadjaDataset:
    def __init__(
        self,
        root: str,
        list_path: str,
        size=(320, 512),
        sigma: float = 3.0,
        scale: int = 2,
        length: int = -1,
    ):
        self.root = root
        self.size = tuple(size)
        self.sigma = sigma
        self.scale = scale
        self.length = length
        self.videos: List[Dict] = []
        anno_dir = os.path.join(list_path, "joint_annotations")
        for name in sorted(os.listdir(anno_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(anno_dir, name)) as f:
                data = json.load(f)
            first = data[0]["segmentation_path"]
            if "extra_videos" in first:
                continue
            animal = first.split("/")[-2]
            lo = int(first.split("/")[-1].split(".")[0])
            hi = int(data[-1]["segmentation_path"].split("/")[-1].split(".")[0])
            by_image = {
                os.path.join(self.root, e["image_path"][6:]): e for e in data
            }
            frames, segs, joints, vis = [], [], [], []
            for fr in range(lo, hi + 1):
                img = os.path.join(
                    root, "JPEGImages/Full-Resolution/%s/%05d.jpg" % (animal, fr)
                )
                seg = os.path.join(
                    root, "Annotations/Full-Resolution/%s/%05d.png" % (animal, fr)
                )
                e = by_image.get(img)
                if e is not None:
                    seg = os.path.join(root, e["segmentation_path"][6:])
                    j = np.array(e["joints"])[ANNOTATED_CLASSES]
                    v = np.array(e["visibility"])[ANNOTATED_CLASSES]
                else:
                    j, v = None, None
                frames.append(img)
                segs.append(seg)
                joints.append(j)
                vis.append(v)
            if frames:
                self.videos.append(
                    dict(frames=frames, segs=segs, joints=joints, visibles=vis)
                )

    def __len__(self):
        return len(self.videos)

    def _load_video(self, idx: int):
        import cv2

        v = self.videos[idx]
        rgbs, segs = [], []
        for img_p, seg_p in zip(v["frames"], v["segs"]):
            rgb = cv2.cvtColor(cv2.imread(img_p), cv2.COLOR_BGR2RGB)
            seg = cv2.imread(seg_p, cv2.IMREAD_UNCHANGED)
            seg = cv2.resize(
                seg, (rgb.shape[1], rgb.shape[0]), interpolation=cv2.INTER_NEAREST
            )
            rgbs.append(rgb)
            segs.append(seg)
        return rgbs, segs, v["joints"], v["visibles"]

    def __getitem__(self, idx: int) -> Dict:
        import cv2

        rgbs, segs, joints, visibles = self._load_video(idx)
        h0, w0 = rgbs[0].shape[:2]
        H, W = self.size
        sy, sx = H / h0, W / w0

        frames = [cv2.resize(f, (W, H), interpolation=cv2.INTER_LINEAR) for f in rgbs]
        if self.length != -1:
            frames = frames[: self.length]

        # reference joints (frame 0) scaled to input, then to 1/scale grid;
        # BADJA stores (y, x)
        ref = joints[0].astype(np.float64).copy()
        ref[:, 0] *= sy
        ref[:, 1] *= sx
        coords_xy = np.stack([ref[:, 1], ref[:, 0]], axis=-1) / self.scale
        ref_maps = draw_keypoint_maps(
            coords_xy, H // self.scale, W // self.scale, sigma=self.sigma
        )

        return {
            "video": np.stack(frames),       # (T, 320, 512, 3) uint8
            "ref_maps": ref_maps,            # (160, 256, P)
            "original_shape": self.size,     # decode resolution
            "num_points": ref_maps.shape[-1],
        }

    def evaluate(
        self,
        pred_coords_list: Sequence[np.ndarray],  # per video (T, P, 2) xy @ size
        indices=None,
        output_dir=None,
    ) -> Dict[str, float]:
        """`indices` gives the dataset index of each prediction (sharded /
        truncated runs); defaults to 0..len(preds)-1."""
        import cv2

        if indices is None:
            indices = range(len(pred_coords_list))
        per_frame = []
        H, W = self.size
        for idx, pred in zip(indices, pred_coords_list):
            rgbs, segs, joints, visibles = self._load_video(idx)
            h0, w0 = rgbs[0].shape[:2]
            sy, sx = H / h0, W / w0
            segs = [
                cv2.resize(s, (W, H), interpolation=cv2.INTER_NEAREST)
                for s in segs
            ]
            n = len(rgbs) if self.length == -1 else min(self.length, len(rgbs))
            for t in range(n):
                if joints[t] is None:
                    continue
                j = joints[t].astype(np.float64).copy()
                j[:, 0] *= sy
                j[:, 1] *= sx
                gt_xy = np.stack([j[:, 1], j[:, 0]], axis=-1)
                per_frame.append(
                    {
                        "pred": pred[t],
                        "gt": gt_xy,
                        "visible": visibles[t],
                        "mask_area": (segs[t] > 0).sum(),
                    }
                )
        results = badja_pck(per_frame)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            with open(os.path.join(output_dir, "result.txt"), "a") as f:
                for k, v in results.items():
                    f.write(f"{k}: {v}\n")
        return results
