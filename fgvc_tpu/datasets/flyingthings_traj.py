"""PIPs-style FlyingThings++ multi-frame trajectory dataset.

Re-design of FlyingThingsDataset
(/root/reference/mmpt/datasets/flyingthingsplus/flyingthingsplus.py:82):
each sample is an S-frame clip with N point trajectories + visibility,
used by trajectory-supervised training configs.

Data layout (the PIPs FlyingThings++ release):
  {root}/frames_cleanpass_webp/{dset}/{A,B,C}/{seq}/{left,right}/*.webp
  {root}/trajs_{version}/{dset}/{A,B,C}/{seq}/{left,right}/trajs_at_{i}.npz
    with key 'trajs' of shape (S, N, 2) (x, y).

Protocol reproduced: out-of-bounds points become invisible; tracks must be
visible at frame 0 and at least once more ('force_twice_vis'); tracks are
subsampled/padded to exactly N with a valid mask; random (or center) crop.

Augmentations (use_augs=True), mirroring the PIPs pipeline:
  * eraser transform — mean-color rectangles on frames > 0 that mark
    covered tracks invisible (flyingthingsplus.py:515-545),
  * occluder compositing — masked patches pasted over the clip with
    per-frame motion; covered tracks become invisible
    (flyingthingsplus.py:422-513; the reference pastes pre-extracted
    occluder sprites from other videos — here the sprites are elliptical
    patches cut from OTHER FRAMES of the same clip, which needs no
    occluders_<ver> side tree),
  * photometric jitter + blur via datasets/transforms.py.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


class FlyingThingsTrajDataset:
    def __init__(
        self,
        root: str,
        dset: str = "TRAIN",
        subset: str = "all",
        n_points: int = 256,
        clip_len: int = 8,
        crop_size: Tuple[int, int] = (368, 496),
        version: str = "ad",
        force_twice_vis: bool = True,
        train: bool = True,
        use_augs: bool = False,
        eraser_prob: float = 0.5,
        occluder_prob: float = 0.5,
        max_occluders: int = 3,
        color_prob: float = 0.2,
        blur_prob: float = 0.2,
        seed: int = 0,
    ):
        self.N = n_points
        self.S = clip_len
        self.crop_size = tuple(crop_size)
        self.force_twice_vis = force_twice_vis
        self.train = train
        self.use_augs = use_augs
        self.eraser_prob = eraser_prob
        self.occluder_prob = occluder_prob
        self.max_occluders = max_occluders
        self.color_prob = color_prob
        self.blur_prob = blur_prob
        self.rng = np.random.default_rng(seed)

        subsets = ["A", "B", "C"] if subset == "all" else [subset]
        self.samples: List[Dict] = []
        for sub in subsets:
            rgb_root = os.path.join(root, "frames_cleanpass_webp", dset, sub)
            traj_root = os.path.join(root, f"trajs_{version}", dset, sub)
            for seq_dir in sorted(glob.glob(os.path.join(traj_root, "*"))):
                seq = os.path.basename(seq_dir)
                for lr in ("left", "right"):
                    for start in range(4):
                        fn = os.path.join(seq_dir, lr, f"trajs_at_{start}.npz")
                        if os.path.isfile(fn) and os.path.getsize(fn) > 1000:
                            self.samples.append(
                                dict(
                                    rgb=os.path.join(rgb_root, seq, lr),
                                    traj=fn,
                                    start=start,
                                )
                            )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        s = self.samples[idx]
        trajs = dict(np.load(s["traj"], allow_pickle=True))["trajs"]
        trajs = np.asarray(trajs, np.float32)[: self.S]  # (S, N0, 2)

        frames = sorted(
            glob.glob(os.path.join(s["rgb"], "*.webp"))
            + glob.glob(os.path.join(s["rgb"], "*.png"))
        )[s["start"] : s["start"] + self.S]
        rgbs = np.stack(
            [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in frames]
        )
        return self.package(rgbs, trajs)

    # ------------------------------------------------------------------ #
    def package(
        self, rgbs: np.ndarray, trajs: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Crop + visibility/validity bookkeeping (flyingthingsplus.py:256-341).

        rgbs (S, H, W, 3) uint8; trajs (S, N0, 2) — returns fixed-size
        rgbs (S, ch, cw, 3), trajs (S, N, 2), visibles (S, N), valids (S, N).
        """
        S, H, W = rgbs.shape[:3]
        ch, cw = self.crop_size
        ch, cw = min(ch, H), min(cw, W)
        if self.train:
            y0 = int(self.rng.integers(0, H - ch + 1))
            x0 = int(self.rng.integers(0, W - cw + 1))
        else:
            y0, x0 = (H - ch) // 2, (W - cw) // 2
        rgbs = rgbs[:, y0 : y0 + ch, x0 : x0 + cw]
        trajs = trajs.copy()
        trajs[..., 0] -= x0
        trajs[..., 1] -= y0

        visibles = np.ones(trajs.shape[:2], np.float32)
        oob = (
            (trajs[..., 0] < 0)
            | (trajs[..., 0] > cw - 1)
            | (trajs[..., 1] < 0)
            | (trajs[..., 1] > ch - 1)
        )
        visibles[oob] = 0.0

        keep = visibles[0] > 0
        if self.force_twice_vis and trajs.shape[0] > 1:
            keep &= visibles[1:].sum(axis=0) > 0
        trajs = trajs[:, keep]
        visibles = visibles[:, keep]

        n_cur = trajs.shape[1]
        take = min(n_cur, self.N)
        if self.train and n_cur > 0:
            order = self.rng.permutation(n_cur)[:take]
        else:
            order = np.arange(take)

        trajs_full = np.zeros((self.S, self.N, 2), np.float32)
        visibles_full = np.zeros((self.S, self.N), np.float32)
        valids_full = np.zeros((self.S, self.N), np.float32)
        trajs_full[: trajs.shape[0], :take] = trajs[:, order]
        visibles_full[: trajs.shape[0], :take] = visibles[:, order]
        valids_full[:, :take] = 1.0

        if getattr(self, "use_augs", False) and self.train:
            rgbs, visibles_full = self.add_eraser_augs(
                rgbs, trajs_full, visibles_full
            )
            rgbs, visibles_full = self.add_occluder_augs(
                rgbs, trajs_full, visibles_full
            )
            rgbs = self.add_photometric_augs(rgbs)

        return {
            "rgbs": rgbs,
            "trajs": trajs_full,
            "visibles": visibles_full,
            "valids": valids_full,
        }

    # ------------------------------------------------------------------ #
    # PIPs augmentations
    # ------------------------------------------------------------------ #
    def add_eraser_augs(self, rgbs, trajs, visibles, bounds=(20, 100)):
        """Mean-color rectangles on frames > 0; covered tracks become
        invisible (flyingthingsplus.py:515-545)."""
        rgbs = np.array(rgbs, np.float32)
        S, H, W = rgbs.shape[:3]
        for s in range(1, S):
            if self.rng.random() >= self.eraser_prob:
                continue
            mean_color = rgbs[s].reshape(-1, 3).mean(axis=0)
            for _ in range(int(self.rng.integers(1, 3))):
                xc = int(self.rng.integers(0, W))
                yc = int(self.rng.integers(0, H))
                dx = int(self.rng.integers(*bounds))
                dy = int(self.rng.integers(*bounds))
                x0, x1 = max(xc - dx // 2, 0), min(xc + dx // 2, W - 1)
                y0, y1 = max(yc - dy // 2, 0), min(yc + dy // 2, H - 1)
                rgbs[s, y0:y1, x0:x1] = mean_color
                covered = (
                    (trajs[s, :, 0] >= x0)
                    & (trajs[s, :, 0] < x1)
                    & (trajs[s, :, 1] >= y0)
                    & (trajs[s, :, 1] < y1)
                )
                visibles[s, covered] = 0.0
        return rgbs.astype(np.uint8), visibles

    def add_occluder_augs(self, rgbs, trajs, visibles):
        """Composite moving elliptical sprites over the clip; tracks under a
        sprite become invisible (flyingthingsplus.py:422-513 with in-clip
        sprites instead of the pre-extracted occluder side tree)."""
        rgbs = np.array(rgbs, np.float32)
        S, H, W = rgbs.shape[:3]
        if self.rng.random() >= self.occluder_prob:
            return rgbs.astype(np.uint8), visibles
        for _ in range(int(self.rng.integers(1, self.max_occluders + 1))):
            oh = int(self.rng.integers(H // 8, H // 3))
            ow = int(self.rng.integers(W // 8, W // 3))
            src_s = int(self.rng.integers(0, S))
            sy = int(self.rng.integers(0, H - oh))
            sx = int(self.rng.integers(0, W - ow))
            sprite = rgbs[src_s, sy : sy + oh, sx : sx + ow].copy()
            yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
            mask = (
                ((yy - (oh - 1) / 2) / (oh / 2)) ** 2
                + ((xx - (ow - 1) / 2) / (ow / 2)) ** 2
                <= 1.0
            )
            pos = self.rng.uniform([0, 0], [H - oh, W - ow])
            vel = self.rng.uniform(-4, 4, 2)
            for s in range(S):
                y0 = int(np.clip(pos[0] + vel[0] * s, 0, H - oh))
                x0 = int(np.clip(pos[1] + vel[1] * s, 0, W - ow))
                region = rgbs[s, y0 : y0 + oh, x0 : x0 + ow]
                rgbs[s, y0 : y0 + oh, x0 : x0 + ow] = np.where(
                    mask[..., None], sprite, region
                )
                tx = trajs[s, :, 0] - x0
                ty = trajs[s, :, 1] - y0
                inside = (tx >= 0) & (tx < ow) & (ty >= 0) & (ty < oh)
                ti = np.nonzero(inside)[0]
                if len(ti):
                    on_sprite = mask[
                        ty[ti].astype(int), tx[ti].astype(int)
                    ]
                    visibles[s, ti[on_sprite]] = 0.0
        return rgbs.astype(np.uint8), visibles

    def add_photometric_augs(self, rgbs):
        """Color jitter + blur via the transforms zoo
        (flyingthingsplus.py:546-556)."""
        from fgvc_tpu.datasets.transforms import ColorJitter, RandomGaussianBlur

        res = {"imgs": [f for f in np.asarray(rgbs, np.float32)]}
        if self.rng.random() < self.color_prob:
            res = ColorJitter()(res)
        if self.rng.random() < self.blur_prob:
            res = RandomGaussianBlur(p=1.0)(res)
        return np.clip(np.stack(res["imgs"]), 0, 255).astype(np.uint8)
