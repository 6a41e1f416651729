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
The occluder-compositing augmentation is round-2 work.
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
        seed: int = 0,
    ):
        self.N = n_points
        self.S = clip_len
        self.crop_size = tuple(crop_size)
        self.force_twice_vis = force_twice_vis
        self.train = train
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

        return {
            "rgbs": rgbs,
            "trajs": trajs_full,
            "visibles": visibles_full,
            "valids": valids_full,
        }
