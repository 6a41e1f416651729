"""Mixed training dataset: YouTube-VOS frame pairs + FlyingThings3D flow pairs.

Re-design of Flyingthings_ytv_dataset_rgb
(/root/reference/mmpt/datasets/flyingthingsplus/flyingthings_ytv_dataset.py:31):

  * unlabeled branch: 2-frame clips randomly sampled from YouTube-VOS videos
    (json video index, JPEG frame dirs), augmented with RandomResizedCrop
    (area 0.6-1.0, aspect 1.5-2.0) → resize 256² → random flip → gaussian
    blur (p=0.8) → RGB→Lab → normalize,
  * supervised branch: FlyingThings3D cleanpass frame pairs with PFM
    forward/backward flow, frame order swapped so the correlation target is
    frame2→frame1 (the reference's convention), random 256² crop (images
    and flows cropped together) → blur → Lab → normalize,
  * each __getitem__ returns the 4-key dict the mixed loss consumes:
    imgs (2, H, W, 3), imgs_sup (2, H, W, 3), flow (H, W, 2),
    flow_back (H, W, 2) — float32, Lab-normalized, channels-last.

`SyntheticMixedDataset` generates the same protocol from noise for smoke
tests and dry runs when no data is mounted.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np


# single source of truth for the Lab normalization (ops/color.py)
from fgvc_tpu.ops.color import LAB_MEAN as _LAB_MEAN, LAB_STD as _LAB_STD

LAB_MEAN = np.array(_LAB_MEAN, np.float32)
LAB_STD = np.array(_LAB_STD, np.float32)


# --------------------------------------------------------------------- #
# readers
# --------------------------------------------------------------------- #
def read_pfm(path: str) -> np.ndarray:
    """Read a PFM file (FlyingThings3D optical flow format)."""
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").strip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"not a PFM file: {path}")
        color = header == "PF"
        dims = f.readline().decode("latin-1")
        while dims.startswith("#"):
            dims = f.readline().decode("latin-1")
        m = re.match(r"^(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM dims in {path}")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").strip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    data = data.reshape(shape)
    return np.flipud(data).copy()


def read_flow_pfm(path: str) -> np.ndarray:
    """(H, W, 2) flow from a FlyingThings PFM (third channel dropped)."""
    data = read_pfm(path)
    if data.ndim == 3:
        data = data[:, :, :2]
    return data.astype(np.float32)


# --------------------------------------------------------------------- #
# augmentation pipeline (host-side numpy/cv2, like the reference's)
# --------------------------------------------------------------------- #
def rgb_to_lab_normalized(img_uint8: np.ndarray) -> np.ndarray:
    import cv2

    lab = cv2.cvtColor(np.float32(img_uint8) / 255.0, cv2.COLOR_RGB2Lab)
    return (lab - LAB_MEAN) / LAB_STD


def random_resized_crop_params(
    rng: np.random.Generator,
    h: int,
    w: int,
    area_range=(0.6, 1.0),
    aspect_range=(1.5, 2.0),
) -> Tuple[int, int, int, int]:
    """(y, x, ch, cw) crop with area/aspect sampling (augmentation.py:198)."""
    for _ in range(10):
        area = rng.uniform(*area_range) * h * w
        aspect = rng.uniform(*aspect_range)
        cw = int(round(np.sqrt(area * aspect)))
        ch = int(round(np.sqrt(area / aspect)))
        if rng.random() < 0.5:
            cw, ch = ch, cw
        if cw <= w and ch <= h:
            y = rng.integers(0, h - ch + 1)
            x = rng.integers(0, w - cw + 1)
            return int(y), int(x), ch, cw
    s = min(h, w)
    return (h - s) // 2, (w - s) // 2, s, s


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    import cv2

    k = 2 * int(4 * sigma + 0.5) + 1
    return cv2.GaussianBlur(img, (k, k), sigma)


class UnsupPipeline:
    """YTV branch: RandomResizedCrop → resize → flip → blur → Lab-norm."""

    def __init__(self, out_size: int = 256, blur_p: float = 0.8):
        self.out_size = out_size
        self.blur_p = blur_p

    def __call__(self, frames: List[np.ndarray], rng: np.random.Generator):
        import cv2

        h, w = frames[0].shape[:2]
        y, x, ch, cw = random_resized_crop_params(rng, h, w)
        flip = rng.random() < 0.5
        do_blur = rng.random() < self.blur_p
        sigma = rng.uniform(0.1, 2.0) if do_blur else 0.0
        out = []
        for f in frames:
            f = f[y : y + ch, x : x + cw]
            f = cv2.resize(
                f, (self.out_size, self.out_size), interpolation=cv2.INTER_LINEAR
            )
            if flip:
                f = f[:, ::-1]
            if do_blur:
                f = gaussian_blur(f, sigma)
            out.append(rgb_to_lab_normalized(np.ascontiguousarray(f)))
        return np.stack(out)  # (2, S, S, 3)


class SupPipeline:
    """FlyingThings branch: random 256² crop of frames AND flows → blur →
    Lab-norm (flow values are not rescaled — crop preserves pixel units)."""

    def __init__(self, crop: int = 256, blur_p: float = 0.8):
        self.crop = crop
        self.blur_p = blur_p

    def __call__(self, frames, flow, flow_back, rng: np.random.Generator):
        h, w = frames[0].shape[:2]
        c = self.crop
        y = int(rng.integers(0, max(h - c, 0) + 1))
        x = int(rng.integers(0, max(w - c, 0) + 1))
        do_blur = rng.random() < self.blur_p
        sigma = rng.uniform(0.1, 2.0) if do_blur else 0.0
        imgs = []
        for f in frames:
            f = f[y : y + c, x : x + c]
            if do_blur:
                f = gaussian_blur(f, sigma)
            imgs.append(rgb_to_lab_normalized(np.ascontiguousarray(f)))
        return (
            np.stack(imgs),
            flow[y : y + c, x : x + c].astype(np.float32),
            flow_back[y : y + c, x : x + c].astype(np.float32),
        )


# --------------------------------------------------------------------- #
# datasets
# --------------------------------------------------------------------- #
class FlyingThingsYtvDataset:
    """The mixed training set: each sample pairs one YTV clip with one
    FlyingThings flow pair (flyingthings_ytv_dataset.py:106-169)."""

    def __init__(
        self,
        ytv_root: str,
        flyingthings_root: str,
        ytv_list: Optional[str] = None,
        crop: int = 256,
        seed: int = 0,
    ):
        self.crop = crop
        self.unsup_pipe = UnsupPipeline(out_size=crop)
        self.sup_pipe = SupPipeline(crop=crop)
        # per-__getitem__ rng seeded by (seed, idx) — stateless per call,
        # so make_batches(skip=) resume is step-exact on this real-data
        # path too (a shared mutable Generator would replay the
        # pre-preemption augmentation stream onto post-resume indices)
        self.seed = seed

        # YTV video index: json {vid: [frame files]} (the reference's
        # data_info/youtube2018_train.json — values are the EXACT frames to
        # train on, every 5th frame of the video; the reference joins them
        # verbatim, flyingthings_ytv_dataset.py:62-68, so a directory that
        # holds all frames must NOT widen the pair distribution here),
        # {videos: {vid: ...}} official meta, or a directory scan fallback
        self.ytv_videos: List[List[str]] = []
        prefix = os.path.join(ytv_root, "train/JPEGImages_s256")
        if ytv_list and os.path.exists(ytv_list):
            with open(ytv_list) as f:
                meta = json.load(f)
            vids = meta.get("videos", meta)
            for vid in sorted(vids):
                entry = vids[vid] if isinstance(vids, dict) else None
                if isinstance(entry, (list, tuple)) and entry:
                    frames = [os.path.join(prefix, vid, f) for f in entry]
                    missing = [f for f in frames if not os.path.exists(f)]
                    if missing:
                        # fail at index time with an actionable message, not
                        # hours into training when the loader hits the path
                        raise FileNotFoundError(
                            f"{ytv_list} lists {len(missing)} frame(s) for "
                            f"video {vid!r} that are missing under {prefix} "
                            f"(first: {missing[0]}) — incomplete download "
                            "or wrong --ytv-root?"
                        )
                else:
                    frames = sorted(
                        glob.glob(os.path.join(prefix, vid, "*.jpg"))
                    )
                if len(frames) >= 2:
                    self.ytv_videos.append(frames)
        else:
            for vdir in sorted(glob.glob(os.path.join(prefix, "*"))):
                frames = sorted(glob.glob(os.path.join(vdir, "*.jpg")))
                if len(frames) >= 2:
                    self.ytv_videos.append(frames)

        # FlyingThings pairs: cleanpass frames + into_future/into_past PFM
        self.fly_pairs: List[Dict] = []
        img_root = os.path.join(flyingthings_root, "frames_cleanpass/TRAIN")
        flow_root = os.path.join(flyingthings_root, "optical_flow/TRAIN")
        for img_dir in sorted(glob.glob(os.path.join(img_root, "*/*/left"))):
            rel = os.path.relpath(img_dir, img_root)  # e.g. A/0000/left
            scene = os.path.dirname(rel)
            frames = sorted(
                glob.glob(os.path.join(img_dir, "*.png"))
                + glob.glob(os.path.join(img_dir, "*.webp"))
            )
            for i in range(len(frames) - 1):
                n0 = int(os.path.splitext(os.path.basename(frames[i]))[0])
                n1 = n0 + 1
                fwd = os.path.join(
                    flow_root, scene, "into_future/left",
                    f"OpticalFlowIntoFuture_{n0:04d}_L.pfm",
                )
                bwd = os.path.join(
                    flow_root, scene, "into_past/left",
                    f"OpticalFlowIntoPast_{n1:04d}_L.pfm",
                )
                if os.path.exists(fwd) and os.path.exists(bwd):
                    self.fly_pairs.append(
                        dict(f0=frames[i], f1=frames[i + 1], fwd=fwd, bwd=bwd)
                    )

        if not self.ytv_videos:
            raise FileNotFoundError(
                f"no YouTube-VOS videos found under {ytv_root!r}"
            )
        if not self.fly_pairs:
            raise FileNotFoundError(
                f"no FlyingThings flow pairs found under {flyingthings_root!r}"
            )

    def __len__(self):
        return len(self.ytv_videos)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        # idx is the raw draw counter (make_batches does NOT mod by len);
        # identity cycles through the video list, randomness is seeded by
        # the raw counter so epochs see fresh clip starts / crops / pairs
        rng = np.random.default_rng((self.seed, idx))
        frames = self.ytv_videos[idx % len(self.ytv_videos)]
        t0 = int(rng.integers(0, len(frames) - 1))
        clip = [
            cv2.cvtColor(cv2.imread(frames[t]), cv2.COLOR_BGR2RGB)
            for t in (t0, t0 + 1)
        ]
        imgs = self.unsup_pipe(clip, rng)

        pair = self.fly_pairs[int(rng.integers(0, len(self.fly_pairs)))]
        f0 = cv2.cvtColor(cv2.imread(pair["f0"]), cv2.COLOR_BGR2RGB)
        f1 = cv2.cvtColor(cv2.imread(pair["f1"]), cv2.COLOR_BGR2RGB)
        fwd = read_flow_pfm(pair["fwd"])
        bwd = read_flow_pfm(pair["bwd"])
        # Reference convention (flyingthings_ytv_dataset.py:94-97,
        # into_past branch): frames stacked [f1, f0] so the student's
        # correlation maps frame2 → frame1; 'flow' = IntoFuture@f0 (maps
        # stacked index 1 → index 0), 'flow_back' = IntoPast@f1.
        imgs_sup, flow, flow_back = self.sup_pipe([f1, f0], fwd, bwd, rng)

        return {
            "imgs": imgs.astype(np.float32),
            "imgs_sup": imgs_sup.astype(np.float32),
            "flow": flow,
            "flow_back": flow_back,
        }


def _smooth_texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random RGB texture (sum of low-frequency waves) — locally
    discriminative, like natural image patches."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(0.02, 0.25, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(15, 50)
        for c in range(3):
            img[..., c] += amp * np.sin(fx * xx + fy * yy + phase[c])
    img += rng.uniform(60, 180, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


class StructuredSyntheticMixedDataset:
    """Procedural mixed-training data with REAL correspondence signal.

    Frame pairs are textured scenes (smooth background + textured square
    sprites) under known per-layer translations, so:
      * the reconstruction branch sees photometrically consistent motion
        (unlike `SyntheticMixedDataset`'s iid noise, which is
        unreconstructable by design),
      * the supervised branch gets exact dense flow (piecewise-constant per
        layer), in the reference's stacking convention
        (flyingthings_ytv_dataset.py:94-97 into_past: imgs_sup=[f1, f0],
        flow=IntoFuture@f0, flow_back=IntoPast@f1).

    This is the convergence-evidence dataset: losses falling on it mean the
    model is learning correspondences, not memorizing noise.
    """

    def __init__(
        self,
        crop: int = 256,
        length: int = 64,
        seed: int = 0,
        max_shift: int = 8,
        n_sprites: int = 2,
    ):
        self.crop = crop
        self.length = length
        self.seed = seed
        self.max_shift = max_shift
        self.n_sprites = n_sprites

    def __len__(self):
        return self.length

    def _scene_pair(self, rng: np.random.Generator):
        s, m = self.crop, self.max_shift
        big = _smooth_texture(rng, s + 2 * m, s + 2 * m)
        d = rng.integers(-m, m + 1, 2)  # background motion (dx, dy)
        f0 = big[m : m + s, m : m + s].copy()
        f1 = big[
            m - d[1] : m - d[1] + s, m - d[0] : m - d[0] + s
        ].copy()
        flow = np.tile(d.astype(np.float32), (s, s, 1))
        flow_back = -flow.copy()
        for _ in range(self.n_sprites):
            sz = int(rng.integers(s // 8, s // 4))
            tex = _smooth_texture(rng, sz, sz)
            y0 = int(rng.integers(m, s - sz - m))
            x0 = int(rng.integers(m, s - sz - m))
            ds = rng.integers(-m, m + 1, 2)
            y1, x1 = y0 + int(ds[1]), x0 + int(ds[0])
            f0[y0 : y0 + sz, x0 : x0 + sz] = tex
            f1[y1 : y1 + sz, x1 : x1 + sz] = tex
            flow[y0 : y0 + sz, x0 : x0 + sz] = ds
            flow_back[y1 : y1 + sz, x1 : x1 + sz] = -ds
        return f0, f1, flow, flow_back

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        idx %= self.length  # raw draw counter → cycle `length` scenes
        rng = np.random.default_rng(self.seed + idx)
        f0, f1, _, _ = self._scene_pair(rng)  # unsup clip (order free)
        imgs = np.stack(
            [rgb_to_lab_normalized(f0), rgb_to_lab_normalized(f1)]
        )
        g0, g1, flow, flow_back = self._scene_pair(rng)
        imgs_sup = np.stack(
            [rgb_to_lab_normalized(g1), rgb_to_lab_normalized(g0)]
        )
        return {
            "imgs": imgs.astype(np.float32),
            "imgs_sup": imgs_sup.astype(np.float32),
            "flow": flow.astype(np.float32),
            "flow_back": flow_back.astype(np.float32),
        }


class MoviMixedDataset(StructuredSyntheticMixedDataset):
    """Mixed-training samples whose UNLABELED pair comes from MOVi-style
    scene videos (tools/data/generate_movi.py pickles — the eval domain)
    while the supervised pair + exact flow stay procedural (the
    flow-labeled source domain).  The synthetic analogue of the reference
    recipe — reconstruction on YTV video crops, supervision on synthetic
    FlyingThings, adversarial correlation alignment between the two
    domains (/root/reference/mmpt/datasets/flyingthings_ytv_dataset.py:
    imgs from the video branch, imgs_sup/flow from the flow branch).
    Used by the round-4 mixed-objective signal study
    (docs/convergence.md): train the rec branch IN the eval domain and
    measure whether the cross-domain sup/adversarial branches help or
    hurt held-out-scene validation."""

    def __init__(
        self,
        movi_dir: str,
        crop: int = 256,
        length: int = 64,
        seed: int = 0,
        max_shift: int = 8,
        n_sprites: int = 2,
        max_gap: int = 4,
    ):
        super().__init__(crop, length, seed, max_shift, n_sprites)
        import pickle

        self.clips: List[np.ndarray] = []
        for p in sorted(glob.glob(os.path.join(movi_dir, "*.pkl"))):
            with open(p, "rb") as f:
                v = pickle.load(f)["video"]  # (T,H,W,3) u8
            if v.ndim != 4 or v.shape[-1] != 3 or len(v) < 2:
                raise ValueError(
                    f"{p}: expected video (T>=2, H, W, 3), got {v.shape}"
                )
            self.clips.append(v)
        if not self.clips:
            raise FileNotFoundError(f"no MOVi pickles under {movi_dir}")
        self.max_gap = max_gap

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        idx %= self.length  # raw draw counter → cycle `length` samples
        rng = np.random.default_rng(self.seed + idx)
        v = self.clips[int(rng.integers(len(self.clips)))]
        gap = int(rng.integers(1, min(self.max_gap, len(v) - 1) + 1))
        t = int(rng.integers(0, len(v) - gap))
        f0, f1 = v[t], v[t + gap]
        h, w = f0.shape[:2]
        if h < self.crop or w < self.crop:
            # upscale so the shorter side reaches the crop (same window
            # for both frames keeps the pair photometrically consistent)
            s = self.crop / min(h, w)
            wh = (max(self.crop, round(w * s)), max(self.crop, round(h * s)))
            f0 = cv2.resize(f0, wh, interpolation=cv2.INTER_LINEAR)
            f1 = cv2.resize(f1, wh, interpolation=cv2.INTER_LINEAR)
            h, w = f0.shape[:2]
        y = int(rng.integers(0, h - self.crop + 1))
        x = int(rng.integers(0, w - self.crop + 1))
        f0 = f0[y : y + self.crop, x : x + self.crop]
        f1 = f1[y : y + self.crop, x : x + self.crop]
        imgs = np.stack(
            [rgb_to_lab_normalized(f0), rgb_to_lab_normalized(f1)]
        )
        g0, g1, flow, flow_back = self._scene_pair(rng)
        imgs_sup = np.stack(
            [rgb_to_lab_normalized(g1), rgb_to_lab_normalized(g0)]
        )
        return {
            "imgs": imgs.astype(np.float32),
            "imgs_sup": imgs_sup.astype(np.float32),
            "flow": flow.astype(np.float32),
            "flow_back": flow_back.astype(np.float32),
        }


class SyntheticMixedDataset:
    """Noise data with the mixed-training sample protocol (for smoke tests
    and environments without the datasets mounted)."""

    def __init__(self, crop: int = 256, length: int = 64, seed: int = 0):
        self.crop = crop
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        idx %= self.length  # raw draw counter → cycle `length` samples
        rng = np.random.default_rng(self.seed + idx)
        s = self.crop
        return {
            "imgs": rng.standard_normal((2, s, s, 3)).astype(np.float32),
            "imgs_sup": rng.standard_normal((2, s, s, 3)).astype(np.float32),
            "flow": (rng.standard_normal((s, s, 2)) * 3).astype(np.float32),
            "flow_back": (rng.standard_normal((s, s, 2)) * 3).astype(np.float32),
        }


def make_batches(dataset, batch_size: int, steps: int, skip: int = 0):
    """Simple batching iterator (single-process host loader).

    `skip` fast-forwards past the first `skip` steps' samples WITHOUT
    materializing them — a resumed run consumes exactly the batches an
    uninterrupted run would have seen from that step on (step-exact
    resume covers the data order, not just optimizer state).  That
    guarantee requires datasets to be STATELESS per call: the iterator
    passes the RAW monotone draw counter (not counter % len), and each
    dataset derives both its sample identity (idx % len internally) and
    ALL its augmentation randomness from that idx — never from a shared
    mutable Generator, which would replay the pre-preemption stream onto
    post-resume indices."""
    i = skip * batch_size
    for _ in range(steps - skip):
        samples = []
        for _ in range(batch_size):
            samples.append(dataset[i])
            i += 1
        yield {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
