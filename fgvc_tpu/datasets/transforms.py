"""Host-side data pipeline transforms — the reference pipelines zoo.

Numpy/cv2 ports of the mmpt pipeline classes the shipped configs don't use
but ablation configs do (/root/reference/mmpt/datasets/pipelines/
augmentation.py): crops, resizes, flips, photometric distortions, affine
warps, erasing, color-space conversions — all on the dict sample protocol
(``results['imgs']`` is a list of HWC uint8/float frames; ``flow`` keys are
kept consistent where geometry changes).

These run on the host (data loading is CPU work; the device pipeline starts
at the jitted preprocess). Each transform takes and returns the results
dict, like the reference's Compose.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class Compose:
    """pipelines/compose.py:9-45."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, results: Dict) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


def _imresize(img, w, h, interpolation="bilinear"):
    import cv2

    interp = {
        "bilinear": cv2.INTER_LINEAR,
        "nearest": cv2.INTER_NEAREST,
        "bicubic": cv2.INTER_CUBIC,
    }[interpolation]
    return cv2.resize(img, (w, h), interpolation=interp)


def rescale_size(w: int, h: int, scale) -> Tuple[int, int]:
    """mmcv.rescale_size semantics: a float scale is a plain factor;
    scale=(a, b) bounds the long/short edge; -1 entries mean unbounded
    (Resize(scale=(-1, N)) = short edge to N)."""
    if isinstance(scale, (int, float)) and not isinstance(scale, bool):
        return int(w * scale + 0.5), int(h * scale + 0.5)
    a, b = max(scale), min(scale)
    if b == -1:
        b, a = a, np.inf
    f = min(a / max(h, w), b / min(h, w))
    return int(w * f + 0.5), int(h * f + 0.5)


class Resize:
    """augmentation.py:696-820 (keep_ratio + fixed-size modes)."""

    def __init__(self, scale, keep_ratio=True, interpolation="bilinear",
                 keys="imgs"):
        self.scale = scale
        self.keep_ratio = keep_ratio
        self.interpolation = interpolation
        self.keys = keys

    def __call__(self, results):
        imgs = results[self.keys]
        h, w = imgs[0].shape[:2]
        if self.keep_ratio:
            new_w, new_h = rescale_size(w, h, self.scale)
        else:
            new_w, new_h = self.scale
        results[self.keys] = [
            _imresize(im, new_w, new_h, self.interpolation) for im in imgs
        ]
        sf = np.array([new_w / w, new_h / h], np.float32)
        results["scale_factor"] = results.get("scale_factor", 1.0) * sf
        results["img_shape"] = (new_h, new_w)
        for fk in ("flow", "flow_back"):
            if fk in results and results[fk] is not None:
                f = _imresize(results[fk], new_w, new_h, "bilinear")
                results[fk] = f * sf  # flow vectors scale with geometry
        return results


class RandomCrop:
    """augmentation.py:112-197."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, results):
        imgs = results["imgs"]
        h, w = imgs[0].shape[:2]
        s = self.size
        y0 = random.randint(0, h - s)
        x0 = random.randint(0, w - s)
        results["imgs"] = [im[y0 : y0 + s, x0 : x0 + s] for im in imgs]
        for fk in ("flow", "flow_back"):
            if fk in results and results[fk] is not None:
                results[fk] = results[fk][y0 : y0 + s, x0 : x0 + s]
        results["img_shape"] = (s, s)
        return results


class CenterCrop:
    """augmentation.py:1091-1160."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, results):
        imgs = results["imgs"]
        h, w = imgs[0].shape[:2]
        s = self.size
        y0 = (h - s) // 2
        x0 = (w - s) // 2
        results["imgs"] = [im[y0 : y0 + s, x0 : x0 + s] for im in imgs]
        results["img_shape"] = (s, s)
        return results


class RandomResizedCrop:
    """augmentation.py:198-320 (area/aspect sampling like torchvision)."""

    def __init__(self, size: int, area_range=(0.2, 1.0),
                 aspect_range=(3 / 4, 4 / 3)):
        self.size = size
        self.area_range = area_range
        self.aspect_range = aspect_range

    def __call__(self, results):
        imgs = results["imgs"]
        h, w = imgs[0].shape[:2]
        for _ in range(10):
            area = random.uniform(*self.area_range) * h * w
            ar = np.exp(random.uniform(*np.log(self.aspect_range)))
            cw = int(round(np.sqrt(area * ar)))
            ch = int(round(np.sqrt(area / ar)))
            if cw <= w and ch <= h:
                y0 = random.randint(0, h - ch)
                x0 = random.randint(0, w - cw)
                break
        else:
            ch = cw = min(h, w)
            y0 = (h - ch) // 2
            x0 = (w - cw) // 2
        results["imgs"] = [
            _imresize(im[y0 : y0 + ch, x0 : x0 + cw], self.size, self.size)
            for im in imgs
        ]
        results["img_shape"] = (self.size, self.size)
        return results


class Flip:
    """augmentation.py:846-1000 — horizontal flip; flow x-components negate."""

    def __init__(self, flip_ratio=0.5):
        self.flip_ratio = flip_ratio

    def __call__(self, results):
        if random.random() >= self.flip_ratio:
            results["flip"] = False
            return results
        results["imgs"] = [np.ascontiguousarray(im[:, ::-1]) for im in results["imgs"]]
        for fk in ("flow", "flow_back"):
            if fk in results and results[fk] is not None:
                f = results[fk][:, ::-1].copy()
                f[..., 0] *= -1
                results[fk] = f
        results["flip"] = True
        return results


class Normalize:
    """augmentation.py:1003-1088."""

    def __init__(self, mean, std, keys="imgs"):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.keys = keys

    def __call__(self, results):
        results[self.keys] = [
            (np.asarray(im, np.float32) - self.mean) / self.std
            for im in results[self.keys]
        ]
        return results


class RGB2LAB:
    """augmentation.py:1372-1391: float RGB/255 → cv2 Lab."""

    def __call__(self, results):
        import cv2

        results["imgs"] = [
            cv2.cvtColor(
                np.asarray(im, np.float32) / 255.0, cv2.COLOR_RGB2LAB
            )
            for im in results["imgs"]
        ]
        return results


class RGB2GRAY:
    """augmentation.py:1394-1410 (3-channel replicated gray)."""

    def __call__(self, results):
        import cv2

        outs = []
        for im in results["imgs"]:
            g = cv2.cvtColor(np.asarray(im, np.uint8), cv2.COLOR_RGB2GRAY)
            outs.append(np.repeat(g[..., None], 3, axis=-1))
        results["imgs"] = outs
        return results


class PhotoMetricDistortion:
    """augmentation.py:1413-1538: brightness delta → contrast (random
    position, before or after the color block) → saturation → hue, each
    applied with prob 0.5."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        import cv2

        imgs = [np.asarray(im, np.float32) for im in results["imgs"]]
        if random.random() < 0.5:
            delta = random.uniform(-self.brightness_delta, self.brightness_delta)
            imgs = [im + delta for im in imgs]
        # mmdet-style random contrast position: applied either before
        # (mode 1) or after (mode 0) the saturation/hue block. NOTE the
        # reference's docstring mentions a channel swap but its CODE
        # (augmentation.py:1480-1538) performs none — parity follows the
        # code, so no swap here.
        contrast_last = random.random() < 0.5
        if not contrast_last and random.random() < 0.5:
            alpha = random.uniform(*self.contrast_range)
            imgs = [im * alpha for im in imgs]
        if random.random() < 0.5:
            alpha = random.uniform(*self.saturation_range)
            outs = []
            for im in imgs:
                hsv = cv2.cvtColor(
                    np.clip(im, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
                ).astype(np.float32)
                hsv[..., 1] = np.clip(hsv[..., 1] * alpha, 0, 255)
                outs.append(
                    cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                        np.float32
                    )
                )
            imgs = outs
        if random.random() < 0.5:
            delta = random.uniform(-self.hue_delta, self.hue_delta)
            outs = []
            for im in imgs:
                hsv = cv2.cvtColor(
                    np.clip(im, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
                ).astype(np.int32)
                hsv[..., 0] = (hsv[..., 0] + int(delta)) % 180
                outs.append(
                    cv2.cvtColor(
                        hsv.astype(np.uint8), cv2.COLOR_HSV2RGB
                    ).astype(np.float32)
                )
            imgs = outs
        if contrast_last and random.random() < 0.5:
            alpha = random.uniform(*self.contrast_range)
            imgs = [im * alpha for im in imgs]
        results["imgs"] = [np.clip(im, 0, 255) for im in imgs]
        return results


class ColorJitter:
    """augmentation.py:1894-2070 — same photometric family, per-frame
    consistent factors (the video variant)."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

    def __call__(self, results):
        import cv2

        fb = random.uniform(max(0, 1 - self.b), 1 + self.b)
        fc = random.uniform(max(0, 1 - self.c), 1 + self.c)
        fs = random.uniform(max(0, 1 - self.s), 1 + self.s)
        fh = random.uniform(-self.h, self.h) * 180
        outs = []
        for im in results["imgs"]:
            im = np.asarray(im, np.float32) * fb
            mean = im.mean(axis=(0, 1), keepdims=True)
            im = (im - mean) * fc + mean
            hsv = cv2.cvtColor(
                np.clip(im, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
            ).astype(np.float32)
            hsv[..., 1] = np.clip(hsv[..., 1] * fs, 0, 255)
            hsv[..., 0] = (hsv[..., 0] + fh) % 180
            outs.append(
                cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                    np.float32
                )
            )
        results["imgs"] = outs
        return results


class RandomGaussianBlur:
    """augmentation.py:1552-1683."""

    def __init__(self, p=0.5, sigma_range=(0.1, 2.0)):
        self.p = p
        self.sigma_range = sigma_range

    def __call__(self, results):
        import cv2

        if random.random() >= self.p:
            return results
        sigma = random.uniform(*self.sigma_range)
        results["imgs"] = [
            cv2.GaussianBlur(np.asarray(im, np.float32), (0, 0), sigma)
            for im in results["imgs"]
        ]
        return results


class RandomAffine:
    """augmentation.py:1685-1773: rotation/translation/scale/shear with one
    shared matrix per clip."""

    def __init__(self, degrees=10.0, translate=0.1, scale_range=(0.9, 1.1),
                 shear=5.0, p=0.5):
        self.degrees = degrees
        self.translate = translate
        self.scale_range = scale_range
        self.shear = shear
        self.p = p

    def __call__(self, results):
        import cv2

        if random.random() >= self.p:
            return results
        h, w = results["imgs"][0].shape[:2]
        ang = random.uniform(-self.degrees, self.degrees)
        sc = random.uniform(*self.scale_range)
        tx = random.uniform(-self.translate, self.translate) * w
        ty = random.uniform(-self.translate, self.translate) * h
        sh = np.deg2rad(random.uniform(-self.shear, self.shear))
        # center-anchored rotation*scale*shear (torchvision F.affine
        # convention): T(c) · R·S·Shear · T(-c), plus the translation
        cx, cy = w / 2, h / 2
        ca, sa = np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang))
        lin = np.array(
            [[sc * ca, sc * (-sa + ca * np.tan(sh))],
             [sc * sa, sc * (ca + sa * np.tan(sh))]]
        )
        off = np.array([cx + tx, cy + ty]) - lin @ np.array([cx, cy])
        M = np.concatenate([lin, off[:, None]], axis=1)
        results["imgs"] = [
            cv2.warpAffine(np.asarray(im, np.float32), M, (w, h))
            for im in results["imgs"]
        ]
        results["affine_matrix"] = M
        return results


class RandomErasing:
    """augmentation.py:1775-1890: per-frame random rectangle erase."""

    def __init__(self, p=0.5, area_range=(0.02, 0.2)):
        self.p = p
        self.area_range = area_range

    def __call__(self, results):
        outs = []
        for im in results["imgs"]:
            im = np.array(im)
            if random.random() < self.p:
                h, w = im.shape[:2]
                area = random.uniform(*self.area_range) * h * w
                ar = random.uniform(0.3, 3.3)
                eh = int(round(np.sqrt(area * ar)))
                ew = int(round(np.sqrt(area / ar)))
                if eh < h and ew < w:
                    y0 = random.randint(0, h - eh)
                    x0 = random.randint(0, w - ew)
                    im[y0 : y0 + eh, x0 : x0 + ew] = np.random.uniform(
                        0, 255, (eh, ew, im.shape[-1])
                    )
            outs.append(im)
        results["imgs"] = outs
        return results


class FormatShape:
    """formating.py FormatShape: stack the frame list into an array of the
    requested layout ('NCTHW' | 'NCHW' | 'THWC')."""

    def __init__(self, input_format: str = "THWC"):
        self.input_format = input_format

    def __call__(self, results):
        arr = np.stack([np.asarray(im) for im in results["imgs"]])  # (T,H,W,C)
        if self.input_format == "THWC":
            pass
        elif self.input_format == "NCHW":
            arr = arr.transpose(0, 3, 1, 2)
        elif self.input_format == "NCTHW":
            arr = arr.transpose(3, 0, 1, 2)[None]
        else:
            raise ValueError(self.input_format)
        results["imgs"] = arr
        return results
