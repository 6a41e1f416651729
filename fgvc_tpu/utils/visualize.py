"""Trajectory / correspondence visualization and video writers.

Equivalents of the reference's demo rendering utilities
(paint_point_track in mmpt/datasets/flyingthingsplus/utils/visualize.py,
generate_video in mmpt/utils/video_process.py:10).
"""

from __future__ import annotations

import colorsys
from typing import Optional, Sequence

import numpy as np


def point_colors(n: int) -> np.ndarray:
    """(n, 3) uint8 distinct hues."""
    cols = []
    for i in range(n):
        r, g, b = colorsys.hsv_to_rgb(i / max(n, 1), 1.0, 1.0)
        cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return np.array(cols, np.uint8)


def paint_point_track(
    frames: np.ndarray,        # (T, H, W, 3) uint8
    tracks: np.ndarray,        # (P, T, 2) (x, y)
    visibles: Optional[np.ndarray] = None,  # (P, T)
    radius: int = 3,
) -> np.ndarray:
    """Draw tracked points on every frame (filled circles, per-point hue)."""
    import cv2

    T = frames.shape[0]
    P = tracks.shape[0]
    cols = point_colors(P)
    out = frames.copy()
    for t in range(T):
        img = np.ascontiguousarray(out[t])
        for p in range(P):
            if visibles is not None and not visibles[p, t]:
                continue
            x, y = tracks[p, t]
            if x < 0 or y < 0:
                continue
            cv2.circle(
                img, (int(round(x)), int(round(y))), radius,
                tuple(int(c) for c in cols[p]), -1,
            )
        out[t] = img
    return out


def draw_trajectory_tails(
    frames: np.ndarray, tracks: np.ndarray, tail: int = 8
) -> np.ndarray:
    """Add fading polyline tails behind each point."""
    import cv2

    out = frames.copy()
    P = tracks.shape[0]
    cols = point_colors(P)
    for t in range(frames.shape[0]):
        img = np.ascontiguousarray(out[t])
        for p in range(P):
            for s in range(max(0, t - tail), t):
                a, b = tracks[p, s], tracks[p, s + 1]
                if min(a.min(), b.min()) < 0:
                    continue
                cv2.line(
                    img,
                    (int(a[0]), int(a[1])),
                    (int(b[0]), int(b[1])),
                    tuple(int(c) for c in cols[p]),
                    1,
                )
        out[t] = img
    return out


def save_video(frames: np.ndarray, path: str, fps: int = 24) -> None:
    """Write (T, H, W, 3) uint8 RGB frames to an mp4 (or .gif via PIL)."""
    if path.endswith(".gif"):
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        return
    import cv2

    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def correspondence_overlay(
    img1: np.ndarray,
    img2: np.ndarray,
    matches_xy: np.ndarray,   # (N, 4) x1, y1, x2, y2
) -> np.ndarray:
    """Side-by-side frame pair with match lines (the notebook demo's view,
    jupyter/visualize_correspondence.ipynb path)."""
    import cv2

    h = max(img1.shape[0], img2.shape[0])
    canvas = np.zeros((h, img1.shape[1] + img2.shape[1], 3), np.uint8)
    canvas[: img1.shape[0], : img1.shape[1]] = img1
    canvas[: img2.shape[0], img1.shape[1] :] = img2
    off = img1.shape[1]
    cols = point_colors(len(matches_xy))
    for i, (x1, y1, x2, y2) in enumerate(matches_xy):
        c = tuple(int(v) for v in cols[i])
        cv2.circle(canvas, (int(x1), int(y1)), 2, c, -1)
        cv2.circle(canvas, (int(x2) + off, int(y2)), 2, c, -1)
        cv2.line(canvas, (int(x1), int(y1)), (int(x2) + off, int(y2)), c, 1)
    return canvas


def mask_overlay(
    frames: np.ndarray,   # (T, H, W, 3) uint8
    masks: np.ndarray,    # (T, H, W) int labels (0 = background)
    alpha: float = 0.5,
) -> np.ndarray:
    """Colorize propagated VOS masks over the frames (the DAVIS overlay
    helpers' role, /root/reference/mmpt/utils/helpers.py:23-70)."""
    num_objects = int(masks.max())
    colors = point_colors(max(num_objects, 1))
    out = frames.astype(np.float32).copy()
    for obj in range(1, num_objects + 1):
        sel = masks == obj
        c = colors[obj - 1].astype(np.float32)
        out[sel] = (1 - alpha) * out[sel] + alpha * c
    return np.clip(out, 0, 255).astype(np.uint8)
