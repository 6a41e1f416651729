"""Coordinate grids, gaussian query heatmaps, and soft-argmax decoding.

TPU-native equivalents of the reference's grid helpers:
  * coords_grid            — /root/reference/mmpt/models/common/corr_lookup.py:13
  * draw_gaussian_maps     — VanillaTracker.draw_gaussion_map_online
                             (/root/reference/mmpt/models/trackers/vanilla_tracker.py:204)
  * img2coord (soft-argmax)— VanillaTracker.img2coord
                             (/root/reference/mmpt/models/trackers/vanilla_tracker.py:172)

All functions are pure and jittable with static shapes.  Layout convention is
channels-last (TPU-friendly); point coordinates are (x, y) in *input pixel*
units unless stated otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def coords_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Return a (H, W, 2) grid of (x, y) pixel coordinates.

    Matches the reference's coords_grid channel order (channel 0 = x,
    channel 1 = y) but in channels-last layout.
    """
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return jnp.stack([xs, ys], axis=-1)


def draw_gaussian_maps(
    points_xy: jax.Array,
    height: int,
    width: int,
    sigma: float = 6.0,
    stride: int = 1,
) -> jax.Array:
    """Draw per-point gaussian heatmaps on a strided grid.

    The reference draws a full-resolution gaussian and then subsamples it with
    ``g[:, :, ::stride, ::stride]``; drawing directly on the strided grid
    (grid coordinate = stride * index) is bit-identical.

    Args:
      points_xy: (P, 2) point coordinates (x, y) in full-resolution pixels.
      height/width: FULL-resolution map size; output is the strided grid
        (ceil(height/stride), ceil(width/stride)).
      sigma: gaussian std-dev in full-resolution pixels.
      stride: grid subsampling stride.

    Returns:
      (P, H', W') heatmaps, H' = ceil(height/stride).
    """
    h_out = -(-height // stride)
    w_out = -(-width // stride)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h_out, w_out), 0) * stride
    gx = jax.lax.broadcasted_iota(jnp.float32, (h_out, w_out), 1) * stride
    px = points_xy[:, 0][:, None, None]
    py = points_xy[:, 1][:, None, None]
    d2 = (gx[None] - px) ** 2 + (gy[None] - py) ** 2
    return jnp.exp(-d2 / (2.0 * sigma**2))


def soft_argmax_topk(heatmaps: jax.Array, topk: int = 5) -> jax.Array:
    """Decode (..., H, W) heatmaps to (..., 2) (x, y) coords via top-k soft-argmax.

    Mirrors VanillaTracker.img2coord: take the top-k activations, normalise
    them to sum to one, and output the weighted average of their (x, y)
    positions.  All-zero heatmaps decode to (-1, -1), matching the reference's
    sentinel.
    """
    width = heatmaps.shape[-1]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], -1)
    if flat.shape[-1] > 4096 and flat.ndim == 2:
        # long rows: segment-max prefiltered exact top-k is much cheaper
        # than the bitonic sort behind lax.top_k (ops/topk.py)
        from fgvc_tpu.ops.topk import topk_segmented

        vals, idx = topk_segmented(flat, topk, seg=512)
    else:
        vals, idx = jax.lax.top_k(flat, topk)
    w = vals / (jnp.sum(vals, axis=-1, keepdims=True) + 1e-9)
    xs = (idx % width).astype(jnp.float32)
    ys = (idx // width).astype(jnp.float32)
    coord = jnp.stack(
        [jnp.sum(xs * w, axis=-1), jnp.sum(ys * w, axis=-1)], axis=-1
    )
    empty = jnp.sum(flat, axis=-1, keepdims=True) == 0
    return jnp.where(empty, -1.0, coord)
