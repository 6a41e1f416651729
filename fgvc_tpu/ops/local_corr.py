"""Local (displacement-window) correlation — TPU equivalent of the reference's
CUDA dependencies ``mmcv.ops.Correlation`` / ``spatial_correlation_sampler``
(/root/reference/mmpt/models/trackers/mixed_tracker.py:130, SURVEY §2.9).

For every target pixel (i, j) we need the dot products against a
(2R+1)×(2R+1) displacement window of the reference feature map:

    corr[i, j, di, dj] = sum_c tar[i, j, c] * ref[i+di-R, j+dj-R, c]

with zero padding outside the image (raw dot products, no normalization —
matching mmcv; the callers scale by 1/sqrt(C) or 1/temperature themselves).

Design: instead of translating the CUDA per-pixel kernel, each vertical
displacement `di` becomes one batched (W, C) x (C, W+2R) matmul per row —
large MXU-friendly contractions — followed by a static diagonal-band gather
that extracts corr[..., di, :] from the row product.  The `di` loop is a
`lax.scan`, so peak memory is one (H, W, W+2R) slab.  A fused Pallas kernel
sits behind the same interface for the hot path (ops/pallas/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "local_correlation",
    "extract_displacement_windows",
    "part_unfold",
]


def _band_indices(width: int, window: int) -> jax.Array:
    """(W, window) gather indices: idx[w, dj] = w + dj (into a W+2R axis)."""
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (width, window), 0)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (width, window), 1)
    return w_ids + d_ids


@functools.partial(jax.jit, static_argnames=("radius", "precision"))
def local_correlation(
    tar: jax.Array,
    ref: jax.Array,
    radius: int,
    precision: str = "highest",
) -> jax.Array:
    """Displacement-window correlation.

    Args:
      tar: (H, W, C) target features (the frame whose pixels we index by).
      ref: (H, W, C) reference features (the frame the window slides over).
      radius: max displacement R.
      precision: 'highest' (f32 6-pass, eval-parity default) | 'high'
        (bf16x3 — already tighter than the TF32 matmuls the reference's
        A100 training used: torch 1.9 enables TF32 by default) | 'default'
        (bf16).

    Returns:
      (H, W, 2R+1, 2R+1) raw dot products; entry [i, j, di, dj] pairs
      tar[i, j] with ref[i + di - R, j + dj - R].
    """
    if precision not in ("highest", "high", "default"):
        raise ValueError(
            f"precision must be 'highest' | 'high' | 'default', got "
            f"{precision!r}"
        )
    H, W, C = tar.shape
    window = 2 * radius + 1
    ref_pad = jnp.pad(ref, ((radius, radius), (radius, radius), (0, 0)))
    band_idx = _band_indices(W, window)  # (W, window)

    def one_di(_, di):
        ref_slice = jax.lax.dynamic_slice_in_dim(ref_pad, di, H, axis=0)
        # (H, W, W+2R) row-wise dense correlation
        full = jnp.einsum(
            "hwc,hvc->hwv",
            tar,
            ref_slice,
            preferred_element_type=jnp.float32,
            precision={
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[precision],
        )
        # extract the diagonal band: band[h, w, dj] = full[h, w, w + dj]
        band = jnp.take_along_axis(full, band_idx[None], axis=2)
        return None, band

    _, bands = jax.lax.scan(one_di, None, jnp.arange(window))
    # bands: (window_di, H, W, window_dj) -> (H, W, di, dj)
    return jnp.transpose(bands, (1, 2, 0, 3))


@functools.partial(jax.jit, static_argnames=("radius",))
def extract_displacement_windows(x: jax.Array, radius: int) -> jax.Array:
    """Gather the (2R+1)² displacement window around every pixel.

    Equivalent of ``F.unfold(x, 2R+1, padding=R)`` reshaped per-pixel
    (used to reconstruct dropped Lab channels from reference-frame pixels,
    /root/reference/mmpt/models/trackers/mixed_tracker.py:226).

    Args:
      x: (H, W, C).
    Returns:
      (H, W, 2R+1, 2R+1, C); entry [i, j, di, dj] = x[i+di-R, j+dj-R] (0 pad).
    """
    H, W, C = x.shape
    window = 2 * radius + 1
    x_pad = jnp.pad(x, ((radius, radius), (radius, radius), (0, 0)))
    band_idx = _band_indices(W, window)  # (W, window)

    def one_di(_, di):
        x_slice = jax.lax.dynamic_slice_in_dim(x_pad, di, H, axis=0)  # (H, W+2R, C)
        band = jnp.take_along_axis(
            x_slice[:, :, None, :], band_idx[None, :, :, None], axis=1
        )  # -> (H, W, window, C) after broadcasting gather over axis 1
        return None, band

    _, bands = jax.lax.scan(one_di, None, jnp.arange(window))
    # (di, H, W, dj, C) -> (H, W, di, dj, C)
    return jnp.transpose(bands, (1, 2, 0, 3, 4))


@functools.partial(jax.jit, static_argnames=("radius",))
def part_unfold(x: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Gather (2R+1)² neighborhoods at arbitrary (possibly fractional) coords.

    The sparse-unfold of the reference (part_unfold.py:13-53): for each of N
    query coordinates, bilinearly sample the (2R+1)² window of `x` centered
    at that coordinate (zeros outside the image).

    Args:
      x: (H, W, C) feature/value map.
      coords: (N, 2) (x, y) float pixel coordinates.
    Returns:
      (N, 2R+1, 2R+1, C).
    """
    from fgvc_tpu.ops.warp import bilinear_sample

    win = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy = jnp.repeat(offs, win)
    ox = jnp.tile(offs, win)
    pts = coords[:, None, :] + jnp.stack([ox, oy], axis=-1)[None]  # (N, win², 2)
    out = bilinear_sample(x, pts)  # (N, win², C)
    return out.reshape(coords.shape[0], win, win, x.shape[-1])
