"""Miscellaneous ops from the reference common/ library.

Equivalents of the smaller registry ops used by ablation configs
(/root/reference/mmpt/models/common/):
  * sinkhorn_knopp      — sinkhorn_layers.py:6 (optimal-transport affinity
    normalization)
  * sincos embeddings   — embedding.py:5-150
  * hog_descriptor      — hoglayer.py:19 (gradient-histogram features)
  * compute_affinity / propagate — affinity_utils.py:6-81 (VFS-style
    top-k-threshold renormalized propagation)
  * video2images/images2video layout helpers — utils.py:59
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sinkhorn_knopp(
    scores: jax.Array, n_iters: int = 3, epsilon: float = 0.05
) -> jax.Array:
    """Sinkhorn normalization of a score matrix to a doubly-stochastic
    transport plan (rows sum to 1/N, cols to 1/M)."""
    q = jnp.exp(scores / epsilon)
    q = q / jnp.sum(q)
    n, m = q.shape

    def body(_, q):
        # columns to mass 1/m, then rows to mass 1/n (last, so rows exact)
        q = q / jnp.sum(q, axis=0, keepdims=True) / m
        q = q / jnp.sum(q, axis=1, keepdims=True) / n
        return q

    q = jax.lax.fori_loop(0, n_iters, body, q)
    return q * n  # rows sum exactly 1; columns ≈ n/m


def sincos_embedding_1d(dim: int, positions: jax.Array) -> jax.Array:
    """(..., dim) sine/cosine positional embedding for float positions."""
    assert dim % 2 == 0
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = positions[..., None].astype(jnp.float32) * omega
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def _pips_interleaved_pe(v: jax.Array, C: int) -> jax.Array:
    """PIPS-style interleaved sin/cos embedding of one scalar channel.

    Matches get_2d/3d_embedding's div_term = arange(0, C, 2) * (1000 / C)
    with sin at even and cos at odd output positions
    (/root/reference/mmpt/models/common/embedding.py:61-113).
    """
    div = jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)
    s = jnp.sin(v[..., None] * div)  # (..., C/2)
    c = jnp.cos(v[..., None] * div)
    return jnp.stack([s, c], axis=-1).reshape(*v.shape, C)


def get_2d_embedding(xy: jax.Array, C: int, cat_coords: bool = True) -> jax.Array:
    """(..., 2) coords -> (..., 2C [+2]) PIPS positional embedding.

    Port of embedding.py:61-83 (note: coords are PREPENDED there)."""
    pe = jnp.concatenate(
        [_pips_interleaved_pe(xy[..., 0], C), _pips_interleaved_pe(xy[..., 1], C)],
        axis=-1,
    )
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def get_3d_embedding(xyz: jax.Array, C: int, cat_coords: bool = True) -> jax.Array:
    """(..., 3) coords -> (..., 3C [+3]) PIPS positional embedding.

    Port of embedding.py:86-113 (coords APPENDED there)."""
    pe = jnp.concatenate(
        [_pips_interleaved_pe(xyz[..., i], C) for i in range(3)], axis=-1
    )
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=-1)
    return pe


def sincos_embedding_2d(dim: int, height: int, width: int) -> jax.Array:
    """(H, W, dim) 2-D sine/cosine grid embedding (half x, half y)."""
    assert dim % 4 == 0
    gy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    return jnp.concatenate(
        [sincos_embedding_1d(dim // 2, gx), sincos_embedding_1d(dim // 2, gy)],
        axis=-1,
    )


def hog_descriptor(
    img: jax.Array, n_bins: int = 9, cell: int = 8
) -> jax.Array:
    """Histogram-of-oriented-gradients features (HOGLayer equivalent).

    img: (H, W) grayscale → (H/cell, W/cell, n_bins) soft-binned magnitude
    histograms with unsigned orientation.
    """
    H, W = img.shape
    gx = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) / 2)
    gy = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) / 2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx) % jnp.pi  # unsigned [0, pi)

    bin_w = jnp.pi / n_bins
    b0 = jnp.floor(ang / bin_w)
    frac = ang / bin_w - b0
    b0 = b0.astype(jnp.int32) % n_bins
    b1 = (b0 + 1) % n_bins

    hist = jnp.zeros((H, W, n_bins))
    hist = hist.at[
        jnp.arange(H)[:, None], jnp.arange(W)[None, :], b0
    ].add(mag * (1 - frac))
    hist = hist.at[
        jnp.arange(H)[:, None], jnp.arange(W)[None, :], b1
    ].add(mag * frac)

    hc, wc = H // cell, W // cell
    pooled = hist[: hc * cell, : wc * cell].reshape(
        hc, cell, wc, cell, n_bins
    ).sum(axis=(1, 3))
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-6)


def compute_affinity(
    query: jax.Array,     # (N, C)
    key: jax.Array,       # (M, C)
    temperature: float = 1.0,
    normalize: bool = True,
    softmax_axis: Optional[int] = 0,
) -> jax.Array:
    """(M, N) affinity, optionally softmaxed over keys
    (affinity_utils.compute_affinity)."""
    if normalize:
        query = query / jnp.maximum(
            jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12
        )
        key = key / jnp.maximum(
            jnp.linalg.norm(key, axis=-1, keepdims=True), 1e-12
        )
    aff = key @ query.T / temperature
    if softmax_axis is not None:
        aff = jax.nn.softmax(aff, axis=softmax_axis)
    return aff


def propagate_vfs(
    affinity: jax.Array,   # (M_keys, N_queries) softmaxed over keys
    labels: jax.Array,     # (M_keys, C) label vectors
    topk: int = 10,
) -> jax.Array:
    """VFS-style top-k-renormalized propagation (affinity_utils.propagate):
    keep the k strongest keys per query, renormalize, and mix labels."""
    w, idx = jax.lax.top_k(affinity.T, topk)  # (N, k)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("nk,nkc->nc", w, labels[idx])


def video2images(video: jax.Array) -> jax.Array:
    """(T, H, W, C) view — identity in channels-last; kept for API parity."""
    return video


def images2video(images: jax.Array, clip_len: int) -> jax.Array:
    return images.reshape(clip_len, *images.shape[1:])


def bilinear_resize_align_corners(x: jax.Array, size) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics.

    jax.image.resize implements half-pixel (align_corners=False) sampling;
    several reference decoders interpolate with align_corners=True
    (motion_decoder.py:85-100, res_decoder.py:252). Separable 1-D
    interpolation as two small matmuls (TPU-friendly, no gathers).

    x: (..., H, W, C); size: (H_out, W_out).
    """
    H_out, W_out = size
    H, W = x.shape[-3], x.shape[-2]

    def interp_matrix(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.ones((n_out, n_in), jnp.float32) / n_in
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos), 0, n_in - 2)
        frac = pos - lo
        cols = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
        lo_ = lo[:, None]
        return (
            (cols == lo_) * (1.0 - frac[:, None])
            + (cols == lo_ + 1.0) * frac[:, None]
        )

    My = interp_matrix(H, H_out)   # (H_out, H)
    Mx = interp_matrix(W, W_out)   # (W_out, W)
    y = jnp.einsum("oh,...hwc->...owc", My, x)
    return jnp.einsum("pw,...hwc->...hpc", Mx, y)


def deform_im2col(img: jax.Array, offset: jax.Array, kernel_size: int = 3):
    """Deformable im2col (utils.py deform_im2col): sample a k×k patch at
    (pixel + offset) for every pixel via bilinear interpolation.

    img: (H, W, C); offset: (H, W, 2) (x, y) displacements.
    Returns (H, W, k*k, C) patches (channels-last layout of the reference's
    (b, k²·c, h·w) output).
    """
    from fgvc_tpu.ops.warp import bilinear_sample

    H, W, C = img.shape
    k = kernel_size
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    base = jnp.stack([gx, gy], axis=-1) + offset  # (H, W, 2)
    d = jnp.arange(k, dtype=jnp.float32) - k // 2
    dx, dy = jnp.meshgrid(d, d, indexing="xy")
    offs = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)  # (k², 2) — dx fast
    pts = base[:, :, None, :] + offs  # (H, W, k², 2)
    return bilinear_sample(img, pts)
