"""Top-k masked attention for label propagation — the framework's hot op.

TPU-native re-design of the reference inference kernel
``masked_attention_efficient`` (/root/reference/mmpt/models/common/local_attention.py:267)
and its on-the-fly-mask variant ``_v2`` (:392):

  query (H, W, C) attends over a bank of key frames (T, H, W, C); affinities
  outside a spatial radius are masked; the top-k keys per query pixel are
  softmaxed and used to propagate the value maps (T, H, W, Cv) to the query
  frame.

Differences from the reference implementation (semantics preserved):
  * channels-last layout, fused L2-normalization,
  * the HW×HW radius mask is never materialized — it is recomputed from
    coordinates per query chunk (equivalent to 'circle' mode of
    ``spatial_neighbor``, /root/reference/mmpt/models/common/affinity_utils.py:84),
  * invalid (padded) key frames are handled with a validity mask so shapes
    stay static under jit,
  * the chunk loop is a `lax.scan`, so the full (T·H·W × H·W) affinity never
    exists in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "l2_normalize",
    "masked_topk_attention",
    "non_local_attention",
    "spatial_neighbor_mask",
]


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization matching torch.nn.functional.normalize semantics."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def build_padded_bank(
    bank: jax.Array,        # (Tb, H, W, C)
    *,
    halo: int,
    rows_total: int,
    cols_total: int,
    normalize: bool = True,
    dtype=None,
) -> jax.Array:
    """Normalize + halo-pad a feature bank WITHOUT a full normalized temp.

    `normalize(bank)` followed by `jnp.pad` materializes the normalized
    bank AND the padded bank as separate HBM buffers — at Kinetics shapes
    that middle temp is ~17 MB/frame and sets the single-chip bank
    ceiling (docs/roofline.md "bank capacity").  Here frames are
    normalized and written ONE AT A TIME into a zero-initialized output
    (XLA aliases the fori_loop carry in place), so the peak while
    building is input + output + one frame.

    Returns (Tb, rows_total, cols_total, C) with the frame content at
    spatial offset (halo, halo); the surrounding zeros are the pad.
    """
    Tb, H, W, C = bank.shape
    dtype = bank.dtype if dtype is None else dtype
    out = jnp.zeros((Tb, rows_total, cols_total, C), dtype)

    def body(t, acc):
        f = jax.lax.dynamic_slice(bank, (t, 0, 0, 0), (1, H, W, C))
        if normalize:
            f = l2_normalize(f)
        return jax.lax.dynamic_update_slice(
            acc, f.astype(dtype), (t, halo, halo, 0)
        )

    return jax.lax.fori_loop(0, Tb, body, out)


def spatial_neighbor_mask(height: int, width: int, neighbor_range: int) -> jax.Array:
    """(H*W, H*W) boolean circle mask: key pixel i is a neighbor of query pixel j.

    Mirrors spatial_neighbor(mode='circle'): euclidean distance between grid
    positions strictly less than neighbor_range // 2.  Kept for parity tests;
    production paths compute the mask on the fly.
    """
    radius = neighbor_range // 2
    ys = jnp.arange(height)
    xs = jnp.arange(width)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy = gy.reshape(-1).astype(jnp.float32)
    gx = gx.reshape(-1).astype(jnp.float32)
    d = jnp.sqrt((gy[:, None] - gy[None, :]) ** 2 + (gx[:, None] - gx[None, :]) ** 2)
    return d < radius


@functools.partial(
    jax.jit,
    static_argnames=(
        "temperature",
        "topk",
        "radius",
        "normalize",
        "step",
        "non_mask_len",
        "mode",
        "mask_shape",
        "precision",
        "sim_mode",
    ),
)
def masked_topk_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    radius: Optional[float],
    temperature: float = 1.0,
    topk: Optional[int] = None,
    normalize: bool = True,
    step: int = 512,
    non_mask_len: int = 0,
    mode: str = "softmax",
    mask_shape: str = "circle",
    key_valid: Optional[jax.Array] = None,
    precision: str = "highest",
    sim_mode: str = "dot_product",
) -> jax.Array:
    """Spatial-radius-masked top-k attention propagation.

    Args:
      query: (H, W, C) query-frame features.
      key:   (T, H, W, C) key-frame features.
      value: (T, H, W, Cv) label maps to propagate.
      radius: spatial radius (== neighbor_range // 2 of the reference); pixels
        with euclidean grid distance >= radius are masked.  None disables the
        spatial mask.
      temperature: affinity temperature (divides logits).
      topk: keep only the top-k keys per query pixel (None = all).
      normalize: L2-normalize query/key channels first.
      step: query-pixel chunk size (memory/speed dial, like the reference's).
      non_mask_len: number of leading key frames exempt from the spatial mask.
      mode: 'softmax' (weights = softmax) or 'cosine' (clamp(min=0)**2).
      precision: 'highest' (f32 parity) | 'high' (bf16x3) | 'default' (bf16)
        for the affinity matmuls.
      sim_mode: 'dot_product' (÷ temperature) or 'l2-distance'
        ((2·k·q − |k|²)/√C, the reference's alternate similarity —
        local_attention.py:324-327; the |q|² term is constant per query
        row and cancels in softmax/top-k, exactly as in the reference).
      mask_shape: 'circle' = euclidean distance < radius (spatial_neighbor);
        'square' = |dy| <= radius and |dx| <= radius (the window the
        reference's mmcv Correlation paths use).
      key_valid: optional (T,) bool — False frames contribute nothing
        (used for static-shape sliding windows).

    Returns:
      (H, W, Cv) propagated value map.
    """
    if mode not in ("softmax", "cosine"):
        raise ValueError(f"unknown mode {mode}")
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    H, W, C = query.shape
    T = key.shape[0]
    Cv = value.shape[-1]
    HW = H * W

    if normalize:
        query = l2_normalize(query)
        key = l2_normalize(key)

    q = query.reshape(HW, C)
    k = key.reshape(T * HW, C)
    v = value.reshape(T * HW, Cv)
    if sim_mode == "l2-distance":
        k_sq = jnp.sum(k * k, axis=-1)  # (T*HW,)

    # Per-key-pixel additive bias: -inf for invalid frames.
    ninf = jnp.float32(-jnp.inf)
    if key_valid is not None:
        frame_bias = jnp.where(key_valid, 0.0, ninf)  # (T,)
    else:
        frame_bias = jnp.zeros((T,), jnp.float32)

    # Grid coordinates for the on-the-fly circle mask.
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)

    # frames exempt from the spatial mask (non_mask_len leading frames)
    frame_exempt = (
        jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) < non_mask_len
    )  # (T, 1)

    n_chunks = -(-HW // step)
    pad = n_chunks * step - HW
    q_p = jnp.pad(q, ((0, pad), (0, 0)))
    gy_p = jnp.pad(gy, (0, pad))
    gx_p = jnp.pad(gx, (0, pad))

    def chunk_fn(_, idx):
        q_c = jax.lax.dynamic_slice_in_dim(q_p, idx * step, step)  # (S, C)
        qy = jax.lax.dynamic_slice_in_dim(gy_p, idx * step, step)
        qx = jax.lax.dynamic_slice_in_dim(gx_p, idx * step, step)

        # (S, T*HW) affinity
        ab = jnp.einsum(
            "sc,kc->sk",
            q_c,
            k,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if sim_mode == "l2-distance":
            aff = (2.0 * ab - k_sq[None, :]) / jnp.sqrt(jnp.float32(C))
        else:
            aff = ab / temperature

        if radius is not None:
            dy = jnp.abs(qy[:, None] - gy[None, :])
            dx = jnp.abs(qx[:, None] - gx[None, :])
            if mask_shape == "circle":
                in_range = dy * dy + dx * dx < radius * radius  # (S, HW)
            else:
                in_range = (dy <= radius) & (dx <= radius)
            allowed = in_range[:, None, :] | frame_exempt[None, :, :]  # (S,T,HW)
            spatial_bias = jnp.where(allowed, 0.0, ninf)
            bias = spatial_bias + frame_bias[None, :, None]
            aff = aff + bias.reshape(step, T * HW)
        else:
            # no spatial mask: only the per-frame validity bias applies
            aff = aff + jnp.repeat(frame_bias, HW)[None, :]

        if topk is not None:
            w, idxs = jax.lax.top_k(aff, topk)  # (S, k)
            if mode == "softmax":
                w = jax.nn.softmax(w, axis=-1)
            else:
                w = jnp.maximum(w, 0.0) ** 2
            vals = v[idxs]  # (S, k, Cv)
            out = jnp.einsum(
                "sk,skc->sc",
                w,
                vals,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        else:
            if mode == "softmax":
                w = jax.nn.softmax(aff, axis=-1)
            else:
                w = jnp.maximum(aff, 0.0) ** 2
            out = jnp.einsum(
                "sk,kc->sc",
                w,
                v,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return None, out

    _, outs = jax.lax.scan(chunk_fn, None, jnp.arange(n_chunks))
    out = outs.reshape(n_chunks * step, Cv)[:HW]
    return out.reshape(H, W, Cv)


def non_local_attention(
    query: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    normalize: bool = True,
    softmax_axis: int = -1,
) -> jax.Array:
    """Global frame-pair affinity for correspondence demos.

    Equivalent of non_local_attention (/root/reference/mmpt/models/common/
    correlation.py:32) restricted to what the demo path uses: affinity
    softmax(q·k / t) between a query frame (H, W, C) and key frames
    (T, H, W, C).  Returns (H*W, T*H*W) affinity.
    """
    H, W, C = query.shape
    if key.ndim == 3:
        key = key[None]
    T = key.shape[0]
    if normalize:
        query = l2_normalize(query)
        key = l2_normalize(key)
    aff = (
        jnp.einsum(
            "ic,kc->ik",
            query.reshape(-1, C),
            key.reshape(-1, C),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / temperature
    )
    return jax.nn.softmax(aff, axis=softmax_axis)
