"""Coarse-to-fine two-stage attention — high-resolution propagation without
the full fine-resolution affinity volume.

Equivalent of masked_attention_efficient_c2f
(/root/reference/mmpt/models/common/local_attention.py:721-880):

  1. coarse stage: radius-masked affinity between coarse query/key features,
     softmaxed per key frame, argmax → one coarse match position per
     (frame, query),
  2. fine stage: around each coarse match (× scale on the fine grid), gather
     a (2·radius_fine+1)² patch of fine key features and values; fine
     affinity against the (subsampled) fine query feature; top-k softmax
     over the T·patch² candidates; propagate the fine values.

The full fine-resolution (H_f·W_f)² volume never exists — per query only
T·patch² fine candidates are touched.  Output lives on the coarse grid
(matching the reference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fgvc_tpu.ops.attention import l2_normalize


@functools.partial(
    jax.jit,
    static_argnames=("radius", "radius_fine", "temperature", "topk", "normalize"),
)
def masked_attention_c2f(
    query: jax.Array,       # (hc, wc, C) coarse query features
    key: jax.Array,         # (T, hc, wc, C) coarse key features
    query_fine: jax.Array,  # (hf, wf, Cf) fine query features
    key_fine: jax.Array,    # (T, hf, wf, Cf) fine key features
    value: jax.Array,       # (T, hf, wf, Cv) fine value maps
    *,
    radius: Optional[float],
    radius_fine: int = 12,
    temperature: float = 1.0,
    topk: int = 10,
    normalize: bool = True,
) -> jax.Array:
    """Returns (hc, wc, Cv) propagated values on the coarse grid."""
    hc, wc, C = query.shape
    T = key.shape[0]
    hf, wf, Cf = query_fine.shape
    Cv = value.shape[-1]
    scale = hf // hc
    Q = hc * wc
    rf = radius_fine
    P2 = (2 * rf + 1) ** 2

    if normalize:
        query = l2_normalize(query)
        key = l2_normalize(key)
        query_fine = l2_normalize(query_fine)
        key_fine = l2_normalize(key_fine)

    # ---- coarse stage: per-frame argmax of masked affinity ----
    q = query.reshape(Q, C)
    k = key.reshape(T, Q, C)
    aff = jnp.einsum(
        "qc,tkc->tkq", q, k, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / temperature  # (T, K, Q)

    if radius is not None:
        gy = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 0).reshape(-1)
        gx = jax.lax.broadcasted_iota(jnp.float32, (hc, wc), 1).reshape(-1)
        d2 = (gy[:, None] - gy[None, :]) ** 2 + (gx[:, None] - gx[None, :]) ** 2
        mask = d2 < radius * radius  # (K, Q)
        aff = jnp.where(mask[None], aff, -jnp.inf)

    best = jnp.argmax(aff, axis=1)  # (T, Q) coarse key index per frame

    # ---- fine stage: patches around the coarse matches ----
    by = (best // wc) * scale  # (T, Q) fine-grid centers
    bx = (best % wc) * scale

    offs = jnp.arange(-rf, rf + 1)
    oy = jnp.repeat(offs, 2 * rf + 1)
    ox = jnp.tile(offs, 2 * rf + 1)  # (P2,)

    kf_pad = jnp.pad(key_fine, ((0, 0), (rf, rf), (rf, rf), (0, 0)))
    v_pad = jnp.pad(value, ((0, 0), (rf, rf), (rf, rf), (0, 0)))

    py = by[:, :, None] + oy[None, None, :] + rf  # (T, Q, P2) padded coords
    px = bx[:, :, None] + ox[None, None, :] + rf

    def gather_patches(maps_pad):
        # maps_pad (T, hf+2rf, wf+2rf, D) -> (T, Q, P2, D)
        def per_frame(m, y, x):
            return m[y, x]

        return jax.vmap(per_frame)(maps_pad, py, px)

    k_patch = gather_patches(kf_pad)    # (T, Q, P2, Cf)
    v_patch = gather_patches(v_pad)     # (T, Q, P2, Cv)

    qf = query_fine[::scale, ::scale].reshape(Q, Cf)
    fine_aff = jnp.einsum(
        "qc,tqpc->tpq", qf, k_patch, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / temperature  # (T, P2, Q)

    fine_aff = fine_aff.reshape(T * P2, Q).T  # (Q, T*P2)
    w, idx = jax.lax.top_k(fine_aff, topk)    # (Q, k)
    w = jax.nn.softmax(w, axis=-1)

    v_flat = jnp.transpose(v_patch, (1, 0, 2, 3)).reshape(Q, T * P2, Cv)
    vals = jnp.take_along_axis(v_flat, idx[..., None], axis=1)  # (Q, k, Cv)
    out = jnp.einsum(
        "qk,qkc->qc", w, vals, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(hc, wc, Cv)
