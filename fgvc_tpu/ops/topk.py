"""Fast exact top-k over long rows via segment-max pre-filtering.

XLA lowers `lax.top_k` on TPU to a bitonic full sort — O(n log² n) compare
passes over the whole row.  For the attention kernels we need k≈10 of
n≈23000, so almost all of that work is wasted.

Exactness argument: partition the row into segments of length `seg` and rank
segments by their maximum.  If element e has global rank r ≤ k, fewer than k
elements exceed e, so fewer than k OTHER segments can have a maximum
exceeding e — e's segment is therefore among the top-k segments by max.
Hence the global top-k is contained in the union of the top-k segments,
and we only sort k·seg candidates:

  1. segment max        — one VPU reduction over n,
  2. top-k segments     — top_k over n/seg values,
  3. gather k segments  — (rows, k·seg) candidate block,
  4. top-k of candidates— top_k over k·seg values.

~5-10× faster than lax.top_k at the attention kernel's shapes (see
tests/test_topk.py for the exactness check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "seg"))
def topk_segmented(aff: jax.Array, k: int, seg: int = 128):
    """Exact (values, indices) top-k along the last axis of a 2-D array.

    Ties are broken by segment order then position — may differ from
    lax.top_k's tie order, but tied VALUES are identical, so downstream
    softmax-weighted sums are unchanged.
    """
    S, K = aff.shape
    n_seg = -(-K // seg)
    pad = n_seg * seg - K
    ninf = jnp.asarray(-jnp.inf, aff.dtype)
    a = jnp.pad(aff, ((0, 0), (0, pad)), constant_values=ninf)
    a = a.reshape(S, n_seg, seg)

    seg_max = jnp.max(a, axis=-1)                      # (S, n_seg)
    ks = min(k, n_seg)  # can't select more segments than exist
    _, seg_idx = jax.lax.top_k(seg_max, ks)            # (S, ks)

    # gather the ks winning segments: (S, ks, seg)
    cand = jnp.take_along_axis(a, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(S, ks * seg)
    w, ci = jax.lax.top_k(cand, k)                     # (S, k)

    # map candidate positions back to global indices
    seg_of = jnp.take_along_axis(seg_idx, ci // seg, axis=1)  # (S, k)
    gidx = seg_of * seg + ci % seg
    return w, gidx
