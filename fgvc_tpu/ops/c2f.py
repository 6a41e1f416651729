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
    static_argnames=(
        "radius", "radius_fine", "temperature", "topk", "normalize", "step"
    ),
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
    key_valid: Optional[jax.Array] = None,  # (T,) bool frame validity
    step: Optional[int] = None,  # query-pixel chunk (memory dial)
) -> jax.Array:
    """Returns (hc, wc, Cv) propagated values on the coarse grid.

    `key_valid` masks whole key frames out of both stages (the propagation
    scan's rolling window carries clipped pre-video slots).  `step` chunks
    the query pixels like the reference's `step` loop
    (local_attention.py:800) so the (T, Q, patch², C) fine gathers never
    materialize for all queries at once.
    """
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

    valid_bias = (
        jnp.where(key_valid, 0.0, -jnp.inf)
        if key_valid is not None
        else jnp.zeros((T,), jnp.float32)
    )

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
    qf = query_fine[::scale, ::scale].reshape(Q, Cf)

    def chunk_out(args):
        py, px, qf_c = args  # (T, s, P2), (T, s, P2), (s, Cf)

        def per_frame(m, y, x):
            return m[y, x]

        k_patch = jax.vmap(per_frame, (0, 0, 0))(kf_pad, py, px)
        v_patch = jax.vmap(per_frame, (0, 0, 0))(v_pad, py, px)
        s = qf_c.shape[0]

        fine_aff = jnp.einsum(
            "qc,tqpc->tpq", qf_c, k_patch,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / temperature  # (T, P2, s)
        fine_aff = fine_aff + valid_bias[:, None, None]

        fine_aff = fine_aff.reshape(T * P2, s).T  # (s, T*P2)
        w, idx = jax.lax.top_k(fine_aff, topk)    # (s, k)
        w = jax.nn.softmax(w, axis=-1)

        v_flat = jnp.transpose(v_patch, (1, 0, 2, 3)).reshape(s, T * P2, Cv)
        vals = jnp.take_along_axis(v_flat, idx[..., None], axis=1)
        return jnp.einsum(
            "qk,qkc->qc", w, vals, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (s, Cv)

    py_all = by[:, :, None] + oy[None, None, :] + rf  # (T, Q, P2)
    px_all = bx[:, :, None] + ox[None, None, :] + rf

    if step is None or step >= Q:
        out = chunk_out((py_all, px_all, qf))
    else:
        s = step
        n = -(-Q // s)
        pad = n * s - Q
        py_c = jnp.pad(py_all, ((0, 0), (0, pad), (0, 0))).reshape(
            T, n, s, P2
        ).transpose(1, 0, 2, 3)
        px_c = jnp.pad(px_all, ((0, 0), (0, pad), (0, 0))).reshape(
            T, n, s, P2
        ).transpose(1, 0, 2, 3)
        qf_c = jnp.pad(qf, ((0, pad), (0, 0))).reshape(n, s, Cf)
        out = jax.lax.map(chunk_out, (py_c, px_c, qf_c)).reshape(
            n * s, Cv
        )[:Q]
    return out.reshape(hc, wc, Cv)


@functools.partial(
    jax.jit, static_argnames=("radius", "temperature", "topk")
)
def flow_guided_attention(
    corr: jax.Array,    # (T, Hq, Wq, H, W) correlation volumes per key frame
    flow: jax.Array,    # (T, Hq, Wq, 2) query->key flow predictions
    value: jax.Array,   # (T, H, W, Cv) label maps on the key frames
    *,
    radius: int = 6,
    temperature: float = 0.07,
    topk: int = 10,
) -> jax.Array:
    """Flow-predicted-center local attention
    (flow_guided_attention_efficient, local_attention.py:512-718).

    For each query pixel the candidate keys are a (2r+1)² window bilinearly
    sampled from the precomputed correlation map around (pixel + flow);
    values are sampled at the same points; top-k softmax propagates them.
    Returns (Hq, Wq, Cv).

    REFERENCE QUIRK: the reference's `temperature` parameter is DEAD — its
    body never divides by it (the caller pre-divides the corr volume,
    mixed_tracker.py:450). The parameter is kept for signature parity but,
    like the reference, unused.
    """
    from fgvc_tpu.ops.warp import bilinear_sample

    T, Hq, Wq, H, W = corr.shape
    Cv = value.shape[-1]
    Q = Hq * Wq
    r = radius
    P2 = (2 * r + 1) ** 2

    gy = jax.lax.broadcasted_iota(jnp.float32, (Hq, Wq), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (Hq, Wq), 1)
    centers = jnp.stack(
        [gx[None] + flow[..., 0], gy[None] + flow[..., 1]], axis=-1
    ).reshape(T, Q, 2)

    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy = jnp.repeat(offs, 2 * r + 1)
    ox = jnp.tile(offs, 2 * r + 1)
    pts = centers[:, :, None, :] + jnp.stack([ox, oy], -1)[None, None]  # (T,Q,P2,2)

    corr_q = corr.reshape(T, Q, H, W)

    def sample_corr_frame(corr_f, pts_f):
        # corr_f (Q, H, W); pts_f (Q, P2, 2)
        return jax.vmap(
            lambda m, p: bilinear_sample(m[..., None], p)[..., 0]
        )(corr_f, pts_f)

    del temperature  # dead in the reference too (see docstring)
    aff = jax.vmap(sample_corr_frame)(corr_q, pts)  # (T, Q, P2)

    def sample_value_frame(v_f, pts_f):
        # nearest sampling of values at the window points (reference uses
        # mode='nearest' for the value lookup)
        x = jnp.clip(jnp.round(pts_f[..., 0]), 0, W - 1).astype(jnp.int32)
        y = jnp.clip(jnp.round(pts_f[..., 1]), 0, H - 1).astype(jnp.int32)
        inside = (
            (pts_f[..., 0] >= 0) & (pts_f[..., 0] <= W - 1)
            & (pts_f[..., 1] >= 0) & (pts_f[..., 1] <= H - 1)
        )
        return v_f[y, x] * inside[..., None]

    vals = jax.vmap(sample_value_frame)(value, pts)  # (T, Q, P2, Cv)

    aff_flat = jnp.transpose(aff, (1, 0, 2)).reshape(Q, T * P2)
    w, idx = jax.lax.top_k(aff_flat, topk)
    w = jax.nn.softmax(w, axis=-1)
    v_flat = jnp.transpose(vals, (1, 0, 2, 3)).reshape(Q, T * P2, Cv)
    picked = jnp.take_along_axis(v_flat, idx[..., None], axis=1)
    out = jnp.einsum(
        "qk,qkc->qc",
        w,
        picked,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(Hq, Wq, Cv)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "temperature", "topk", "normalize", "step"),
)
def flow_guided_topk_attention(
    query: jax.Array,   # (h, w, C) query-frame features
    keys: jax.Array,    # (T, h, w, C) key-frame features
    values: jax.Array,  # (T, h, w, Cv) label maps on the key frames
    flows: jax.Array,   # (T, h, w, 2) query->key flow (x, y), feature pixels
    *,
    radius: int = 6,
    temperature: float = 0.07,
    topk: int = 10,
    normalize: bool = True,
    key_valid: Optional[jax.Array] = None,  # (T,) bool
    step: int = 1024,
) -> jax.Array:
    """Flow-predicted-center local attention, EFFICIENT form.

    The consumer-ready counterpart of `flow_guided_attention` (reference
    flow_guided_attention_efficient, local_attention.py:512-614 — the v1
    value semantics; the reference's _v2 at :617-718 bilinear-samples values
    (local_attention.py:689) where v1, the dense in-repo op, and this op all
    NEAREST-sample): instead
    of taking a dense (T, Hq, Wq, H, W) correlation volume — which at DAVIS
    feature shapes would be ~6 GB/frame — the affinity is formed directly as
    <query_feature, bilinear-sampled key features at the (2r+1)² window
    around (pixel + flow)>.  Because correlation is linear in the key
    features, bilinearly interpolating the correlation map (what the dense op
    and the reference do) equals correlating against bilinearly interpolated
    key features, so the two forms agree to float tolerance
    (tests/test_flow_guided.py).

    Semantics kept from the dense op / reference: values are NEAREST-sampled
    and zeroed outside the image; out-of-bounds affinity candidates enter
    top-k at 0 (the zero-padding quirk), not -inf.  DIVERGENCE: `temperature`
    is APPLIED here (the reference's parameter is dead because its caller
    pre-divides the corr volume — mixed_tracker.py:450); this op is the
    framework's own propagation wiring, so the division happens in-op like
    every other attention path.

    Returns (h, w, Cv).
    """
    from fgvc_tpu.ops.local_corr import part_unfold

    T, h, w, C = keys.shape
    Cv = values.shape[-1]
    Q = h * w
    r = radius
    P2 = (2 * r + 1) ** 2

    if normalize:
        query = l2_normalize(query)
        keys = l2_normalize(keys)

    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    base = jnp.stack([gx, gy], axis=-1).reshape(Q, 2)
    centers = base[None] + flows.reshape(T, Q, 2)  # (T, Q, 2)

    qf = query.reshape(Q, C)
    valid = (
        jnp.ones((T,), bool) if key_valid is None else key_valid.astype(bool)
    )

    s = min(step, Q)
    n = -(-Q // s)
    pad = n * s - Q
    qf_c = jnp.pad(qf, ((0, pad), (0, 0))).reshape(n, s, C)
    ctr_c = jnp.pad(centers, ((0, 0), (0, pad), (0, 0))).reshape(
        T, n, s, 2
    ).transpose(1, 0, 2, 3)  # (n, T, s, 2)

    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    oy = jnp.repeat(offs, 2 * r + 1)
    ox = jnp.tile(offs, 2 * r + 1)
    owin = jnp.stack([ox, oy], axis=-1)  # (P2, 2)

    def chunk_out(args):
        qc, cc = args  # (s, C), (T, s, 2)

        def per_frame(carry, tkv):
            kf, vf, ctr = tkv  # (h, w, C), (h, w, Cv), (s, 2)
            kp = part_unfold(kf, ctr, r).reshape(s, P2, C)
            aff = jnp.einsum(
                "sc,spc->sp",
                qc,
                kp,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) / temperature
            pts = ctr[:, None, :] + owin[None]  # (s, P2, 2)
            # nearest value sampling (reference uses mode='nearest'):
            x = jnp.clip(jnp.round(pts[..., 0]), 0, w - 1).astype(jnp.int32)
            y = jnp.clip(jnp.round(pts[..., 1]), 0, h - 1).astype(jnp.int32)
            inside = (
                (pts[..., 0] >= 0) & (pts[..., 0] <= w - 1)
                & (pts[..., 1] >= 0) & (pts[..., 1] <= h - 1)
            )
            vals = vf[y, x] * inside[..., None]  # (s, P2, Cv)
            return carry, (aff, vals)

        _, (aff, vals) = jax.lax.scan(
            per_frame, None, (keys, values, cc)
        )
        aff = jnp.where(valid[:, None, None], aff, -jnp.inf)
        aff = jnp.transpose(aff, (1, 0, 2)).reshape(s, T * P2)
        wts, idx = jax.lax.top_k(aff, topk)
        wts = jax.nn.softmax(wts, axis=-1)
        v_flat = jnp.transpose(vals, (1, 0, 2, 3)).reshape(s, T * P2, Cv)
        picked = jnp.take_along_axis(v_flat, idx[..., None], axis=1)
        return jnp.einsum(
            "qk,qkc->qc",
            wts,
            picked,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = jax.lax.map(chunk_out, (qf_c, ctr_c)).reshape(n * s, Cv)[:Q]
    return out.reshape(h, w, Cv)
