"""Backward warping, bilinear sampling, and flow-consistency occlusion masks.

TPU equivalents of the reference's Warp / bilinear_sample / occlusion
estimation (/root/reference/mmpt/models/common/warp.py:28,
corr_lookup.py:29, occlusion_estimation.py:96).

`bilinear_sample` reproduces torch grid_sample(align_corners=True,
padding_mode='zeros') fed with pixel coordinates (the reference normalizes
pixel coords to [-1, 1] first; composing the two steps is plain bilinear
interpolation at pixel coords with zero padding).

`forward_backward_consistency` keeps the reference's literal formula —
including its ``flow_fw * 2`` term where ``flow_fw ** 2`` was almost
certainly intended — because the released models were trained with this
behavior (occlusion_estimation.py:113-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (H, W, C) at float pixel coords (..., 2) (x, y); zeros outside.

    Matches grid_sample(align_corners=True, padding_mode='zeros') after the
    reference's pixel→[-1,1] normalization: interpolation weights come from
    the raw pixel coordinates; samples outside [0, W-1]×[0, H-1] fade to 0.
    """
    H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        inside = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        vals = img[iyc, ixc]  # (..., C)
        return vals * inside[..., None]

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def backward_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp (H, W, C) by flow (H, W, 2): out[p] = img[p + flow[p]]."""
    H, W, _ = flow.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    coords = jnp.stack([gx + flow[..., 0], gy + flow[..., 1]], axis=-1)
    return bilinear_sample(img, coords)


def backward_warp_reference_quirk(img: jax.Array, flow: jax.Array) -> jax.Array:
    """The reference Warp module's MIXED-convention sampling
    (warp.py:9-26,28-75): coordinates are normalized to [-1, 1] with the
    align_corners=True formula (2p/(W-1) - 1) but grid_sample runs with
    its DEFAULT align_corners=False — so the effective sample position is
    p·W/(W-1) − 0.5 per axis (center fixed, ±0.5 px drift at the borders).
    The module also multiplies by a HARD validity mask —
    grid_sample(ones) > 0.9999 (warp.py:73-82) — zeroing any output whose
    bilinear support touches outside the image instead of fading it.
    The training occlusion masks (mixed_tracker.py:295,325 →
    occlusion_estimation) carry both quirks; reproduced here for parity."""
    H, W, _ = flow.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    tx = (gx + flow[..., 0]) * (W / (W - 1)) - 0.5
    ty = (gy + flow[..., 1]) * (H / (H - 1)) - 0.5
    coords = jnp.stack([tx, ty], axis=-1)
    out = bilinear_sample(img, coords)
    ones = jnp.ones((H, W, 1), img.dtype)
    valid = bilinear_sample(ones, coords) > 0.9999
    return out * valid.astype(img.dtype)


def forward_backward_consistency(
    flow_fw: jax.Array, flow_bw: jax.Array
) -> jax.Array:
    """(H, W) float mask, 1 = consistent (non-occluded).

    occ = |f_fw + warp(f_bw, f_fw)|² < (f_fw*2 + warp(f_bw, f_fw)²)·0.01 + 0.5
    — the reference's literal formula, ``flow_fw * 2`` quirk included, and
    its mixed-convention Warp sampling (backward_warp_reference_quirk).
    """
    warped_bw = backward_warp_reference_quirk(flow_bw, flow_fw)
    sq_diff = jnp.sum((flow_fw + warped_bw) ** 2, axis=-1)
    sum_sq = jnp.sum(flow_fw * 2 + warped_bw**2, axis=-1)
    return (sq_diff < sum_sq * 0.01 + 0.5).astype(flow_fw.dtype)


def forward_backward_absdiff(
    flow_fw: jax.Array, flow_bw: jax.Array, diff: float = 1.5
) -> jax.Array:
    """(H, W) mask: |f_fw + warp(f_bw, f_fw)| < diff (fb_abs mode,
    occlusion_estimation.py:122; quirky Warp sampling included)."""
    warped_bw = backward_warp_reference_quirk(flow_bw, flow_fw)
    sq = jnp.sum((flow_fw + warped_bw) ** 2, axis=-1)
    return (jnp.sqrt(sq) < diff).astype(flow_fw.dtype)


def compute_range_map(flow: jax.Array) -> jax.Array:
    """Soft occupancy count of flow targets via bilinear scatter-add
    (range_map mode: pixels nobody flows into are likely occluded)."""
    H, W, _ = flow.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    tx = (gx + flow[..., 0]).reshape(-1)
    ty = (gy + flow[..., 1]).reshape(-1)

    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    counts = jnp.zeros((H, W), jnp.float32)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        w = (1 - jnp.abs(tx - xi)) * (1 - jnp.abs(ty - yi))
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        counts = counts.at[yi_c, xi_c].add(jnp.where(inside, w, 0.0))
    return counts


def occlusion_masks(
    flow_fw: jax.Array, flow_bw: jax.Array, mode: str = "consistency", **kw
):
    """dict(occ_fw, occ_bw): 1 = non-occluded.  Modes mirror
    occlusion_estimation (occlusion_estimation.py:148): 'consistency',
    'fb_abs', or 'range_map' (thresholded target coverage)."""
    if mode == "consistency":
        fw = forward_backward_consistency(flow_fw, flow_bw)
        bw = forward_backward_consistency(flow_bw, flow_fw)
    elif mode == "fb_abs":
        fw = forward_backward_absdiff(flow_fw, flow_bw, **kw)
        bw = forward_backward_absdiff(flow_bw, flow_fw, **kw)
    elif mode == "range_map":
        # reference threshold is count >= 1 (occlusion_estimation.py:91)
        fw = (compute_range_map(flow_bw) >= 1.0).astype(flow_fw.dtype)
        bw = (compute_range_map(flow_fw) >= 1.0).astype(flow_fw.dtype)
    else:
        raise ValueError(f"unknown occlusion mode {mode}")
    return {"occ_fw": fw, "occ_bw": bw}


def compose_flows(f_ab: jax.Array, g_bc: jax.Array) -> jax.Array:
    """Compose two backward flows: (f_ab ∘ g_bc)(x) = f_ab(x) + g_bc(x + f_ab(x)).

    `f_ab` maps frame-a pixels into frame b, `g_bc` maps frame-b pixels into
    frame c; the result maps frame-a pixels into frame c.  Both are (h, w, 2)
    (x, y) pixel-unit flows; `g_bc` is bilinearly sampled at the f_ab targets
    (zeros outside — off-frame chains degrade toward the f_ab endpoint).
    """
    h, w = f_ab.shape[:2]
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    tgt = jnp.stack([gx + f_ab[..., 0], gy + f_ab[..., 1]], axis=-1)
    return f_ab + bilinear_sample(g_bc, tgt)


def chain_window_flows(adj: jax.Array, precede_frames: int) -> jax.Array:
    """Chain adjacent-frame flows into the tracker's key-window flows.

    The flow-guided propagation mode (reference
    flow_guided_attention_efficient, local_attention.py:512-718 — no in-tree
    caller there; the reference's empty tools/data/ytv/chain_flow.py names
    this exact chaining step) needs, for every query frame t, a flow to each
    key-window frame {0, t-K, …, t-1}.  Given adjacent backward flows
    ``adj`` of shape (T-1, h, w, 2) with ``adj[i]`` = flow frame i+1 → i,
    this scans the compositions

        W_t[1] = adj[t-1],   W_t[k] = adj[t-1] ∘ W_{t-1}[k-1],
        C_t    = adj[t-1] ∘ C_{t-1}          (C_0 = 0, the flow 0 → 0)

    and returns (T-1, K+1, h, w, 2): row t-1 holds the flows for query frame
    t ordered [→frame 0, →t-K, …, →t-1] — exactly the tracker's
    `_window_indices` slot order.  Slots whose window index is pre-video are
    meaningless here and masked by `key_valid` downstream.
    """
    K = precede_frames
    if K < 1:
        # K=0 would give the scan a (1,...) carry vs a (0,...) init (an
        # opaque lax.scan structure error); the flow-guided window always
        # includes at least the previous frame.
        raise ValueError(
            f"chain_window_flows needs precede_frames >= 1, got {K}"
        )
    h, w = adj.shape[1:3]

    def step(carry, f):
        warr, c0 = carry  # warr[j] = flow t-1 -> (t-1)-(j+1); c0 = t-1 -> 0
        new_warr = jnp.concatenate(
            [f[None], jax.vmap(lambda g: compose_flows(f, g))(warr[:-1])]
        )
        new_c0 = compose_flows(f, c0)
        out = jnp.concatenate([new_c0[None], new_warr[::-1]])
        return (new_warr, new_c0), out

    init = (
        jnp.zeros((K, h, w, 2), jnp.float32),
        jnp.zeros((h, w, 2), jnp.float32),
    )
    _, wflows = jax.lax.scan(step, init, adj)
    return wflows
