"""Pure-numpy oracles implementing the reference algorithms directly.

These intentionally follow the torch reference's computation order
(/root/reference/mmpt/models/common/local_attention.py:267,
 /root/reference/mmpt/models/trackers/vanilla_tracker.py:305) so the jitted
TPU implementations can be numerically verified against them on small inputs.
"""

from __future__ import annotations

import numpy as np


def l2_normalize_np(x, axis, eps=1e-12):
    n = np.sqrt(np.sum(x * x, axis=axis, keepdims=True))
    return x / np.maximum(n, eps)


def masked_attention_ref(
    query,          # (C, H, W)
    key,            # (C, T, H, W)
    value,          # (Cv, T, H, W)
    radius,         # circle mask radius (== neighbor_range // 2) or None
    temperature=1.0,
    topk=None,
    normalize=True,
    non_mask_len=0,
    key_valid=None,  # (T,) bool
):
    """Reference masked_attention_efficient on a single batch element."""
    C, H, W = query.shape
    T = key.shape[1]
    Cv = value.shape[0]
    if normalize:
        query = l2_normalize_np(query, axis=0)
        key = l2_normalize_np(key, axis=0)
    q = query.reshape(C, -1)                      # (C, HW)
    k = key.reshape(C, -1)                        # (C, T*HW)
    v = value.reshape(Cv, -1)                     # (Cv, T*HW)

    aff = (k.T @ q) / temperature                 # (T*HW, HW)

    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gy = gy.reshape(-1).astype(np.float64)
    gx = gx.reshape(-1).astype(np.float64)
    if radius is not None:
        d = np.sqrt(
            (gy[:, None] - gy[None, :]) ** 2 + (gx[:, None] - gx[None, :]) ** 2
        )
        mask = d < radius                          # (HW key, HW query)
        mask_t = np.tile(mask, (T, 1))             # (T*HW, HW)
        for t in range(min(non_mask_len, T)):
            mask_t[t * H * W : (t + 1) * H * W] = True
        aff = np.where(mask_t, aff, -np.inf)
    if key_valid is not None:
        for t in range(T):
            if not key_valid[t]:
                aff[t * H * W : (t + 1) * H * W] = -np.inf

    if topk is not None:
        idx = np.argsort(-aff, axis=0, kind="stable")[:topk]     # (k, HW)
        w = np.take_along_axis(aff, idx, axis=0)                  # (k, HW)
        w = np.exp(w - w.max(axis=0, keepdims=True))
        w = w / w.sum(axis=0, keepdims=True)
        vals = v[:, idx]                                          # (Cv, k, HW)
        out = np.einsum("ckq,kq->cq", vals, w)
    else:
        w = np.exp(aff - aff.max(axis=0, keepdims=True))
        w = w / w.sum(axis=0, keepdims=True)
        out = v @ w
    return out.reshape(Cv, H, W)


def local_correlation_ref(tar, ref, radius):
    """Brute-force displacement-window correlation.

    tar/ref: (H, W, C) -> (H, W, 2R+1, 2R+1)."""
    H, W, C = tar.shape
    win = 2 * radius + 1
    ref_pad = np.pad(ref, ((radius, radius), (radius, radius), (0, 0)))
    out = np.zeros((H, W, win, win), dtype=np.float64)
    for i in range(H):
        for j in range(W):
            window = ref_pad[i : i + win, j : j + win]  # (win, win, C)
            out[i, j] = window @ tar[i, j]
    return out


def propagate_ref(
    feats,         # (T, h, w, C)
    init_maps,     # (P, h, w)
    full_hw,
    *,
    precede_frames=5,
    topk=10,
    temperature=0.07,
    radius=15,
    step=None,
    upsample_fn=None,
    with_first=True,
    hard_prop=False,
):
    """Reference forward_test_main propagation loop (python, per-frame).

    with_first=False drops the frame-0 key/value concat (the reference's
    variable-length `key_start:frame_idx` window, vanilla_tracker.py:353).
    hard_prop stores argmax→one-hot maps in the bank while returning the
    SOFT logits per frame (vanilla_tracker.py:762-765).
    """
    T, h, w, C = feats.shape
    P = init_maps.shape[0]
    feats_cf = np.transpose(feats, (0, 3, 1, 2))  # (T, C, h, w)
    bank = [init_maps.astype(np.float64)]         # list of (P, h, w)
    soft = [init_maps.astype(np.float64)]
    for t in range(1, T):
        ks = max(0, t - precede_frames)
        key_frames = ([0] if with_first else []) + list(range(ks, t))
        key = np.stack([feats_cf[i] for i in key_frames], axis=1)  # (C,K,h,w)
        val = np.stack([bank[i] for i in key_frames], axis=1)
        seg = masked_attention_ref(
            feats_cf[t], key, val,
            radius=radius, temperature=temperature, topk=topk,
        )  # (P, h, w)
        if hard_prop:
            win = np.argmax(seg, axis=0)  # first-max argmax, like jnp/torch
            onehot = np.eye(P)[win].transpose(2, 0, 1)
            bank.append(onehot)
        else:
            bank.append(seg)
        soft.append(seg)
    return soft  # list of (P, h, w) SOFT logits, length T


def img2coord_np(maps, topk=5):
    """Reference-exact numpy soft-argmax (tie-breaking included).

    Restates VanillaTracker.img2coord
    (/root/reference/mmpt/models/trackers/vanilla_tracker.py:172-191) for
    golden-testing the jitted soft_argmax_topk decode.

    Args:
      maps: (T, P, H, W).
    Returns:
      (2, P, T) coords, channel 0 = x, channel 1 = y; -1 where map sums to 0.
    """
    clip_len, num_p, height, width = maps.shape
    coords = np.zeros((2, num_p, clip_len), dtype=float)
    flat = maps.reshape(clip_len, num_p, -1)
    topk_indices = np.argsort(flat, axis=-1)[..., -topk:]
    topk_values = np.take_along_axis(flat, topk_indices, axis=-1)
    topk_values = topk_values / (np.sum(topk_values, keepdims=True, axis=-1) + 1e-9)
    topk_x = topk_indices % width
    topk_y = topk_indices // width
    coords[0] = np.sum(topk_x * topk_values, axis=-1).T
    coords[1] = np.sum(topk_y * topk_values, axis=-1).T
    coords[:, np.sum(flat.transpose(1, 0, 2), axis=-1) == 0] = -1
    return coords
