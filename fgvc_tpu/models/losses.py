"""Loss zoo — functional equivalents of the reference LOSSES registry.

The shipped recipe only uses Soft-CE (+ the BCE adversarial term computed in
mixed_tracker), but the reference registry carries a wider set used by its
ablation configs (/root/reference/mmpt/models/losses/losses.py:78-718,
nce_loss.py:12, concentration_loss.py:71).  Pure jittable functions; the
`weight` argument everywhere is an element mask averaged the reference's way
(sum(loss·w)/sum(w))."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _weighted_mean(loss, weight):
    if weight is None:
        return jnp.mean(loss)
    weight = jnp.broadcast_to(weight, loss.shape)
    return jnp.sum(loss * weight) / (jnp.sum(weight) + 1e-7)


def l1_loss(pred, target, weight=None):
    return _weighted_mean(jnp.abs(pred - target), weight)


def smooth_l1_loss(pred, target, weight=None, beta: float = 1.0):
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _weighted_mean(loss, weight)


def mse_loss(pred, target, weight=None):
    return _weighted_mean((pred - target) ** 2, weight)


def charbonnier_loss(pred, target, weight=None, eps: float = 1e-12):
    return _weighted_mean(jnp.sqrt((pred - target) ** 2 + eps), weight)


def ce_loss(pred_logits, target_index, weight=None):
    """Hard cross entropy over the last axis."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_index[..., None], axis=-1)[..., 0]
    return _weighted_mean(nll, weight)


def soft_ce_loss(pred_logits, target_logits, weight=None):
    """Soft cross entropy: -sum softmax(target)·log_softmax(pred), averaged
    over rows (Soft_Ce_Loss, losses.py:101)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    q = jax.nn.softmax(target_logits, axis=-1)
    per_row = -jnp.sum(q * logp, axis=-1)
    return _weighted_mean(per_row, weight)


def balanced_ce_loss(pred_logits, target_index, weight=None):
    """CE with inverse-frequency class weights over the batch."""
    n_cls = pred_logits.shape[-1]
    onehot = jax.nn.one_hot(target_index, n_cls)
    freq = onehot.reshape(-1, n_cls).mean(axis=0) + 1e-6
    cls_w = (1.0 / freq) / jnp.sum(1.0 / freq) * n_cls
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.sum(onehot * logp * cls_w, axis=-1)
    return _weighted_mean(nll, weight)


def kl_loss(pred_logits, target_logits, weight=None):
    """KL(softmax(target) || softmax(pred)) per row (Kl_Loss)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    q = jax.nn.softmax(target_logits, axis=-1)
    logq = jax.nn.log_softmax(target_logits, axis=-1)
    per_row = jnp.sum(q * (logq - logp), axis=-1)
    return _weighted_mean(per_row, weight)


def cosine_sim_loss(pred, target, weight=None, eps: float = 1e-8):
    """1 - cosine similarity over the last axis."""
    p = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + eps)
    t = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + eps)
    return _weighted_mean(1.0 - jnp.sum(p * t, axis=-1), weight)


def nce_loss(query, positives, temperature: float = 0.07):
    """InfoNCE with in-batch negatives (Nce_Loss, nce_loss.py:12).

    query, positives: (N, C) L2-normalizable embeddings.
    """
    q = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
    p = positives / (jnp.linalg.norm(positives, axis=-1, keepdims=True) + 1e-8)
    logits = q @ p.T / temperature
    labels = jnp.arange(q.shape[0])
    return ce_loss(logits, labels)


def concentration_loss(att: jax.Array, height: int, width: int):
    """Penalize spatially-spread attention: variance of the attended
    position around its mean (concentration_loss.py:71).

    att: (..., H*W) normalized attention rows.
    """
    gy = (jnp.arange(height * width) // width).astype(jnp.float32)
    gx = (jnp.arange(height * width) % width).astype(jnp.float32)
    my = jnp.sum(att * gy, axis=-1, keepdims=True)
    mx = jnp.sum(att * gx, axis=-1, keepdims=True)
    var = jnp.sum(att * ((gy - my) ** 2 + (gx - mx) ** 2), axis=-1)
    return jnp.mean(var)


def smoothness_loss(flow: jax.Array, weight=None):
    """First-order flow smoothness (SmoothnessLoss).

    `weight` masks per-pixel validity; it is cropped to the difference
    shapes (weight[1:] for dy, weight[:, 1:] for dx)."""
    dy = jnp.abs(flow[..., 1:, :, :] - flow[..., :-1, :, :])
    dx = jnp.abs(flow[..., :, 1:, :] - flow[..., :, :-1, :])
    wy = weight[..., 1:, :] if weight is not None else None
    wx = weight[..., :, 1:] if weight is not None else None
    return _weighted_mean(dy, wy) + _weighted_mean(dx, wx)


def bce_with_logits(logits, labels, weight=None):
    """Binary cross entropy with logits (the adversarial loss primitive)."""
    loss = (
        jnp.maximum(logits, 0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return _weighted_mean(loss, weight)


def gan_loss(logits, is_real: bool, mode: str = "vanilla"):
    """GANLoss equivalent (gan_loss.py:11): vanilla BCE or LSGAN MSE."""
    target = jnp.ones_like(logits) if is_real else jnp.zeros_like(logits)
    if mode == "vanilla":
        return bce_with_logits(logits, target)
    if mode == "lsgan":
        return jnp.mean((logits - target) ** 2)
    raise ValueError(f"unknown gan mode {mode}")
