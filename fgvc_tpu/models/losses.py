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


def multi_nce_loss(pred_logits, target, reduction: str = "mean"):
    """Multi-positive NCE (Multi_Nce_Loss 'in_sum' mode, nce_loss.py:45-91):
    -log(sum_j softmax(pred)_j * target_j) per row.

    ``target`` is a (soft or binary) positive-mass distribution over the M
    candidates.  Only the 'in_sum' mode is implemented: the reference's other
    branch takes an elementwise log of the masked softmax (−inf wherever
    target==0) and its (N, M)/(N,) broadcast only type-checks when M == N —
    it is non-functional as written (nce_loss.py:81-82).
    """
    logp = jax.nn.log_softmax(pred_logits, axis=1)
    # log(sum_j exp(logp_j) * t_j) computed stably in log space
    loss = -jax.scipy.special.logsumexp(
        logp, axis=1, b=target
    )
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def kl_gaussian_loss(mu_pred, logvar_pred, mu_target, logvar_target,
                     weight=None):
    """KL(N(mu1, e^logvar1) || N(mu2, e^logvar2)) — Kl_Loss_Gaussion
    (losses.py:488-530, VAE form):

        log(sigma2 / (sigma1 + 1e-7)) + (e^logvar1 + (mu1-mu2)^2) /
        (2 e^logvar2) - 1/2

    elementwise, reduced as mean (or the reference's masked sum/sum(weight)).
    """
    sigma1 = jnp.exp(0.5 * logvar_pred)
    sigma2 = jnp.exp(0.5 * logvar_target)
    kld = (
        jnp.log(sigma2 / (sigma1 + 1e-7))
        + (jnp.exp(logvar_pred) + (mu_pred - mu_target) ** 2)
        / (2.0 * jnp.exp(logvar_target))
        - 0.5
    )
    if weight is not None:
        return jnp.sum(kld * weight) / jnp.sum(weight)
    return jnp.mean(kld)


def kl_laplace_loss(mu_pred, b_pred, mu_target, b_target, weight=None):
    """KL between two Laplace distributions — Kl_Loss_Laplace
    (losses.py:532-575).  QUIRK kept: the reference names the scale inputs
    `logvar` but uses them DIRECTLY as the Laplace scale b (no exp), i.e.

        (b1 * e^(-|mu1-mu2|/b1) + |mu1-mu2|) / b2 + log(b2/(b1+1e-9)) - 1
    """
    ad = jnp.abs(mu_pred - mu_target)
    term1 = (b_pred * jnp.exp(-ad / b_pred) + ad) / b_target
    term2 = jnp.log(b_target / (b_pred + 1e-9)) - 1.0
    kld = term1 + term2
    if weight is not None:
        return jnp.sum(kld * weight) / jnp.sum(weight)
    return jnp.mean(kld)


def discrete_loss(pred, target_flow, nbins: int, fmax: float):
    """Quantized-flow cross-entropy — DiscreteLoss (losses.py:448-483).

    pred: (N, h, w, 2*nbins) logits, channels-last ([:nbins] = x-bins,
    [nbins:] = y-bins, matching the reference's channel split of the
    NCHW input); target_flow: (N, H, W, 2).  If (h, w) != (H, W) the
    logits are bilinearly upsampled with align_corners=True (the
    reference's F.interpolate call).  Targets clamp to ±(fmax - 1e-3) and
    quantize with step 2*fmax/nbins.
    """
    if nbins % 2 != 1:
        raise ValueError("nbins should be odd")
    N, H, W, _ = target_flow.shape
    h, w = pred.shape[1], pred.shape[2]
    if (h, w) != (H, W):
        # align_corners=True bilinear: output i samples input at
        # i*(h-1)/(H-1)
        from fgvc_tpu.ops.warp import bilinear_sample

        gy = jnp.arange(H, dtype=jnp.float32) * ((h - 1) / max(H - 1, 1))
        gx = jnp.arange(W, dtype=jnp.float32) * ((w - 1) / max(W - 1, 1))
        coords = jnp.stack(
            jnp.meshgrid(gx, gy, indexing="xy"), axis=-1
        )  # (H, W, 2) (x, y)
        pred = jax.vmap(lambda m: bilinear_sample(m, coords))(pred)
    step = 2.0 * fmax / float(nbins)
    t = jnp.clip(target_flow, -fmax + 1e-3, fmax - 1e-3)
    bins = jnp.floor((t + fmax) / step).astype(jnp.int32)  # (N, H, W, 2)
    logp_x = jax.nn.log_softmax(pred[..., :nbins], axis=-1)
    logp_y = jax.nn.log_softmax(pred[..., nbins:], axis=-1)
    nll_x = -jnp.take_along_axis(logp_x, bins[..., 0:1], axis=-1)
    nll_y = -jnp.take_along_axis(logp_y, bins[..., 1:2], axis=-1)
    return jnp.mean(nll_x) + jnp.mean(nll_y)


def disc_shift_loss(disc_out):
    """DiscShiftLoss (gan_loss.py:303-330): mean(x²) regularizer keeping
    discriminator logits near zero (reference default loss_weight 0.1 is
    applied by the caller, like every weight here)."""
    return jnp.mean(disc_out**2)


def gradient_penalty_loss(disc_fn, real, fake, rng, mask=None):
    """WGAN-GP gradient penalty — gradient_penalty_loss + GradientPenaltyLoss
    (gan_loss.py:239-299).

    disc_fn: batched discriminator callable.  A per-sample alpha ~ U(0,1)
    interpolates real/fake; the penalty is ((‖∂D/∂x‖₂ over the CHANNEL
    axis − 1)²).mean() — the reference norms over dim=1 of NCHW, which is
    the trailing axis in this framework's channels-last layout.  With a
    mask, gradients are masked first and the mean is divided by mean(mask).
    The torch autograd.grad(create_graph=True) plumbing is just jax.grad
    composition here — the penalty is differentiable through disc_fn's
    parameters by construction.
    """
    n = real.shape[0]
    alpha = jax.random.uniform(rng, (n,) + (1,) * (real.ndim - 1))
    interp = alpha * real + (1.0 - alpha) * fake
    grads = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interp)
    if mask is not None:
        grads = grads * mask
    gnorm = jnp.sqrt(jnp.sum(grads**2, axis=-1) + 1e-12)
    penalty = jnp.mean((gnorm - 1.0) ** 2)
    if mask is not None:
        penalty = penalty / jnp.mean(mask)
    return penalty
