"""Mixed training objective — self-supervised reconstruction + flow-supervised
correlation distillation + adversarial domain alignment.

TPU-native re-design of Mixed_Tracker / Memory_Tracker_Custom_V2
(/root/reference/mmpt/models/trackers/mixed_tracker.py:76-473) as pure loss
functions over flax modules:

  (i)  frame reconstruction: drop a Lab chroma channel, compute the local
       correlation volume between the two frames' features (radius 24 at
       stride-2 features), softmax it, and reconstruct the dropped channel of
       the target frame from the reference frame's pixels (MAST-style);
  (ii) supervised distillation on synthetic pairs with ground-truth flow:
       the frozen teacher's flow-warped self-correlation (divided by 0.07)
       is the soft target for the student's cross-frame correlation, with a
       Soft-CE loss on flow-valid, non-occluded pixels;
  (iii) adversarial alignment of correlation volumes between the synthetic
       (source) and unlabeled (target) domains via a gradient-reversal MLP
       discriminator + BCE.

Reference quirks reproduced deliberately (they produced the released models):
  * the teacher's features are L2-normalized along the HEIGHT axis — the
    reference calls F.normalize(self_f, dim=2) on a (B, C, H, W) tensor
    (mixed_tracker.py:422), so dim 2 is H, not channels;
  * forward-backward consistency uses ``flow_fw * 2`` (see ops/warp.py);
  * the same dropped-channel index is shared across the whole batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fgvc_tpu.config import TrainConfig
from fgvc_tpu.ops.attention import l2_normalize
from fgvc_tpu.ops.gradient_reversal import gradient_reversal
from fgvc_tpu.ops.local_corr import extract_displacement_windows, local_correlation
from fgvc_tpu.ops.warp import bilinear_sample, forward_backward_consistency


class GradReverseDiscriminator(nn.Module):
    """3-layer MLP behind a gradient-reversal op
    (mixed_tracker.py:35-53)."""

    feat_dim: int
    alpha: float = 1.0

    @nn.compact
    def __call__(self, x):  # (..., feat_dim)
        x = gradient_reversal(x, self.alpha)
        x = nn.relu(nn.Dense(self.feat_dim // 2)(x))
        x = nn.relu(nn.Dense(self.feat_dim // 4)(x))
        return nn.Dense(1)(x)


def smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def soft_ce(pred_logits, target_logits):
    """Per-row soft cross entropy: -sum softmax(target) * log_softmax(pred)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    q = jax.nn.softmax(target_logits, axis=-1)
    return -jnp.sum(q * logp, axis=-1)


def drop_lab_channel(frames: jax.Array, rng: jax.Array):
    """Zero one random chroma channel (1 or 2) on every frame, rescale by 1.5.

    frames: (..., 3) Lab-normalized.  Returns (dropped, ch_index).
    Mirrors dropout2d_lab (mixed_tracker.py:145): one channel from {a, b},
    shared across the batch and both frames.
    """
    ch = jax.random.randint(rng, (), 1, 3)  # 1 or 2
    mask = jnp.arange(3) != ch
    dropped = frames * mask * (3.0 / 2.0)
    return dropped, ch


def _take_channel(x: jax.Array, ch: jax.Array) -> jax.Array:
    """x (..., 3), ch scalar traced index -> (..., 1)."""
    return jnp.take_along_axis(
        x, jnp.broadcast_to(ch, x.shape[:-1])[..., None], axis=-1
    )


def reconstruction_loss(
    feats_pair: jax.Array,   # (B, 2, h, w, C) raw student features
    clean_pair: jax.Array,   # (B, 2, H, W, 3) clean Lab-normalized frames
    ch: jax.Array,           # dropped channel index
    cfg: TrainConfig,
) -> Tuple[jax.Array, jax.Array]:
    """MAST reconstruction: returns (loss, corr_target_volume).

    corr_target_volume (B, h, w, (2R+1)²) is reused by the adversarial
    branch (raw, pre-softmax — mixed_tracker.py:393,464).
    """
    B, _, h, w, C = feats_pair.shape
    R = cfg.radius
    win2 = (2 * R + 1) ** 2
    tar, ref = feats_pair[:, 1], feats_pair[:, 0]

    corr = jax.vmap(
        lambda t, r: local_correlation(t, r, R, precision=cfg.matmul_precision)
    )(tar, ref)
    corr = corr.reshape(B, h, w, win2)

    att = jax.nn.softmax(corr / jnp.sqrt(jnp.float32(C)), axis=-1)

    # reconstruct from the clean REFERENCE frame's dropped channel
    ref_gt = _take_channel(clean_pair[:, 0], ch)  # (B, H, W, 1)
    d = cfg.downsample_rate
    ref_gt_small = ref_gt[:, ::d, ::d]  # (B, h, w, 1)
    windows = jax.vmap(lambda x: extract_displacement_windows(x, R))(ref_gt_small)
    windows = windows.reshape(B, h, w, win2)

    recon = jnp.sum(att * windows, axis=-1, keepdims=True)  # (B, h, w, 1)
    H, W = clean_pair.shape[2:4]
    recon_up = jax.image.resize(recon, (B, H, W, 1), method="bilinear")

    tar_gt = _take_channel(clean_pair[:, 1], ch)  # (B, H, W, 1)
    loss = jnp.mean(
        smooth_l1(recon_up * cfg.rec_weight, tar_gt * cfg.rec_weight)
    )
    return loss, corr


def supervised_distillation_loss(
    student_pair: jax.Array,   # (B, 2, h, w, C) raw student features (sup)
    teacher_feat: jax.Array,   # (B, h, w, C) teacher features of clean frame 0
    flow: jax.Array,           # (B, H, W, 2) frame1->frame0 flow (full res)
    flow_back: jax.Array,      # (B, H, W, 2)
    cfg: TrainConfig,
) -> jax.Array:
    """Soft-CE between student cross-frame corr and teacher warped self-corr
    (mixed_tracker.py:407-457)."""
    B, _, h, w, C = student_pair.shape
    R = cfg.radius
    win2 = (2 * R + 1) ** 2
    s = cfg.scale

    # Teacher quirk: normalize along the HEIGHT axis (see module docstring).
    tf = l2_normalize(teacher_feat, axis=1)

    occ = jax.vmap(forward_backward_consistency)(
        flow, flow_back
    )  # (B, H, W)
    occ_s = occ[:, ::s, ::s]

    flow_s = flow[:, ::s, ::s] / float(cfg.downsample_rate)  # feature units
    flow_d = flow_s + R
    valid = (
        (flow_d[..., 0] >= 0)
        & (flow_d[..., 0] <= 2 * R)
        & (flow_d[..., 1] >= 0)
        & (flow_d[..., 1] <= 2 * R)
        & occ_s.astype(bool)
    )  # (B, h, w)

    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    coords = jnp.stack(
        [gx[None] + flow_s[..., 0], gy[None] + flow_s[..., 1]], axis=-1
    )  # (B, h, w, 2)
    warp_tf = jax.vmap(bilinear_sample)(tf, coords)

    t_corr = jax.vmap(
        lambda t, r: local_correlation(t, r, R, precision=cfg.matmul_precision)
    )(warp_tf, tf)
    target = jax.lax.stop_gradient(
        t_corr.reshape(B, h, w, win2) / cfg.temperature_t
    )

    sn = l2_normalize(student_pair, axis=-1)
    s_corr = jax.vmap(
        lambda t, r: local_correlation(t, r, R, precision=cfg.matmul_precision)
    )(sn[:, 1], sn[:, 0])
    pred = s_corr.reshape(B, h, w, win2) / cfg.temperature_t

    ce = soft_ce(pred.reshape(-1, win2), target.reshape(-1, win2))
    wmask = valid.reshape(-1).astype(jnp.float32)
    return jnp.sum(ce * wmask) / jnp.maximum(jnp.sum(wmask), 1.0)


def adversarial_corr_loss(
    disc_apply,
    disc_params,
    corr_source: jax.Array,  # (B, h, w, win2) synthetic-domain corr volume
    corr_target: jax.Array,  # (B, h, w, win2) real-domain corr volume
) -> jax.Array:
    """BCE on per-pixel correlation volumes through the gradient-reversal
    discriminator: source label 0, target label 1 (mixed_tracker.py:461-470)."""
    win2 = corr_source.shape[-1]
    src = disc_apply(disc_params, corr_source.reshape(-1, win2))[:, 0]
    tgt = disc_apply(disc_params, corr_target.reshape(-1, win2))[:, 0]
    logits = jnp.concatenate([src, tgt], axis=0)
    labels = jnp.concatenate(
        [jnp.zeros_like(src), jnp.ones_like(tgt)], axis=0
    )
    # binary_cross_entropy_with_logits
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)
