"""Label-propagation tracker — the eval engine (VanillaTracker equivalent).

Re-design of the reference inference path
(/root/reference/mmpt/models/trackers/vanilla_tracker.py:227-412) for TPU:

  * the per-frame python loop over the video becomes ONE `lax.scan` with a
    fixed-size rolling value buffer (first frame + `precede_frames`),
  * the feature bank lives in HBM (not parked on CPU like the reference),
  * key frames whose index would be negative are masked via `key_valid`
    instead of variable-length concatenation — this reproduces the
    reference's exact key set, including the duplicated first frame for
    t <= precede_frames,
  * heatmap upsampling + top-5 soft-argmax decode happen on-device inside the
    scan, so only (T, P, 2) coordinates ever reach the host,
  * variable video length / point count are handled by padding to static
    buckets; padded points decode to (-1, -1) and padded frames are dropped.

The query-frame grouping loop of forward_test stays on the host (it is pure
bookkeeping); each group reuses the single per-video feature bank via a
dynamic slice instead of re-running the backbone like the reference does.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgvc_tpu.config import TestConfig
from fgvc_tpu.ops.attention import masked_topk_attention
from fgvc_tpu.ops.grids import draw_gaussian_maps, soft_argmax_topk


def _bucket(n: int, b: int) -> int:
    return -(-n // b) * b


class Tracker:
    """Feature extraction + top-k attention label propagation.

    Args:
      apply_fn: backbone apply: (variables, images_nhwc) -> features_nhwc.
      variables: flax variables pytree ({'params', 'batch_stats'}).
      test_cfg: propagation hyper-parameters.
    """

    def __init__(self, apply_fn: Callable, variables, test_cfg: TestConfig):
        self.apply_fn = apply_fn
        self.variables = variables
        self.cfg = test_cfg
        self._extract = jax.jit(self._extract_impl, static_argnames=("chunk",))
        self._propagate = jax.jit(
            self._propagate_impl, static_argnames=("full_hw",)
        )

    # ------------------------------------------------------------------ #
    # feature extraction
    # ------------------------------------------------------------------ #
    def _extract_impl(self, video: jax.Array, chunk: int = 8) -> jax.Array:
        """(T, H, W, 3) normalized frames -> (T, h, w, C) features via scan."""
        T = video.shape[0]
        n = -(-T // chunk)
        pad = n * chunk - T
        video = jnp.pad(video, ((0, pad), (0, 0), (0, 0), (0, 0)))
        batches = video.reshape(n, chunk, *video.shape[1:])

        def body(_, imgs):
            return None, self.apply_fn(self.variables, imgs)

        _, feats = jax.lax.scan(body, None, batches)
        feats = feats.reshape(n * chunk, *feats.shape[2:])
        return feats[:T]

    def extract_features(self, video: jax.Array) -> jax.Array:
        return self._extract(video)

    # ------------------------------------------------------------------ #
    # propagation
    # ------------------------------------------------------------------ #
    def _propagate_impl(
        self,
        feats: jax.Array,       # (T, h, w, C) — frame 0 is the query frame
        init_maps: jax.Array,   # (P, h, w) value maps at feature resolution
        full_hw: Tuple[int, int],
    ) -> jax.Array:
        """Scan label propagation; returns (T, P, 2) decoded (x, y) coords.

        Frame 0's coords are decoded from the full-res init maps by the
        caller; here index 0 of the output is left as the feature-res decode
        of init_maps (overwritten on host).
        """
        cfg = self.cfg
        T, h, w, C = feats.shape
        P = init_maps.shape[0]
        radius = cfg.neighbor_range // 2
        n_keys = cfg.precede_frames + 1  # first frame + window

        first_feat = feats[0]
        first_value = jnp.transpose(init_maps, (1, 2, 0))  # (h, w, P)

        H_full, W_full = full_hw

        def decode(logits_hw_p):
            up = jax.image.resize(
                logits_hw_p, (H_full, W_full, P), method="bilinear"
            )
            return soft_argmax_topk(jnp.transpose(up, (2, 0, 1)), topk=5)

        def step(carry, t):
            value_buf = carry  # (precede, h, w, P), frames t-5..t-1 (last = t-1)
            query = feats[t]

            # window frame indices t-5+i, i = 0..precede-1; invalid if < 0
            offs = jnp.arange(cfg.precede_frames) - cfg.precede_frames
            win_idx = t + offs
            win_valid = win_idx >= 0
            win_feats = feats[jnp.clip(win_idx, 0, T - 1)]  # (precede, h, w, C)

            keys = jnp.concatenate([first_feat[None], win_feats], axis=0)
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            key_valid = jnp.concatenate(
                [jnp.ones((1,), bool), win_valid], axis=0
            )

            seg_logit = masked_topk_attention(
                query,
                keys,
                values,
                radius=float(radius),
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=cfg.with_norm,
                step=cfg.step,
                non_mask_len=0 if cfg.with_first_neighbor else 1,
                key_valid=key_valid,
            )  # (h, w, P)

            new_buf = jnp.concatenate([value_buf[1:], seg_logit[None]], axis=0)
            return new_buf, decode(seg_logit)

        init_buf = jnp.tile(first_value[None], (cfg.precede_frames, 1, 1, 1))
        # Reference semantics: for t <= precede_frames the window slots that
        # fall before frame 0 are invalid (masked), and slot contents for
        # valid indices are the real seg history. Initializing the buffer
        # with the first-frame value is safe: any slot holding it would be a
        # negative index and is therefore masked.
        _, coords = jax.lax.scan(step, init_buf, jnp.arange(1, T))

        coords0 = soft_argmax_topk(
            jnp.transpose(
                jax.image.resize(first_value, (H_full, W_full, P), "bilinear"),
                (2, 0, 1),
            ),
            topk=5,
        )
        return jnp.concatenate([coords0[None], coords], axis=0)  # (T, P, 2)

    # ------------------------------------------------------------------ #
    # public API: point tracking (TAP-Vid protocol)
    # ------------------------------------------------------------------ #
    def track_points(
        self,
        video: np.ndarray,          # (T, H, W, 3) preprocessed (Lab-normalized)
        query_points: np.ndarray,   # (P, 3) (t, x, y) in input pixels
    ) -> Dict[str, np.ndarray]:
        """Forward-test over a full video with query-frame grouping.

        Mirrors VanillaTracker.forward_test (with_first=True): points are
        grouped by query frame; each group is propagated from its query frame
        to the end of the video.  Returns trajectories (T, P, 2) and
        visibilities (T, P) (all zeros, like the reference).
        """
        cfg = self.cfg
        T, H, W, _ = video.shape
        P = query_points.shape[0]

        # One extra bucket of padding so per-group slices (start t, length
        # bucket(T - t)) never clamp at the end of the bank.
        t_pad = _bucket(T, cfg.frame_bucket) + cfg.frame_bucket
        video_p = np.concatenate(
            [video, np.repeat(video[-1:], t_pad - T, axis=0)], axis=0
        )
        feats = self.extract_features(jnp.asarray(video_p))
        h, w = feats.shape[1:3]
        stride = H // h

        traj_pred = np.zeros((T, P, 2), dtype=np.float32)

        ts = np.unique(query_points[:, 0].astype(np.int64))
        for t in ts:
            sel = np.nonzero(query_points[:, 0].astype(np.int64) == t)[0]
            pts = query_points[sel][:, 1:]  # (Pg, 2) x, y
            p_pad = _bucket(len(sel), cfg.point_bucket)
            pts_p = np.zeros((p_pad, 2), dtype=np.float32)
            pts_p[: len(sel)] = pts

            # gaussian heatmaps at feature resolution (strided grid)
            init_maps = draw_gaussian_maps(
                jnp.asarray(pts_p), H, W, sigma=cfg.sigma, stride=stride
            )
            # zero out padded points so they decode to (-1, -1)
            valid = (jnp.arange(p_pad) < len(sel)).astype(init_maps.dtype)
            init_maps = init_maps * valid[:, None, None]

            L_pad = _bucket(T - int(t), cfg.frame_bucket)
            feats_g = jax.lax.dynamic_slice_in_dim(feats, int(t), L_pad, axis=0)

            coords = self._propagate(feats_g, init_maps, (H, W))
            coords = np.array(coords)[: T - int(t), : len(sel)]

            # frame 0 of the group decodes from the FULL-res gaussian, like
            # the reference's seg_preds[0]
            full_maps = draw_gaussian_maps(
                jnp.asarray(pts), H, W, sigma=cfg.sigma, stride=1
            )
            coords0 = np.asarray(soft_argmax_topk(full_maps, topk=5))
            coords[0] = coords0

            traj_pred[int(t):, sel] = coords

        return {
            "trajectories": traj_pred,
            "visibilities": np.zeros((T, P), dtype=bool),
        }
