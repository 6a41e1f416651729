"""Label-propagation tracker — the eval engine (VanillaTracker equivalent).

Re-design of the reference inference paths
(/root/reference/mmpt/models/trackers/vanilla_tracker.py:227-412 point
tracking; :663-831 heatmap/mask propagation) for TPU:

  * the per-frame python loop over the video becomes ONE `lax.scan` with a
    fixed-size rolling value buffer (first frame + `precede_frames`),
  * the feature bank lives in HBM (not parked on CPU like the reference),
  * key frames whose index would be negative are masked via `key_valid`
    instead of variable-length concatenation — this reproduces the
    reference's exact key set, including the duplicated first frame for
    t <= precede_frames,
  * heatmap upsampling + top-5 soft-argmax decode (or mask argmax) happen
    on-device inside the scan, so only (T, P, 3) (x, y, peak) rows or
    (T, H, W) label maps ever reach the host,
  * variable video length / point count are handled by padding to static
    buckets; padded points decode to (-1, -1) and padded frames are dropped.

Three public entry points:
  track_points     — TAP-Vid protocol (query-frame grouping, gaussian maps)
  track_heatmaps   — JHMDB / BADJA keypoint protocol (given reference
                     heatmaps, square correlation window)
  track_masks      — DAVIS VOS protocol (one-hot masks, argmax decode)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fgvc_tpu.config import TestConfig
from fgvc_tpu.ops.attention import masked_topk_attention
from fgvc_tpu.ops.color import (
    preprocess_rgb_to_lab_normalized,
    preprocess_yuv420_to_lab_normalized,
)
from fgvc_tpu.ops.grids import draw_gaussian_maps, soft_argmax_topk
from fgvc_tpu.ops.warp import chain_window_flows
from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled


def _bucket(n: int, b: int) -> int:
    return -(-n // b) * b


def _put(x, device):
    """device_put when pinned, plain asarray otherwise (explicit
    device_put costs an extra tunnel round-trip on single-device runtimes).
    """
    return jax.device_put(x, device) if device is not None else jnp.asarray(x)


def _dispatch_device(feats):
    """The device small dispatch inputs must follow so multi-device
    round-robin never mixes committed devices; None on single-device
    runtimes (see _put)."""
    if len(jax.local_devices()) > 1 and hasattr(feats, "devices"):
        return next(iter(feats.devices()))
    return None


def _hard_onehot(seg_logit: jax.Array) -> jax.Array:
    """hard_prop re-encoding: argmax→one-hot over the channel axis
    (reference vanilla_tracker.py:762-765 — applied to bank entries only,
    never to the emitted per-frame decode)."""
    P = seg_logit.shape[-1]
    return jax.nn.one_hot(
        jnp.argmax(seg_logit, axis=-1), P, dtype=seg_logit.dtype
    )


class Tracker:
    """Feature extraction + top-k attention label propagation.

    Args:
      apply_fn: backbone apply: (variables, images_nhwc) -> features_nhwc.
      variables: flax variables pytree ({'params', 'batch_stats'}).
      test_cfg: propagation hyper-parameters.
    """

    def __init__(
        self,
        apply_fn: Callable,
        variables,
        test_cfg: TestConfig,
        spatial_mesh=None,
        bank_mesh=None,
    ):
        self.apply_fn = apply_fn
        self.variables = variables
        self.cfg = test_cfg
        if test_cfg.visibility_mode not in ("none", "heatmap"):
            raise ValueError(
                "visibility_mode must be 'none' or 'heatmap', got "
                f"{test_cfg.visibility_mode!r}"
            )
        if test_cfg.preprocess not in ("lab", "imagenet"):
            raise ValueError(
                "preprocess must be 'lab' or 'imagenet', got "
                f"{test_cfg.preprocess!r}"
            )
        # Per-tile slices straight from the full bank are fastest for small
        # banks but degrade badly on multi-GB banks (TPU gather locality);
        # past this many frames, the tiled path gathers the window's padded
        # frames once per step instead (tests override to force the branch)
        self.pure_bank_max_frames = 160
        # spatial-parallel propagation: a 1-axis jax.sharding.Mesh named
        # 'space'; each frame's query ROWS are sharded over it (shard_map),
        # the per-frame logits all_gather'ed over ICI to roll the value
        # buffer — single-video latency scales with the mesh instead of
        # only video-throughput (the --local-devices round-robin)
        self.spatial_mesh = spatial_mesh
        # bank-parallel propagation: a 1-axis jax.sharding.Mesh named
        # 'bank'; the feature bank's FRAMES are sharded over it (shard_map)
        # so banks larger than one chip's HBM fit — a distributed exact
        # top-k (local top-k lists → all_gather merge → psum'd partial
        # softmax mix) keeps the propagation semantics (see
        # ops/windowed_attention.py masked_topk_attention_tiled_bank_sharded)
        self.bank_mesh = bank_mesh
        if spatial_mesh is not None and bank_mesh is not None:
            raise ValueError(
                "spatial_mesh and bank_mesh are separate scaling axes; "
                "pass at most one (composition is not implemented)"
            )
        if bank_mesh is not None:
            if "bank" not in bank_mesh.axis_names:
                raise ValueError("bank_mesh needs an axis named 'bank'")
            if test_cfg.attention_impl != "tiled":
                raise ValueError(
                    "bank-parallel propagation supports attention_impl "
                    f"'tiled', not {test_cfg.attention_impl!r}"
                )
            if test_cfg.topk is None:
                raise ValueError("bank-parallel propagation requires topk")
            if not test_cfg.with_first_neighbor:
                raise ValueError(
                    "bank-parallel propagation requires with_first_neighbor"
                )
            if test_cfg.save_mem:
                raise ValueError(
                    "bank_mesh shards the feature BANK; save_mem streaming "
                    "keeps no bank (use spatial_mesh there instead)"
                )
        self._extract = jax.jit(self._extract_impl, static_argnames=("chunk",))
        self._propagate = jax.jit(
            self._propagate_impl,
            static_argnames=("full_hw", "mask_shape", "length"),
        )
        self._propagate_m = jax.jit(
            self._propagate_masks_impl,
            static_argnames=("full_hw", "mask_shape", "length"),
        )
        self._propagate_m_stream = jax.jit(
            self._propagate_masks_stream_impl,
            static_argnames=("full_hw", "mask_shape"),
        )
        self._track_group = jax.jit(
            self._track_group_impl, static_argnames=("full_hw", "length")
        )
        self._forward_coords = jax.jit(
            self._forward_coords_impl, static_argnames=("full_hw",)
        )

    def _sp_sharding(self):
        """Replicated placement over the spatial mesh (None without one) —
        inputs entering the sharded propagation must live on the mesh, not
        committed to a single device."""
        mesh = self.spatial_mesh if self.spatial_mesh is not None else self.bank_mesh
        if mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(mesh, PartitionSpec())

    # ------------------------------------------------------------------ #
    # feature extraction
    # ------------------------------------------------------------------ #
    def _extract_impl(self, video: jax.Array, chunk: int = 8) -> jax.Array:
        """(T, H, W, 3) frames -> (T, h, w, C) features via scan.

        uint8 input is treated as raw RGB and preprocessed ON DEVICE
        (RGB→Lab + normalization, the full eval pipeline) — only 1 byte per
        pixel crosses the host↔device link.  float input is assumed
        already preprocessed.
        """
        T = video.shape[0]
        n = -(-T // chunk)
        pad = n * chunk - T
        video = jnp.pad(video, ((0, pad),) + ((0, 0),) * (video.ndim - 1))
        batches = video.reshape(n, chunk, *video.shape[1:])

        pre_rgb, pre_yuv = self._preprocess_fns()

        def body(_, imgs):
            if imgs.dtype == jnp.uint8:
                if imgs.ndim == 3:
                    # I420 planes (upload_format='yuv420'): decode on device
                    imgs = pre_yuv(imgs)
                else:
                    imgs = pre_rgb(imgs)
            return None, self.apply_fn(self.variables, imgs)

        _, feats = jax.lax.scan(body, None, batches)
        feats = feats.reshape(n * chunk, *feats.shape[2:])
        return feats[:T]

    def _preprocess_fns(self):
        """(pre_rgb, pre_yuv) for cfg.preprocess — the on-device uint8
        pipeline every feature-extraction path must share (bulk scan AND
        save_mem streaming), so zoo encoders see one normalization."""
        if self.cfg.preprocess == "imagenet":
            from fgvc_tpu.ops.color import (
                preprocess_rgb_to_imagenet,
                preprocess_yuv420_to_imagenet,
            )

            return preprocess_rgb_to_imagenet, preprocess_yuv420_to_imagenet
        return (
            preprocess_rgb_to_lab_normalized,
            preprocess_yuv420_to_lab_normalized,
        )

    def extract_features(self, video: jax.Array) -> jax.Array:
        return self._extract(video)

    # ------------------------------------------------------------------ #
    # propagation core
    # ------------------------------------------------------------------ #
    def _attention_step(
        self, query, keys, values, key_valid, mask_shape, pre_normalized=False
    ):
        cfg = self.cfg
        radius = cfg.neighbor_range // 2
        non_mask_len = 0 if cfg.with_first_neighbor else 1
        do_norm = cfg.with_norm and not pre_normalized
        if cfg.attention_impl == "flow_guided":
            # flow_guided lives in the bank propagation scan (it needs the
            # chained window flows, _scan_propagate); the streaming save_mem
            # path has no flow chain to draw on.
            raise ValueError(
                "attention_impl='flow_guided' needs with_first_neighbor="
                "True and runs in the bank propagation scan (track_points/"
                "track_heatmaps/track_masks without save_mem)"
            )
        if cfg.attention_impl == "c2f" and non_mask_len == 0:
            # coarse-to-fine two-stage inference (reference
            # masked_attention_efficient_c2f, local_attention.py:721-880 —
            # no in-tree consumer there; this wiring is the framework's):
            # the coarse stage runs on c2f_scale×-average-pooled features
            # (re-normalized — cosine similarity of pooled unit vectors),
            # the fine stage on the backbone features; the coarse-grid
            # output is bilinearly lifted back to feature resolution for
            # the rolling value buffer.
            from fgvc_tpu.ops.attention import l2_normalize
            from fgvc_tpu.ops.c2f import masked_attention_c2f

            s = cfg.c2f_scale
            h, w = query.shape[:2]
            if h % s or w % s:
                raise ValueError(
                    f"attention_impl='c2f' needs feature dims divisible by "
                    f"c2f_scale={s}; got {h}x{w} (pick an input_size whose "
                    f"stride-2 feature map is a multiple of {s})"
                )
            qf, kf = query, keys
            if do_norm:
                qf = l2_normalize(qf)
                kf = l2_normalize(kf)

            def pool(x):
                shp = x.shape
                x = x.reshape(
                    *shp[:-3], h // s, s, w // s, s, shp[-1]
                )
                return x.mean(axis=(-4, -2))

            qc, kc = pool(qf), pool(kf)
            if cfg.with_norm:
                qc = l2_normalize(qc)
                kc = l2_normalize(kc)
            out_c = masked_attention_c2f(
                qc,
                kc,
                qf,
                kf,
                values,
                radius=float(radius) / s,
                radius_fine=cfg.radius_fine,
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=False,
                key_valid=key_valid,
                step=cfg.c2f_step,
            )
            return jax.image.resize(
                out_c, (h, w, values.shape[-1]), method="bilinear"
            )
        if cfg.attention_impl == "pallas" and non_mask_len == 0:
            from fgvc_tpu.ops.pallas.topk_attention import (
                fused_topk_attention,
                pallas_compute_dtype,
            )

            return fused_topk_attention(
                query,
                keys,
                values,
                radius=float(radius),
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=do_norm,
                # the single-pass kernel keeps the whole (tile², T·win²)
                # affinity in VMEM — cap the tile edge at 16
                tile=min(cfg.tile, 16),
                mask_shape=mask_shape,
                key_valid=key_valid,
                compute_dtype=pallas_compute_dtype(cfg.matmul_precision),
                interpret=jax.default_backend() == "cpu",
            )
        if cfg.attention_impl == "tiled" and non_mask_len == 0:
            return masked_topk_attention_tiled(
                query,
                keys,
                values,
                radius=float(radius),
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=do_norm,
                tile=cfg.tile,
                mask_shape=mask_shape,
                key_valid=key_valid,
                precision=cfg.matmul_precision,
                topk_impl=cfg.topk_impl,
            )
        return masked_topk_attention(
            query,
            keys,
            values,
            radius=float(radius),
            temperature=cfg.temperature,
            topk=cfg.topk,
            normalize=do_norm,
            step=cfg.step,
            non_mask_len=non_mask_len,
            mask_shape=mask_shape,
            key_valid=key_valid,
            precision=cfg.matmul_precision,
        )

    def _window_indices(self, t, T: int):
        """Key-window bank indices + validity for query frame t (frame 0
        slot first, then the `precede_frames` sliding window; with_first
        and pre-video slots handled via the validity mask)."""
        cfg = self.cfg
        offs = jnp.arange(cfg.precede_frames) - cfg.precede_frames
        win_idx = t + offs
        win_valid = win_idx >= 0
        idx = jnp.concatenate(
            [jnp.zeros((1,), win_idx.dtype), jnp.clip(win_idx, 0, T - 1)]
        )
        # with_first=False: the frame-0 slot is invalidated, leaving only
        # the preceding-frames window (reference key_start:frame_idx
        # without the frame-0 concat, vanilla_tracker.py:353-362)
        valid = jnp.concatenate(
            [jnp.full((1,), cfg.with_first, bool), win_valid]
        )
        return idx, valid

    def _bank_entry(self, seg_logit):
        return _hard_onehot(seg_logit) if self.cfg.hard_prop else seg_logit

    def _build_bank(self, feats, grid_rows: Optional[int] = None):
        """Normalize + halo-pad the feature bank ONCE for the banked
        kernels (shared by the unsharded and spatial-parallel scans).

        Returns (bank_pad, tile, compute_dtype) — compute_dtype is None for
        the tiled XLA path.  `grid_rows` over-pads the row extent for
        spatial-parallel row blocks.
        """
        cfg = self.cfg
        radius = cfg.neighbor_range // 2
        halo = int(radius)
        h, w = feats.shape[1:3]
        if cfg.attention_impl == "pallas":
            from fgvc_tpu.ops.pallas.topk_attention import (
                pad_key_bank_pallas,
                pallas_compute_dtype,
            )

            tile = min(cfg.tile, 16)
            compute_dtype = pallas_compute_dtype(cfg.matmul_precision)
            bank_pad = pad_key_bank_pallas(
                feats,
                float(radius),
                tile=tile,
                normalize=cfg.with_norm,
                compute_dtype=compute_dtype,
                grid_rows=grid_rows,
            )
            return bank_pad, tile, compute_dtype
        from fgvc_tpu.ops.windowed_attention import pad_key_bank

        tile = cfg.tile
        if cfg.with_norm:
            bank_pad = pad_key_bank(
                feats, float(radius), tile, grid_rows=grid_rows
            )
        else:
            Hp = grid_rows if grid_rows is not None else _bucket(h, tile)
            Wp = _bucket(w, tile)
            bank_pad = jnp.pad(
                feats,
                ((0, 0), (halo, halo + Hp - h), (halo, halo + Wp - w), (0, 0)),
            )
        return bank_pad, tile, None

    def _scan_propagate(
        self, feats, first_value, mask_shape, emit, t0=None, length=None
    ):
        """Shared scan over frames 1..T-1.

        emit(seg_logit (h, w, P)) -> per-frame output pytree.

        `t0`/`length` run a query group starting at GLOBAL frame t0 of the
        full UNSLICED bank: on the bank mesh because slicing the sharded
        frame axis would gather a full copy per device, and on the
        single-device bank-direct paths (pallas / tiled bank mode) because
        a traced-start `dynamic_slice` materializes a second full-bank HBM
        copy (~17 MB/frame at Kinetics shapes — it set the single-chip
        bank ceiling, docs/roofline.md "bank capacity").  The spatial and
        legacy paths still receive a pre-sliced feats and must not pass
        them.

        Default (tiled) path runs in BANK mode: the feature bank is
        normalized + halo-padded ONCE and each step's key-frame halos are
        sliced per tile straight from it — no per-step 6-frame key
        pad/concat/gather copies (~300 MB/frame of HBM traffic removed).
        """
        if self.bank_mesh is not None:
            return self._scan_propagate_bank(
                feats, first_value, mask_shape, emit, t0=t0, length=length
            )
        if self.spatial_mesh is not None:
            assert t0 is None and length is None, (
                "the spatial-parallel scan takes a pre-sliced feats"
            )
            return self._scan_propagate_sp(feats, first_value, mask_shape, emit)
        cfg = self.cfg
        T, h, w, C = feats.shape
        L = int(length) if length is not None else T
        gbase = jnp.int32(0) if t0 is None else jnp.asarray(t0, jnp.int32)
        non_mask_len = 0 if cfg.with_first_neighbor else 1
        bank_mode = cfg.attention_impl == "tiled" and non_mask_len == 0
        pallas_bank = cfg.attention_impl == "pallas" and non_mask_len == 0
        assert (t0 is None and length is None) or bank_mode or pallas_bank, (
            "global bank addressing (t0/length) needs a bank-direct impl "
            f"(tiled/pallas with with_first_neighbor), got "
            f"{cfg.attention_impl!r}"
        )
        radius = cfg.neighbor_range // 2
        halo = int(radius)

        from fgvc_tpu.ops.attention import l2_normalize
        from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

        if pallas_bank:
            from fgvc_tpu.ops.pallas.topk_attention import (
                fused_topk_attention_banked,
            )

            bank_pad, p_tile, compute_dtype = self._build_bank(feats)
            Hp = _bucket(h, p_tile)
            Wp = _bucket(w, p_tile)
        elif bank_mode:
            bank_pad, _, _ = self._build_bank(feats)
        else:
            bank_pad = None
            if cfg.with_norm:
                feats = l2_normalize(feats)

        def window_indices(t):
            # t is the offset within the group; the window geometry is
            # group-relative (pre-group slots key_valid-masked), indices
            # are lifted to global bank frames by gbase
            return self._window_indices(t, L)

        bank_entry = self._bank_entry

        pure_bank = T <= self.pure_bank_max_frames

        def step_bank(value_buf, t):
            idx, key_valid = window_indices(t)
            gidx = idx + gbase
            query = jax.lax.dynamic_slice(
                bank_pad, (gbase + t, halo, halo, 0), (1, h, w, C)
            )[0]
            if pure_bank:
                keys, fidx = bank_pad, gidx
            else:
                keys, fidx = bank_pad[gidx], jnp.arange(gidx.shape[0])
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            seg_logit = masked_topk_attention_tiled(
                query,
                keys,
                values,
                radius=float(radius),
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=False,
                tile=cfg.tile,
                mask_shape=mask_shape,
                key_valid=key_valid,
                precision=cfg.matmul_precision,
                topk_impl=cfg.topk_impl,
                frame_idx=fidx,
            )
            new_buf = jnp.concatenate(
                [value_buf[1:], bank_entry(seg_logit)[None]], axis=0
            )
            return new_buf, emit(seg_logit)

        def step_pallas(value_buf, t):
            idx, key_valid = window_indices(t)
            # query slice at the bank's padded origin (halo, halo)
            qpad = jax.lax.dynamic_slice(
                bank_pad, (gbase + t, halo, halo, 0), (1, Hp, Wp, C)
            )[0]
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            seg_logit = fused_topk_attention_banked(
                qpad,
                bank_pad,
                values,
                frame_idx=(idx + gbase).astype(jnp.int32),
                key_valid=key_valid,
                H=h,
                W=w,
                radius=float(radius),
                temperature=cfg.temperature,
                topk=cfg.topk,
                tile=p_tile,
                mask_shape=mask_shape,
                compute_dtype=compute_dtype,
                interpret=jax.default_backend() == "cpu",
            )
            new_buf = jnp.concatenate(
                [value_buf[1:], bank_entry(seg_logit)[None]], axis=0
            )
            return new_buf, emit(seg_logit)

        def step_legacy(value_buf, t):
            idx, key_valid = window_indices(t)
            query = feats[t]
            keys = feats[idx]
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            seg_logit = self._attention_step(
                query, keys, values, key_valid, mask_shape,
                pre_normalized=cfg.with_norm,
            )
            new_buf = jnp.concatenate(
                [value_buf[1:], bank_entry(seg_logit)[None]], axis=0
            )
            return new_buf, emit(seg_logit)

        def step_flow(value_buf, xs):
            # flow-guided propagation: candidates are flow-centered windows
            # (reference flow_guided_attention_efficient,
            # local_attention.py:512-718); flows are chained from the bank's
            # own adjacent-frame local-correlation expectation.
            from fgvc_tpu.ops.c2f import flow_guided_topk_attention

            t, wflow = xs
            idx, key_valid = window_indices(t)
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            seg_logit = flow_guided_topk_attention(
                feats[t],
                feats[idx],
                values,
                wflow,
                radius=cfg.flow_radius,
                temperature=cfg.temperature,
                topk=cfg.topk,
                normalize=False,  # feats normalized once above
                key_valid=key_valid,
                step=cfg.flow_step,
            )
            new_buf = jnp.concatenate(
                [value_buf[1:], bank_entry(seg_logit)[None]], axis=0
            )
            return new_buf, emit(seg_logit)

        # Slots holding pre-video indices are masked via key_valid, so the
        # initial buffer content is never read.
        init_buf = jnp.tile(first_value[None], (cfg.precede_frames, 1, 1, 1))
        if cfg.attention_impl == "flow_guided" and non_mask_len == 0:
            wflows = chain_window_flows(
                self._adjacent_feature_flows(feats), cfg.precede_frames
            )
            _, outs = jax.lax.scan(
                step_flow, init_buf, (jnp.arange(1, L), wflows)
            )
            return outs
        if pallas_bank:
            step = step_pallas
        elif bank_mode:
            step = step_bank
        else:
            step = step_legacy
        _, outs = jax.lax.scan(step, init_buf, jnp.arange(1, L))
        return outs

    def _adjacent_feature_flows(self, featsn: jax.Array) -> jax.Array:
        """Adjacent backward flows (T-1, h, w, 2) from the feature bank
        itself: for every frame-(t+1) pixel, the top-k-softmax EXPECTED
        displacement of its neighbor_range local correlation against frame t
        — the same coordinate-expectation machinery as the forward-warp
        tracker (_forward_coords_impl), used here as the flow predictor of
        the flow-guided mode (the reference leaves the predictor external —
        its flow_guided_attention_efficient takes flows as inputs,
        local_attention.py:512-718).  `featsn` is expected pre-normalized
        when with_norm is on."""
        from fgvc_tpu.ops.local_corr import local_correlation

        cfg = self.cfg
        r = cfg.neighbor_range // 2
        win = 2 * r + 1
        h, w = featsn.shape[1:3]

        def one(carry, pair):
            cur, prev = pair
            corr = local_correlation(cur, prev, r).reshape(h, w, win * win)
            wts, idx = jax.lax.top_k(corr, cfg.topk)
            wts = jax.nn.softmax(wts / cfg.temperature, axis=-1)
            di = (idx // win).astype(jnp.float32) - r
            dj = (idx % win).astype(jnp.float32) - r
            flow = jnp.stack(
                [jnp.sum(wts * dj, -1), jnp.sum(wts * di, -1)], axis=-1
            )
            return carry, flow

        _, flows = jax.lax.scan(one, None, (featsn[1:], featsn[:-1]))
        return flows

    def _scan_propagate_sp(self, feats, first_value, mask_shape, emit):
        """Spatial-parallel propagation over `self.spatial_mesh`.

        The TPU-native scaling mode the reference cannot express (its
        multi-GPU story is DDP video-throughput only,
        /root/reference/mmpt/apis/test.py): each frame's QUERY ROWS are
        sharded over the mesh's 'space' axis with shard_map — every device
        runs the windowed top-k kernel on its row block against the
        replicated bank, and one (h, w, P) all_gather per frame (a few MB,
        riding ICI) re-forms the logits so the rolling value buffer stays
        identical to the single-device scan.  Results are bit-exact vs the
        unsharded path (tests/test_spatial.py); single-video latency scales
        with the mesh, complementing the --local-devices video round-robin.
        """
        cfg = self.cfg
        mesh = self.spatial_mesh
        n = int(np.prod(mesh.devices.shape))
        if "space" not in mesh.axis_names:
            raise ValueError("spatial_mesh needs an axis named 'space'")
        if cfg.attention_impl not in ("pallas", "tiled"):
            raise ValueError(
                "spatial-parallel propagation supports attention_impl "
                f"'pallas'/'tiled', not {cfg.attention_impl!r}"
            )
        if not cfg.with_first_neighbor:
            raise ValueError(
                "spatial-parallel propagation requires with_first_neighbor"
            )
        T, h, w, C = feats.shape
        use_pallas = cfg.attention_impl == "pallas"
        radius = cfg.neighbor_range // 2
        halo = int(radius)
        tile = min(cfg.tile, 16) if use_pallas else cfg.tile
        Hp = _bucket(h, tile)
        hb = _bucket(-(-Hp // n), tile)   # query rows per device
        gridH = n * hb                    # padded row total across devices
        Wp = _bucket(w, tile)
        interp = jax.default_backend() == "cpu"
        # same large-bank switch as the unsharded scan (gather the window's
        # frames once per step instead of per-tile bank slices)
        pure_bank = T <= self.pure_bank_max_frames

        if use_pallas:
            from fgvc_tpu.ops.pallas.topk_attention import (
                fused_topk_attention_banked,
            )

        bank_pad, _, compute_dtype = self._build_bank(feats, grid_rows=gridH)

        def run(bank_pad, first_value, row0_arr):
            row0 = row0_arr[0]

            def step(value_buf, t):
                idx, key_valid = self._window_indices(t, T)
                values = jnp.concatenate(
                    [first_value[None], value_buf], axis=0
                )
                if use_pallas:
                    qblk = jax.lax.dynamic_slice(
                        bank_pad, (t, halo + row0, halo, 0), (1, hb, Wp, C)
                    )[0]
                    seg_blk = fused_topk_attention_banked(
                        qblk,
                        bank_pad,
                        values,
                        frame_idx=idx.astype(jnp.int32),
                        key_valid=key_valid,
                        H=h,
                        W=w,
                        radius=float(radius),
                        temperature=cfg.temperature,
                        topk=cfg.topk,
                        tile=tile,
                        mask_shape=mask_shape,
                        compute_dtype=compute_dtype,
                        interpret=interp,
                        row0=row0,
                        grid_rows=gridH,
                    )
                else:
                    qblk = jax.lax.dynamic_slice(
                        bank_pad, (t, halo + row0, halo, 0), (1, hb, w, C)
                    )[0]
                    if pure_bank:
                        keys, fidx = bank_pad, idx
                    else:
                        keys, fidx = bank_pad[idx], jnp.arange(idx.shape[0])
                    seg_blk = masked_topk_attention_tiled(
                        qblk,
                        keys,
                        values,
                        radius=float(radius),
                        temperature=cfg.temperature,
                        topk=cfg.topk,
                        normalize=False,
                        tile=tile,
                        mask_shape=mask_shape,
                        key_valid=key_valid,
                        precision=cfg.matmul_precision,
                        topk_impl=cfg.topk_impl,
                        frame_idx=fidx,
                        row_offset=row0,
                        full_h=h,
                        grid_rows=gridH,
                    )
                # ICI collective: re-form the full frame logits (row blocks
                # past the real grid carry kernel garbage — sliced off here,
                # before anything consumes them)
                seg = jax.lax.all_gather(
                    seg_blk, "space", axis=0, tiled=True
                )[:h]
                new_buf = jnp.concatenate(
                    [value_buf[1:], self._bank_entry(seg)[None]], axis=0
                )
                return new_buf, emit(seg)

            init_buf = jnp.tile(
                first_value[None], (cfg.precede_frames, 1, 1, 1)
            )
            _, outs = jax.lax.scan(step, init_buf, jnp.arange(1, T))
            return outs

        from jax.sharding import PartitionSpec as PSpec

        row0s = jnp.arange(n, dtype=jnp.int32) * hb
        sharded = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PSpec(), PSpec(), PSpec("space")),
            out_specs=PSpec(),
            check_vma=False,
        )
        return sharded(bank_pad, first_value, row0s)

    def _scan_propagate_bank(
        self, feats, first_value, mask_shape, emit, t0=None, length=None
    ):
        """Bank-parallel (memory-parallel) propagation over `self.bank_mesh`.

        The capacity-scaling mode: the normalized+padded feature bank is
        sharded over the mesh's 'bank' axis on its FRAME dim, so the
        propagation's dominant HBM resident (e.g. ~5 GB for a 250-frame
        Kinetics bank, growing linearly with video length) splits across
        devices instead of replicating — videos whose bank exceeds one
        chip's HBM become trackable (features are extracted ALREADY
        frame-sharded, _features_padded_bank; no device ever materializes
        the full bank).  Each step reconstructs the exact top-k + softmax
        mix with three small per-tile ICI collectives (local top-k
        all_gather merge + two psums; see ops/windowed_attention.py
        masked_topk_attention_tiled_bank_sharded) plus one psum to fetch
        the query frame from its owner shard.  The rolling window VALUE
        buffer (precede_frames+1 maps) is tiny and stays replicated.

        `t0`/`length` run a query group starting at GLOBAL frame t0 of the
        full sharded bank — callers must NOT pre-slice the bank on its
        sharded frame axis (a traced-start dynamic_slice there would gather
        a full copy per device, defeating the capacity point); the scan
        instead addresses frames globally and owner-selects.  The reference
        has no counterpart (single-GPU banks only, vanilla_tracker.py
        forward_test).  Results match the unsharded scan to partial-sum
        reassociation (tests/test_bank_parallel.py).
        """
        cfg = self.cfg
        mesh = self.bank_mesh
        n = int(np.prod(mesh.devices.shape))
        T, h, w, C = feats.shape
        L = int(length) if length is not None else T
        t0 = jnp.int32(0) if t0 is None else jnp.asarray(t0, jnp.int32)
        radius = cfg.neighbor_range // 2
        halo = int(radius)

        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PSpec

        from fgvc_tpu.ops.windowed_attention import (
            masked_topk_attention_tiled_bank_sharded,
        )

        bank_pad, _, _ = self._build_bank(feats)
        Tl = -(-T // n)  # frames per shard
        bank_pad = jnp.pad(
            bank_pad, ((0, Tl * n - T), (0, 0), (0, 0), (0, 0))
        )
        # keep the bank SHARDED from construction on — the whole point is
        # that no device ever holds all T frames
        bank_pad = jax.lax.with_sharding_constraint(
            bank_pad, NamedSharding(mesh, PSpec("bank"))
        )

        def run(bank_shard, first_value, t0):
            lo = jax.lax.axis_index("bank") * Tl

            def step(value_buf, t):
                # t is the offset within the group; frames are addressed
                # globally as t0 + offset on the sharded bank
                idx, key_valid = self._window_indices(t, L)
                gidx = idx + t0
                values = jnp.concatenate(
                    [first_value[None], value_buf], axis=0
                )
                # query frame lives on one shard: owner-select + psum
                g = t0 + t
                lt = jnp.clip(g - lo, 0, Tl - 1)
                q_loc = jax.lax.dynamic_slice(
                    bank_shard, (lt, halo, halo, 0), (1, h, w, C)
                )[0]
                owns_t = (g >= lo) & (g < lo + Tl)
                query = jax.lax.psum(
                    jnp.where(owns_t, q_loc, 0.0), "bank"
                )
                seg = masked_topk_attention_tiled_bank_sharded(
                    query,
                    bank_shard,
                    values,
                    frame_idx=gidx,
                    shard_lo=lo,
                    axis_name="bank",
                    radius=float(radius),
                    temperature=cfg.temperature,
                    topk=cfg.topk,
                    tile=cfg.tile,
                    mask_shape=mask_shape,
                    key_valid=key_valid,
                    precision=cfg.matmul_precision,
                )
                new_buf = jnp.concatenate(
                    [value_buf[1:], self._bank_entry(seg)[None]], axis=0
                )
                return new_buf, emit(seg)

            init_buf = jnp.tile(
                first_value[None], (cfg.precede_frames, 1, 1, 1)
            )
            _, outs = jax.lax.scan(step, init_buf, jnp.arange(1, L))
            return outs

        sharded = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PSpec("bank"), PSpec(), PSpec()),
            out_specs=PSpec(),
            check_vma=False,
        )
        return sharded(bank_pad, first_value, t0)

    def _propagate_impl(
        self,
        feats: jax.Array,       # (T, h, w, C) — frame 0 is the query frame
        init_maps: jax.Array,   # (P, h, w) value maps at feature resolution
        full_hw: Tuple[int, int],
        mask_shape: str = "circle",
        t0=None,                # bank mesh only: global query-frame index
        length: Optional[int] = None,  # bank mesh only: static group length
    ) -> jax.Array:
        """Scan label propagation; returns (T, P, 3) per-frame
        (x, y, peak): coords decoded at full_hw resolution plus the
        feature-res heatmap peak (the visibility confidence — a free
        reduction over the propagated logits; see
        TestConfig.visibility_mode).  Index 0 is the feature-res decode of
        init_maps (callers overwrite its coords with their reference-res
        decode; its peak is the per-point confidence denominator).

        Under a bank mesh, `feats` is the FULL frame-sharded bank and
        `t0`/`length` select the query group (see _scan_propagate_bank);
        returns `length` rows."""
        H_full, W_full = full_hw
        P = init_maps.shape[0]
        first_value = jnp.transpose(init_maps, (1, 2, 0))  # (h, w, P)
        h, w = feats.shape[1:3]
        stride_y = H_full / h
        stride_x = W_full / w

        def decode(logits_hw_p):
            peak = jnp.max(logits_hw_p, axis=(0, 1))  # (P,) confidence
            if self.cfg.decode_impl == "coarse":
                # feature-res soft-argmax scaled to full res (fast mode)
                c = soft_argmax_topk(
                    jnp.transpose(logits_hw_p, (2, 0, 1)), topk=5
                )
                scaled = c * jnp.asarray([stride_x, stride_y], jnp.float32)
                coords = jnp.where(c < 0, -1.0, scaled)
            else:
                up = jax.image.resize(
                    logits_hw_p, (H_full, W_full, P), method="bilinear"
                )
                coords = soft_argmax_topk(
                    jnp.transpose(up, (2, 0, 1)), topk=5
                )
            return jnp.concatenate([coords, peak[:, None]], axis=-1)

        coords = self._scan_propagate(
            feats, first_value, mask_shape, decode, t0=t0, length=length
        )
        coords0 = decode(first_value)
        return jnp.concatenate([coords0[None], coords], axis=0)  # (T, P, 3)

    def _scan_propagate_streaming(self, video, first_value, mask_shape, emit):
        """save_mem propagation: NO full feature bank.

        The reference's save_mem mode re-extracts key features per temporal
        chunk (masked_attention_efficient_correlation,
        local_attention.py:883-1006) because its bank lives off-device. The
        TPU re-design streams instead: the scan computes each frame's
        features ONCE when it becomes the query and rolls them through a
        (precede_frames)-deep key buffer — window-bounded memory with zero
        recompute. Full-res 480p VOS over long videos fits HBM this way.
        """
        if self.spatial_mesh is not None:
            return self._scan_propagate_streaming_sp(
                video, first_value, mask_shape, emit
            )
        cfg = self.cfg
        T = video.shape[0]

        pre_rgb, _ = self._preprocess_fns()

        def feat(frame):
            imgs = frame[None]
            if imgs.dtype == jnp.uint8:
                imgs = pre_rgb(imgs)
            return self.apply_fn(self.variables, imgs)[0]

        from fgvc_tpu.ops.attention import l2_normalize

        f0 = feat(video[0])
        if cfg.with_norm:
            f0 = l2_normalize(f0)

        def step(carry, t):
            feat_buf, value_buf = carry
            q = feat(video[t])
            if cfg.with_norm:
                q = l2_normalize(q)
            offs = jnp.arange(cfg.precede_frames) - cfg.precede_frames
            key_valid = jnp.concatenate(
                [jnp.full((1,), cfg.with_first, bool), t + offs >= 0]
            )
            keys = jnp.concatenate([f0[None], feat_buf], axis=0)
            values = jnp.concatenate([first_value[None], value_buf], axis=0)
            seg_logit = self._attention_step(
                q, keys, values, key_valid, mask_shape,
                pre_normalized=cfg.with_norm,
            )
            entry = _hard_onehot(seg_logit) if cfg.hard_prop else seg_logit
            new_carry = (
                jnp.concatenate([feat_buf[1:], q[None]], axis=0),
                jnp.concatenate([value_buf[1:], entry[None]], axis=0),
            )
            return new_carry, emit(seg_logit)

        feat_buf0 = jnp.tile(f0[None], (cfg.precede_frames, 1, 1, 1))
        value_buf0 = jnp.tile(first_value[None], (cfg.precede_frames, 1, 1, 1))
        _, outs = jax.lax.scan(step, (feat_buf0, value_buf0), jnp.arange(1, T))
        return outs

    def _scan_propagate_streaming_sp(self, video, first_value, mask_shape,
                                     emit):
        """Spatial-parallel save_mem streaming propagation.

        Composes `_scan_propagate_sp`'s row sharding with the streaming
        scan: every device runs the backbone on the FULL frame (convs need
        the whole image — the per-frame feature cost is replicated; the
        windowed attention, which dominates at full-res VOS shapes, shards
        over query rows), keeps the rolling key-window buffer in
        kernel-padded layout, and computes its row block against the
        window as a (1+precede_frames)-frame mini-bank.  One (h, w, K)
        all_gather per frame re-forms the logits so the rolling value
        buffer — and hence the output — matches the single-device
        streaming scan (tests/test_spatial.py::test_sp_save_mem_*).
        """
        cfg = self.cfg
        mesh = self.spatial_mesh
        n = int(np.prod(mesh.devices.shape))
        if "space" not in mesh.axis_names:
            raise ValueError("spatial_mesh needs an axis named 'space'")
        if cfg.attention_impl not in ("pallas", "tiled"):
            raise ValueError(
                "spatial-parallel streaming propagation supports "
                f"attention_impl 'pallas'/'tiled', not {cfg.attention_impl!r}"
            )
        if not cfg.with_first_neighbor:
            raise ValueError(
                "spatial-parallel propagation requires with_first_neighbor"
            )
        T = video.shape[0]
        use_pallas = cfg.attention_impl == "pallas"
        radius = cfg.neighbor_range // 2
        tile = min(cfg.tile, 16) if use_pallas else cfg.tile
        interp = jax.default_backend() == "cpu"

        pre_rgb, _ = self._preprocess_fns()
        from fgvc_tpu.ops.attention import l2_normalize
        from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled

        if use_pallas:
            from fgvc_tpu.ops.pallas.topk_attention import (
                fused_topk_attention_banked,
                pad_key_bank_pallas,
                pallas_compute_dtype,
            )

            compute_dtype = pallas_compute_dtype(cfg.matmul_precision)

        def feat(frame):
            imgs = frame[None]
            if imgs.dtype == jnp.uint8:
                imgs = pre_rgb(imgs)
            f = self.apply_fn(self.variables, imgs)[0]
            return l2_normalize(f) if cfg.with_norm else f

        # row-block geometry, derived ONCE from the backbone's static
        # output shape (shared by the in-scan kernels and the row0s below)
        h, w, C = jax.eval_shape(
            feat, jax.ShapeDtypeStruct(video.shape[1:], video.dtype)
        ).shape
        Hp = _bucket(h, tile)
        hb = _bucket(-(-Hp // n), tile)       # query rows per device
        gridH = n * hb
        Wp = _bucket(w, tile)

        def run(video, first_value, row0_arr):
            row0 = row0_arr[0]
            f0 = feat(video[0])

            if use_pallas:
                def pad_key(f):
                    # kernel-layout halo pad (features already normalized)
                    return pad_key_bank_pallas(
                        f[None], float(radius), tile=tile, normalize=False,
                        compute_dtype=compute_dtype, grid_rows=gridH,
                    )[0]

                f0k = pad_key(f0)
                kbuf0 = jnp.tile(f0k[None], (cfg.precede_frames, 1, 1, 1))
            else:
                f0k = f0
                kbuf0 = jnp.tile(f0[None], (cfg.precede_frames, 1, 1, 1))
            value_buf0 = jnp.tile(
                first_value[None], (cfg.precede_frames, 1, 1, 1)
            )

            def step(carry, t):
                kbuf, value_buf = carry
                q = feat(video[t])
                offs = jnp.arange(cfg.precede_frames) - cfg.precede_frames
                key_valid = jnp.concatenate(
                    [jnp.full((1,), cfg.with_first, bool), t + offs >= 0]
                )
                values = jnp.concatenate(
                    [first_value[None], value_buf], axis=0
                )
                if use_pallas:
                    qpad = jnp.pad(
                        q, ((0, gridH - h), (0, Wp - w), (0, 0))
                    ).astype(f0k.dtype)
                    qblk = jax.lax.dynamic_slice(
                        qpad, (row0, 0, 0), (hb, Wp, C)
                    )
                    kentry = pad_key(q)
                    seg_blk = fused_topk_attention_banked(
                        qblk,
                        jnp.concatenate([f0k[None], kbuf], axis=0),
                        values,
                        frame_idx=jnp.arange(
                            1 + cfg.precede_frames, dtype=jnp.int32
                        ),
                        key_valid=key_valid,
                        H=h,
                        W=w,
                        radius=float(radius),
                        temperature=cfg.temperature,
                        topk=cfg.topk,
                        tile=tile,
                        mask_shape=mask_shape,
                        compute_dtype=compute_dtype,
                        interpret=interp,
                        row0=row0,
                        grid_rows=gridH,
                    )
                else:
                    qpad = jnp.pad(q, ((0, gridH - h), (0, 0), (0, 0)))
                    qblk = jax.lax.dynamic_slice(
                        qpad, (row0, 0, 0), (hb, w, C)
                    )
                    kentry = q
                    seg_blk = masked_topk_attention_tiled(
                        qblk,
                        jnp.concatenate([f0k[None], kbuf], axis=0),
                        values,
                        radius=float(radius),
                        temperature=cfg.temperature,
                        topk=cfg.topk,
                        normalize=False,
                        tile=tile,
                        mask_shape=mask_shape,
                        key_valid=key_valid,
                        precision=cfg.matmul_precision,
                        topk_impl=cfg.topk_impl,
                        row_offset=row0,
                        full_h=h,
                        grid_rows=gridH,
                    )
                # ICI collective: re-form the full frame logits (block rows
                # past the real grid carry kernel garbage — sliced off here)
                seg = jax.lax.all_gather(
                    seg_blk, "space", axis=0, tiled=True
                )[:h]
                new_carry = (
                    jnp.concatenate([kbuf[1:], kentry[None]], axis=0),
                    jnp.concatenate(
                        [value_buf[1:], self._bank_entry(seg)[None]], axis=0
                    ),
                )
                return new_carry, emit(seg)

            _, outs = jax.lax.scan(
                step, (kbuf0, value_buf0), jnp.arange(1, T)
            )
            return outs

        from jax.sharding import PartitionSpec as PSpec

        row0s = jnp.arange(n, dtype=jnp.int32) * hb
        sharded = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PSpec(), PSpec(), PSpec("space")),
            out_specs=PSpec(),
            check_vma=False,
        )
        return sharded(video, first_value, row0s)

    def _propagate_masks_stream_impl(
        self,
        video: jax.Array,       # (T, H, W, 3) frames (uint8 or Lab floats)
        init_onehot: jax.Array,
        full_hw: Tuple[int, int],
        mask_shape: str = "square",
    ) -> jax.Array:
        H_full, W_full = full_hw
        K = init_onehot.shape[-1]

        def decode(logits):
            up = jax.image.resize(logits, (H_full, W_full, K), method="bilinear")
            return jnp.argmax(up, axis=-1).astype(jnp.int32)

        masks = self._scan_propagate_streaming(
            video, init_onehot, mask_shape, decode
        )
        return jnp.concatenate([decode(init_onehot)[None], masks], axis=0)

    def _propagate_masks_impl(
        self,
        feats: jax.Array,       # (T, h, w, C)
        init_onehot: jax.Array, # (h, w, K) one-hot masks at feature res
        full_hw: Tuple[int, int],
        mask_shape: str = "circle",
        length: Optional[int] = None,  # bank mesh only: static video length
    ) -> jax.Array:
        """VOS propagation; returns (T, H, W) int32 label maps (argmax).

        Under a bank mesh, `feats` is the FULL frame-sharded bank and
        `length` bounds the propagation (no slicing on the sharded axis)."""
        H_full, W_full = full_hw
        K = init_onehot.shape[-1]

        def decode(logits):
            up = jax.image.resize(
                logits, (H_full, W_full, K), method="bilinear"
            )
            return jnp.argmax(up, axis=-1).astype(jnp.int32)

        masks = self._scan_propagate(
            feats, init_onehot, mask_shape, decode, length=length
        )
        return jnp.concatenate([decode(init_onehot)[None], masks], axis=0)

    def _track_group_impl(
        self,
        feats: jax.Array,     # (T_bank, h, w, C) full per-video feature bank
        t0: jax.Array,        # scalar query-frame index of this group
        pts: jax.Array,       # (P, 2) (x, y) query points in input pixels
        valid: jax.Array,     # (P,) bool — padded points are invalid
        full_hw: Tuple[int, int],
        length: int,          # static propagation length (frame bucket)
    ) -> jax.Array:
        """One query-frame group, fully on-device: draw gaussian maps,
        propagate from frame t0, decode coords — a single dispatch."""
        cfg = self.cfg
        H, W = full_hw
        h = feats.shape[1]
        stride = H // h
        P = pts.shape[0]

        init_maps = draw_gaussian_maps(pts, H, W, sigma=cfg.sigma, stride=stride)
        init_maps = init_maps * valid[:, None, None].astype(init_maps.dtype)

        bank_direct = (
            cfg.attention_impl in ("pallas", "tiled")
            and cfg.with_first_neighbor
            and self.spatial_mesh is None
        )
        if self.bank_mesh is not None or bank_direct:
            # never slice the bank: on the bank mesh a traced-start
            # dynamic_slice of the frame-sharded axis would gather a full
            # copy per device, and on one device it materializes a second
            # full-bank HBM copy (docs/roofline.md "bank capacity"); the
            # scan addresses frames globally from t0 instead
            coords = self._propagate_impl(
                feats, init_maps, full_hw, t0=t0, length=length
            )
        else:
            feats_g = jax.lax.dynamic_slice_in_dim(feats, t0, length, axis=0)
            coords = self._propagate_impl(feats_g, init_maps, full_hw)

        # frame 0 decodes from the FULL-res gaussian (the reference's
        # seg_preds[0]), masked to (-1, -1) for padded points; its peak
        # column keeps the FEATURE-res init peak (the confidence ratio's
        # denominator — what the propagation scan actually sees)
        full_maps = draw_gaussian_maps(pts, H, W, sigma=cfg.sigma, stride=1)
        full_maps = full_maps * valid[:, None, None].astype(full_maps.dtype)
        coords0 = soft_argmax_topk(full_maps, topk=5)
        row0 = jnp.concatenate([coords0, coords[0, :, 2:]], axis=-1)
        return jnp.concatenate([row0[None], coords[1:]], axis=0)

    # ------------------------------------------------------------------ #
    # public API: point tracking (TAP-Vid protocol)
    # ------------------------------------------------------------------ #
    def track_points_dispatch(
        self,
        video: np.ndarray,          # (T, H, W, 3) preprocessed (Lab-normalized)
        query_points: np.ndarray,   # (P, 3) (t, x, y) in input pixels
        feats: Optional[jax.Array] = None,  # pre-dispatched _features_padded
    ) -> Dict:
        """Dispatch the full forward-test asynchronously; returns a pending
        handle for `track_points_collect`.  Splitting dispatch from
        collection lets a harness keep several videos in flight — across
        transfers on one chip, or round-robin across local devices
        (data-parallel eval without processes)."""
        cfg = self.cfg
        T, H, W, _ = video.shape
        P = query_points.shape[0]

        if feats is None:
            feats = self._features_padded(video)
        dev = self._sp_sharding() or _dispatch_device(feats)

        def put(x):
            return _put(x, dev)

        ts = np.unique(query_points[:, 0].astype(np.int64))
        pending = []
        for t in ts:
            sel = np.nonzero(query_points[:, 0].astype(np.int64) == t)[0]
            pts = query_points[sel][:, 1:]  # (Pg, 2) x, y
            p_pad = _bucket(len(sel), cfg.point_bucket)
            pts_p = np.zeros((p_pad, 2), dtype=np.float32)
            pts_p[: len(sel)] = pts
            valid = np.arange(p_pad) < len(sel)

            L_pad = _bucket(T - int(t), cfg.frame_bucket)
            coords = self._track_group(
                feats,
                put(np.int32(t)),
                put(pts_p),
                put(valid),
                full_hw=(H, W),
                length=L_pad,
            )
            pending.append((t, sel, coords))
        return {"pending": pending, "T": T, "P": P}

    @staticmethod
    def peak_ratios(arr: np.ndarray) -> np.ndarray:
        """Per-frame peak / query-frame-peak ratios for one propagated
        group (arr: (T', n, 3) decode rows, row 0 = the query frame).
        THE raw statistic behind visibility_mode='heatmap' — the
        calibration study (tools/bench/visibility_study.py) must threshold
        exactly what track_points_collect thresholds, so both call this."""
        peaks = np.asarray(arr)[..., 2]
        return peaks / np.maximum(peaks[0], 1e-12)

    def track_points_collect(self, disp: Dict) -> Dict[str, np.ndarray]:
        """Fetch a dispatched forward-test's results to the host.

        visibility_mode='heatmap' turns the per-frame heatmap peaks (third
        coordinate column) into visibility flags: visible iff
        peak_t / peak_query >= cfg.visibility_threshold.  Frames before a
        point's query frame stay False (forward-only propagation, like the
        reference).  'none' keeps constant-zero visibilities (reference
        parity — vanilla_tracker.py predicts no occlusion)."""
        T, P = disp["T"], disp["P"]
        cfg = self.cfg
        traj_pred = np.zeros((T, P, 2), dtype=np.float32)
        vis_pred = np.zeros((T, P), dtype=bool)
        for t, sel, coords in disp["pending"]:
            arr = np.array(coords)[: T - int(t), : len(sel)]
            traj_pred[int(t):, sel] = arr[..., :2]
            if cfg.visibility_mode == "heatmap":
                ratio = self.peak_ratios(arr)
                vis_pred[int(t):, sel] = ratio >= cfg.visibility_threshold
        return {
            "trajectories": traj_pred,
            "visibilities": vis_pred,
        }

    def track_points(
        self,
        video: np.ndarray,          # (T, H, W, 3) preprocessed (Lab-normalized)
        query_points: np.ndarray,   # (P, 3) (t, x, y) in input pixels
        feats: Optional[jax.Array] = None,  # pre-dispatched _features_padded
    ) -> Dict[str, np.ndarray]:
        """Forward-test over a full video with query-frame grouping.

        Mirrors VanillaTracker.forward_test (with_first=True): points are
        grouped by query frame; each group is propagated from its query frame
        to the end of the video.  Returns trajectories (T, P, 2) and
        visibilities (T, P) — all zeros like the reference under the default
        visibility_mode='none'; real heatmap-peak visibility estimates under
        'heatmap' (no reference counterpart; docs/visibility_study.md).

        `feats` lets the eval harness prefetch the next video's upload +
        feature extraction while the previous video propagates.
        """
        return self.track_points_collect(
            self.track_points_dispatch(video, query_points, feats=feats)
        )

    # ------------------------------------------------------------------ #
    # public API: forward-warp coordinate tracking
    # ------------------------------------------------------------------ #
    def _forward_coords_impl(
        self,
        feats: jax.Array,        # (T, h, w, C) — frame 0 is the query frame
        init_coords: jax.Array,  # (P, 2) (x, y) full-res positions at frame 0
        full_hw: Tuple[int, int],
    ) -> jax.Array:
        """Coordinate-map forward warping (HRVanillaTracker
        forward_test_forward + get_coord, vanilla_tracker.py:445-488,591):

        per frame, a square-window correlation between the window-start
        frame and the current frame yields, for every start-frame pixel, the
        top-k softmax EXPECTED full-resolution coordinate in the current
        frame; each tracked point samples that coordinate map bilinearly at
        its running position.  Returns (T, P, 2).
        """
        from fgvc_tpu.ops.local_corr import local_correlation
        from fgvc_tpu.ops.warp import bilinear_sample

        cfg = self.cfg
        T, h, w, C = feats.shape
        H, W = full_hw
        scale = H // h
        r = cfg.neighbor_range // 2
        win = 2 * r + 1

        from fgvc_tpu.ops.attention import l2_normalize

        featsn = l2_normalize(feats) if cfg.with_norm else feats

        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

        def coord_map(start, t):
            corr = local_correlation(featsn[start], featsn[t], r)
            corr = corr.reshape(h, w, win * win)
            wts, idx = jax.lax.top_k(corr, cfg.topk)          # (h, w, k)
            wts = jax.nn.softmax(wts / cfg.temperature, axis=-1)
            di = (idx // win).astype(jnp.float32) - r
            dj = (idx % win).astype(jnp.float32) - r
            ky = gy[..., None] + di
            kx = gx[..., None] + dj
            inside = (ky >= 0) & (ky <= h - 1) & (kx >= 0) & (kx <= w - 1)
            # zero-padded window slots carry (0, 0) coordinates, matching
            # the reference's F.unfold zero padding of the coordinate grid
            cy = jnp.where(inside, ky * scale, 0.0)
            cx = jnp.where(inside, kx * scale, 0.0)
            return jnp.stack(
                [jnp.sum(wts * cx, -1), jnp.sum(wts * cy, -1)], axis=-1
            )  # (h, w, 2) full-res expected coords

        def step(coord, t):
            start = jnp.maximum(t - cfg.precede_frames, 0)
            cmap = coord_map(start, t)
            new = bilinear_sample(cmap, coord / float(scale))  # (P, 2)
            return new, new

        _, coords = jax.lax.scan(step, init_coords, jnp.arange(1, T))
        return jnp.concatenate([init_coords[None], coords], axis=0)

    def track_points_forward(
        self, video: np.ndarray, query_points: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Forward-warp tracking of (P, 3) (t, x, y) query points (all points
        tracked from their query frame; pre-query frames stay zero)."""
        cfg = self.cfg
        T, H, W, _ = video.shape
        P = query_points.shape[0]
        feats = self._features_padded(video)

        traj = np.zeros((T, P, 2), dtype=np.float32)
        fwd = self._forward_coords
        for t in np.unique(query_points[:, 0].astype(np.int64)):
            sel = np.nonzero(query_points[:, 0].astype(np.int64) == t)[0]
            p_pad = _bucket(len(sel), cfg.point_bucket)
            pts = np.zeros((p_pad, 2), np.float32)
            pts[: len(sel)] = query_points[sel][:, 1:]
            L_pad = _bucket(T - int(t), cfg.frame_bucket)
            feats_g = jax.lax.dynamic_slice_in_dim(feats, int(t), L_pad, axis=0)
            # forward-warp tracking has no sharded variant; _put keeps the
            # points co-placed with the (possibly mesh-replicated) features
            coords = np.array(
                fwd(feats_g, _put(pts, self._sp_sharding()), (H, W))
            )
            traj[int(t):, sel] = coords[: T - int(t), : len(sel)]
        return {
            "trajectories": traj,
            "visibilities": np.zeros((T, P), dtype=bool),
        }

    # ------------------------------------------------------------------ #
    # public API: keypoint heatmap propagation (JHMDB / BADJA protocol)
    # ------------------------------------------------------------------ #
    def track_heatmaps_dispatch(
        self,
        video: np.ndarray,       # (T, H, W, 3) preprocessed (Lab-normalized)
        ref_maps: np.ndarray,    # (h0, w0, P) reference keypoint heatmaps
        decode_hw: Tuple[int, int],  # resolution to decode coordinates at
        feats: Optional[jax.Array] = None,  # prefetched _features_padded
    ) -> Dict:
        """Async dispatch of heatmap propagation (see track_heatmaps)."""
        cfg = self.cfg
        T = video.shape[0]
        P = ref_maps.shape[-1]

        if feats is None:
            feats = self._features_padded(video)
        h, w = feats.shape[1:3]
        dev = self._sp_sharding() or _dispatch_device(feats)

        def put(x):
            return _put(x, dev)

        p_pad = _bucket(P, cfg.point_bucket)
        maps = put(np.asarray(ref_maps, np.float32))
        resized = jax.image.resize(maps, (h, w, P), method="bilinear")
        resized = jnp.pad(resized, ((0, 0), (0, 0), (0, p_pad - P)))

        L_pad = _bucket(T, cfg.frame_bucket)
        if self.bank_mesh is not None:
            coords = self._propagate(
                feats,
                jnp.transpose(resized, (2, 0, 1)),
                decode_hw,
                mask_shape="square",
                length=L_pad,
            )
        else:
            feats_g = jax.lax.dynamic_slice_in_dim(feats, 0, L_pad, axis=0)
            coords = self._propagate(
                feats_g,
                jnp.transpose(resized, (2, 0, 1)),
                decode_hw,
                mask_shape="square",
            )
        # frame 0: decode from the original reference maps at decode_hw
        ref_up = jax.image.resize(maps, (*decode_hw, P), method="bilinear")
        coords0 = soft_argmax_topk(jnp.transpose(ref_up, (2, 0, 1)), topk=5)
        return {"coords": coords, "coords0": coords0, "T": T, "P": P}

    def track_heatmaps_collect(self, disp: Dict) -> np.ndarray:
        # drop the peak column (visibility is a point-tracking output)
        coords = np.array(disp["coords"])[: disp["T"], : disp["P"], :2]
        coords[0] = np.asarray(disp["coords0"])
        return coords

    def track_heatmaps(
        self,
        video: np.ndarray,       # (T, H, W, 3) preprocessed (Lab-normalized)
        ref_maps: np.ndarray,    # (h0, w0, P) reference keypoint heatmaps
        decode_hw: Tuple[int, int],  # resolution to decode coordinates at
        feats: Optional[jax.Array] = None,  # prefetched _features_padded
    ) -> np.ndarray:
        """Propagate given reference heatmaps from frame 0; returns
        (T, P, 2) (x, y) coords at decode_hw resolution.

        Mirrors HRVanillaTracker.forward_test_backward_save_mem with
        heatmap input (vanilla_tracker.py:663): bilinear-resize the maps to
        feature resolution, propagate with the square correlation window
        (mmcv-Correlation semantics), decode with top-5 soft-argmax on maps
        upsampled to decode_hw.
        """
        return self.track_heatmaps_collect(
            self.track_heatmaps_dispatch(video, ref_maps, decode_hw, feats)
        )

    # ------------------------------------------------------------------ #
    # public API: VOS mask propagation (DAVIS protocol)
    # ------------------------------------------------------------------ #
    def track_masks(
        self,
        video: np.ndarray,       # (T, H, W, 3) preprocessed (Lab-normalized)
        ref_mask: np.ndarray,    # (h0, w0) integer label map for frame 0
        decode_hw: Tuple[int, int],
        num_objects: int,
    ) -> np.ndarray:
        """Multi-object mask propagation; returns (T, H, W) int labels at
        decode_hw.  One-hot at feature resolution (nearest-downsampled like
        the reference's pil_nearest path), square correlation window."""
        return self.track_masks_collect(
            self.track_masks_dispatch(video, ref_mask, decode_hw, num_objects)
        )

    def track_masks_dispatch(
        self,
        video: np.ndarray,
        ref_mask: np.ndarray,
        decode_hw: Tuple[int, int],
        num_objects: int,
        device=None,
    ) -> Dict:
        """Async dispatch of VOS mask propagation (see track_masks);
        `device` pins the work to one local device for data-parallel eval."""
        cfg = self.cfg
        T = video.shape[0]
        # Under a spatial mesh the BANKED path keeps the video on the
        # default device (one tunnel upload + one backbone pass;
        # _features_padded broadcasts the resulting bank over ICI) — only
        # the small label arrays take the replicated mesh placement.  The
        # save_mem STREAMING path instead replicates the video over the
        # mesh (put below): each device runs the backbone on full frames
        # inside the scan, so every device needs every frame.
        feat_device = device
        if device is None:
            device = self._sp_sharding()

        def put(x):
            return _put(x, device)

        if cfg.save_mem:
            # streaming mode: only the first frame's features are extracted
            # up front (to size the value maps); the scan streams the rest
            f0 = self.extract_features(put(video[:1]))
            h, w = f0.shape[1:3]
        else:
            feats = self._features_padded(video, device=feat_device)
            h, w = feats.shape[1:3]

        labels = put(np.asarray(ref_mask, np.int32))
        small = jax.image.resize(
            labels.astype(jnp.float32)[..., None], (h, w, 1), method="nearest"
        )[..., 0].astype(jnp.int32)
        onehot = jax.nn.one_hot(small, num_objects + 1, dtype=jnp.float32)

        L_pad = _bucket(T, cfg.frame_bucket)
        if cfg.save_mem:
            video_p = np.concatenate(
                [video, np.repeat(video[-1:], L_pad - T, axis=0)], axis=0
            )
            masks = self._propagate_m_stream(
                put(video_p), onehot, decode_hw, mask_shape="square"
            )
        elif self.bank_mesh is not None:
            masks = self._propagate_m(
                feats, onehot, decode_hw, mask_shape="square", length=L_pad
            )
        else:
            feats_g = jax.lax.dynamic_slice_in_dim(feats, 0, L_pad, axis=0)
            masks = self._propagate_m(
                feats_g, onehot, decode_hw, mask_shape="square"
            )
        # frame 0 is ground truth at decode resolution
        mask0 = jax.image.resize(
            labels.astype(jnp.float32)[..., None],
            (*decode_hw, 1),
            method="nearest",
        )[..., 0].astype(jnp.int32)
        return {"masks": masks, "mask0": mask0, "T": T}

    def track_masks_collect(self, disp: Dict) -> np.ndarray:
        masks = np.array(disp["masks"])[: disp["T"]]
        masks[0] = np.asarray(disp["mask0"])
        return masks

    # ------------------------------------------------------------------ #
    def _features_padded(
        self, video: np.ndarray, device=None
    ) -> jax.Array:
        """Extract features for the T real frames, then zero-pad the feature
        bank by one extra frame bucket so per-group dynamic slices never
        clamp.  Padding the FEATURES (a cheap copy) instead of the video
        avoids running the backbone over up to 2×frame_bucket wasted frames;
        padded-slot outputs are either key_valid-masked or discarded.

        The video is uploaded in 16-frame chunks so the host→device transfer
        of chunk i+1 overlaps the backbone on chunk i (the tunnel link is
        the eval bottleneck).  `device` pins the upload + compute to one
        local device (data-parallel eval round-robin)."""
        cfg = self.cfg
        T = video.shape[0]
        t_pad = _bucket(T, cfg.frame_bucket) + cfg.frame_bucket

        if (
            cfg.upload_format == "yuv420"
            and isinstance(video, np.ndarray)
            and video.dtype == np.uint8
            and video.ndim == 4
            and video.shape[1] % 2 == 0
            and video.shape[2] % 2 == 0
        ):
            # halve the host→device bytes: I420 planes on the wire,
            # decoded on device in _extract_impl (ops/color.py codec)
            from fgvc_tpu.ops.color import rgb_to_yuv420_host

            video = rgb_to_yuv420_host(video)
        # a (T, H*3//2, W) uint8 array is ALREADY I420 planes (e.g. the
        # native loader's layout='i420' decode) — uploaded as-is

        def put(x):
            return _put(x, device)

        if (
            self.bank_mesh is not None
            and device is None
            and isinstance(video, np.ndarray)
        ):
            return self._features_padded_bank(video, T, t_pad)

        upload = put
        sp = self._sp_sharding()
        CH = 16
        n_sp = (
            int(np.prod(self.spatial_mesh.devices.shape))
            if self.spatial_mesh is not None
            else 0
        )
        if n_sp > 1 and CH % n_sp == 0:
            # frame-parallel feature extraction over the sp mesh: each
            # upload chunk is sharded over 'space' (same total tunnel
            # bytes; the backbone runs batch-parallel over the frames);
            # the final replicate below all_gathers the bank over ICI
            from jax.sharding import NamedSharding, PartitionSpec

            chunk_sh = NamedSharding(
                self.spatial_mesh, PartitionSpec("space")
            )

            def upload(x):  # noqa: F811
                return jax.device_put(x, chunk_sh)

        if isinstance(video, np.ndarray) and T > CH:
            n = -(-T // CH)
            video_p = np.concatenate(
                [video, np.zeros((n * CH - T, *video.shape[1:]), video.dtype)]
            )
            parts = [
                self._extract(upload(video_p[i * CH : (i + 1) * CH]))
                for i in range(n)
            ]
            feats = jnp.concatenate(parts, axis=0)[:T]
        else:
            feats = self.extract_features(put(video))
        feats = jnp.pad(feats, ((0, t_pad - T), (0, 0), (0, 0), (0, 0)))
        if sp is not None:
            # broadcast the bank onto the spatial mesh (ICI) so the sharded
            # propagation sees mesh-placed operands, not a device-0 commit
            feats = jax.device_put(feats, sp)
        return feats

    def _features_padded_bank(self, video: np.ndarray, T: int, t_pad: int):
        """Frame-SHARDED feature extraction for bank-parallel mode.

        The capacity point of bank_mesh is that no device ever holds the
        full (T, h, w, C) bank — so the bank must be born sharded, not
        extracted replicated and resharded (which would put one full copy
        on the default device first, the exact OOM the mode exists to
        avoid).  Each mesh device extracts only its contiguous frame block
        (video chunks uploaded pinned to that device, the backbone runs
        where its input lives), and the global bank is assembled zero-copy
        via make_array_from_single_device_arrays with a PSpec('bank')
        frame sharding.  Per-device HBM high-water = one shard + one
        16-frame upload chunk.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = self.bank_mesh
        devs = list(mesh.devices.flatten())
        n = len(devs)
        t_pad = -(-t_pad // n) * n  # even shards: no in-scan re-pad/reshard
        Ts = t_pad // n
        CH = 16
        parts = []
        feat_shape = None
        for i, dev in enumerate(devs):
            lo = i * Ts
            n_real = min(max(T - lo, 0), Ts)
            if n_real > 0:
                block = video[lo : lo + n_real]
                if n_real > CH:
                    m = -(-n_real // CH)
                    block_p = np.concatenate(
                        [
                            block,
                            np.zeros(
                                (m * CH - n_real, *block.shape[1:]),
                                block.dtype,
                            ),
                        ]
                    )
                    chunks = [
                        self._extract(
                            jax.device_put(
                                block_p[j * CH : (j + 1) * CH], dev
                            )
                        )
                        for j in range(m)
                    ]
                    fi = jnp.concatenate(chunks, axis=0)[:n_real]
                else:
                    fi = self._extract(jax.device_put(block, dev))
                fi = jnp.pad(
                    fi, ((0, Ts - n_real), (0, 0), (0, 0), (0, 0))
                )
                feat_shape = fi.shape[1:]
                feat_dtype = fi.dtype
            else:
                # shard beyond the video: zeros, moved device-to-device
                # (ICI) rather than re-uploaded through the host link
                fi = jax.device_put(
                    jnp.zeros((Ts, *feat_shape), feat_dtype), dev
                )
            parts.append(fi)
        return jax.make_array_from_single_device_arrays(
            (t_pad, *feat_shape),
            NamedSharding(mesh, PartitionSpec("bank")),
            parts,
        )
