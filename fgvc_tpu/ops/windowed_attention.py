"""Tiled windowed top-k attention — the fast path for label propagation.

The dense kernel (ops/attention.py) computes every query-key affinity and
then masks ~96% of them away (circle radius 15 on a 128×128 grid).  This
implementation exploits the mask's locality the TPU-native way:

  * queries are tiled into (tile × tile) blocks, processed by a `lax.scan`,
  * each tile only sees a (tile + 2·halo)² key/value halo sliced around
    itself — every key allowed by the circle mask lies inside the halo, so
    results are numerically identical to the dense kernel (verified in
    tests/test_windowed_attention.py),
  * per-tile affinity is one MXU-friendly matmul (tile², C) × (C, T·win²);
    top-k shrinks from T·H·W to T·win² candidates,
  * peak memory is one (tile², T·win²) affinity block (~90 MB at DAVIS
    shapes) instead of the reference's step-chunked (T·H·W, step) slabs.

This replaces the reference's `step`-chunked full-affinity loop
(/root/reference/mmpt/models/common/local_attention.py:267) — same
semantics, ~5-8× fewer FLOPs, no (T·H·W × H·W) intermediate.

Restrictions vs the dense kernel: requires a finite radius and
non_mask_len == 0 (the shipped eval configs satisfy both); call sites fall
back to the dense kernel otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fgvc_tpu.ops.attention import l2_normalize

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,   # 6-pass f32 on MXU (parity)
    "high": jax.lax.Precision.HIGH,         # 3-pass bf16x3 (~2^-21 rel err)
    "default": jax.lax.Precision.DEFAULT,   # plain bf16 multiplies
}


def _gather_free_value_matmul(aff, w10, v_flat, prec):
    """Thresholded-softmax value lookup WITHOUT a scattered gather.

    `w10` holds the exact top-k affinities per row. Every entry of `aff`
    >= the k-th value gets its softmax weight; entries exactly AT the
    threshold share the remaining top-k budget fractionally (tie-split) —
    with the duplicated-first-frame keys of early propagation steps
    (identical keys AND values) this reproduces exact-top-k output.
    The clamps keep -inf rows finite.
    """
    m = jnp.maximum(jnp.max(w10, -1, keepdims=True), -1e30)
    thresh = jnp.maximum(jnp.min(w10, -1, keepdims=True), -1e30)
    z = jnp.sum(jnp.exp(w10 - m), axis=-1, keepdims=True) + 1e-30
    above = (aff > thresh).astype(jnp.float32)
    at = (aff == thresh).astype(jnp.float32)
    n_at = jnp.sum(at, axis=-1, keepdims=True)
    n_sel = jnp.sum((w10 == thresh).astype(jnp.float32), -1, keepdims=True)
    tie_frac = jnp.where(n_at > 0, n_sel / jnp.maximum(n_at, 1.0), 0.0)
    weights = jnp.exp(aff - m) * (above + tie_frac * at) / z
    return jnp.einsum(
        "sk,kc->sc",
        weights,
        v_flat,
        preferred_element_type=jnp.float32,
        precision=prec,
    )


class _TileGeometry:
    """Shared query-tile geometry for the windowed kernels — ONE definition
    of the tile/halo padding, the static circle/square window mask, the
    per-tile in-bounds bias, and the output un-tiling, used by both
    `masked_topk_attention_tiled` and its bank-sharded twin so that mask or
    bounds fixes cannot silently drift between them.

    `fullH` is the full query-grid height when the query is a row BLOCK of
    it (spatial-parallel mode); `grid_rows` over-pads the key/value row
    extent across all blocks.  For a whole-grid query both default to H.
    """

    def __init__(self, H, W, tile, radius, mask_shape,
                 full_h=None, grid_rows=None):
        self.H, self.W, self.tile, self.radius = H, W, tile, radius
        self.halo = int(radius)
        self.win = tile + 2 * self.halo
        self.S = tile * tile
        self.fullH = H if full_h is None else full_h
        self.Hp = -(-H // tile) * tile
        self.Wp = -(-W // tile) * tile
        self.gridH = (
            (-(-self.fullH // tile) * tile) if grid_rows is None else grid_rows
        )
        self.nth, self.ntw = self.Hp // tile, self.Wp // tile

        # static window mask in tile-local coords: key global offset from
        # the query pixel is (ki - halo - qi, kj - halo - qj)
        tt, ww = (tile, tile), (self.win, self.win)
        qi = jax.lax.broadcasted_iota(jnp.float32, tt, 0).reshape(-1)
        qj = jax.lax.broadcasted_iota(jnp.float32, tt, 1).reshape(-1)
        self.ki = jax.lax.broadcasted_iota(jnp.float32, ww, 0).reshape(-1)
        self.kj = jax.lax.broadcasted_iota(jnp.float32, ww, 1).reshape(-1)
        dy = jnp.abs(self.ki[None, :] - self.halo - qi[:, None])
        dx = jnp.abs(self.kj[None, :] - self.halo - qj[:, None])
        if mask_shape == "circle":
            self.mask = dy * dy + dx * dx < radius * radius  # (S, win²)
        else:  # 'square': the mmcv-Correlation window (|d| <= radius)
            self.mask = (dy <= radius) & (dx <= radius)

    def pad_query(self, query):
        return jnp.pad(
            query, ((0, self.Hp - self.H), (0, self.Wp - self.W), (0, 0))
        )

    def pad_values(self, value):
        h = self.halo
        return jnp.pad(
            value,
            (
                (0, 0),
                (h, h + self.gridH - self.fullH),
                (h, h + self.Wp - self.W),
                (0, 0),
            ),
        )

    def bias(self, tr, tc, frame_bias):
        """(S, T, win²) additive bias: -inf outside the window mask or the
        un-padded image bounds; `frame_bias` (T,) adds per-slot validity.
        `tr`/`tc` are the tile's GLOBAL row/col origin."""
        ninf = jnp.float32(-jnp.inf)
        kgi = tr + self.ki - self.halo
        kgj = tc + self.kj - self.halo
        in_bounds = (
            (kgi >= 0)
            & (kgi <= self.fullH - 1)
            & (kgj >= 0)
            & (kgj <= self.W - 1)
        )
        allowed = self.mask & in_bounds[None, :]  # (S, win²)
        return jnp.where(allowed[:, None, :], 0.0, ninf) + frame_bias[
            None, :, None
        ]

    def untile(self, outs, Cv):
        out = outs.reshape(
            self.nth, self.ntw, self.tile, self.tile, Cv
        ).transpose(0, 2, 1, 3, 4)
        return out.reshape(self.Hp, self.Wp, Cv)[: self.H, : self.W]


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "temperature",
        "topk",
        "normalize",
        "tile",
        "mode",
        "mask_shape",
        "precision",
        "topk_impl",
        "full_h",
        "grid_rows",
    ),
)
def masked_topk_attention_tiled(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    radius: float,
    temperature: float = 1.0,
    topk: Optional[int] = None,
    normalize: bool = True,
    tile: int = 32,
    mode: str = "softmax",
    mask_shape: str = "circle",
    key_valid: Optional[jax.Array] = None,
    precision: str = "highest",
    topk_impl: str = "exact",
    frame_idx: Optional[jax.Array] = None,
    row_offset: Optional[jax.Array] = None,
    full_h: Optional[int] = None,
    grid_rows: Optional[int] = None,
) -> jax.Array:
    """Drop-in equivalent of masked_topk_attention for non_mask_len == 0.

    Args: see masked_topk_attention.  `tile` is the query tile edge; `halo`
    is ceil(radius) so the circle mask (strict <) is fully covered.

    Bank mode (`frame_idx` given): `key` is instead the FULL pre-normalized,
    pre-padded feature bank of shape (Tb, Hp + 2·halo, Wp + 2·halo, C) —
    built once per video by pad_key_bank() — and the window's key frames are
    sliced per tile straight from it. This removes the per-step pad/concat/
    gather of the 6-frame key tensor (~300 MB of HBM copies per frame).

    Row-block mode (`row_offset` given, spatial-parallel propagation):
    `query` is a CONTIGUOUS ROW BLOCK of the full query grid starting at
    global row `row_offset` (a traced scalar — each shard_map participant
    passes its own); `full_h` is the full grid height (key-validity bounds)
    and `grid_rows` the padded row total across all blocks (key/value
    padding extent).  Block rows whose GLOBAL row is >= `full_h` compute
    garbage (fully masked → NaN under softmax) — callers slice the gathered
    result to `full_h` before use.
    """
    if mode not in ("softmax", "cosine"):
        raise ValueError(f"unknown mode {mode}")
    if topk_impl not in ("exact", "segmented", "certified", "approx"):
        raise ValueError(f"unknown topk_impl {topk_impl}")
    H, W, C = query.shape          # H = query-block rows (== full_h normally)
    T = value.shape[0] if frame_idx is not None else key.shape[0]
    Cv = value.shape[-1]
    prec = _PRECISIONS[precision]

    g = _TileGeometry(H, W, tile, radius, mask_shape,
                      full_h=full_h, grid_rows=grid_rows)
    halo, win, S = g.halo, g.win, g.S
    K = T * win * win
    nth, ntw = g.nth, g.ntw
    if row_offset is None:
        row_offset = jnp.int32(0)

    if normalize:
        query = l2_normalize(query)
        if frame_idx is None:
            key = l2_normalize(key)

    qpad = g.pad_query(query)
    if frame_idx is None:
        kpad = g.pad_values(key)
    else:
        kpad = key  # already padded bank (Tb, gridH+2halo, Wp+2halo, C)
    vpad = g.pad_values(value)

    ninf = jnp.float32(-jnp.inf)
    if key_valid is not None:
        frame_bias = jnp.where(key_valid, 0.0, ninf)  # (T,)
    else:
        frame_bias = jnp.zeros((T,), jnp.float32)

    def tile_fn(_, t_idx):
        tr_loc = (t_idx // ntw) * tile  # tile row origin (query-block local)
        tr = row_offset + tr_loc        # tile row origin (global)
        tc = (t_idx % ntw) * tile

        q_t = jax.lax.dynamic_slice(qpad, (tr_loc, tc, 0), (tile, tile, C))
        if frame_idx is None:
            k_t = jax.lax.dynamic_slice(kpad, (0, tr, tc, 0), (T, win, win, C))
        else:
            k_t = jax.vmap(
                lambda fi: jax.lax.dynamic_slice(
                    kpad, (fi, tr, tc, 0), (1, win, win, C)
                )[0]
            )(frame_idx)
        v_t = jax.lax.dynamic_slice(vpad, (0, tr, tc, 0), (T, win, win, Cv))

        aff = (
            jnp.einsum(
                "sc,kc->sk",
                q_t.reshape(S, C),
                k_t.reshape(K, C),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            / temperature
        )  # (S, K)

        # -inf outside the window mask / image bounds; invalid frame slots
        aff = aff + g.bias(tr, tc, frame_bias).reshape(S, K)

        if topk is not None and mode == "softmax" and topk_impl == "approx":
            # Gather-free approximate top-k: approx_max_k uses the TPU
            # PartialReduce unit (~2× faster than the bitonic sort behind
            # lax.top_k, recall ≈ 0.95 per element), and the value lookup
            # becomes one dense MXU matmul with weights thresholded at the
            # k-th affinity — no scattered gather at all.
            # NOTE the threshold-derived scalars must come from REDUCTIONS
            # over the (S, k) array: slicing columns out of a top-k result
            # and broadcasting them against (S, K) hits a pathological
            # XLA:TPU layout path (~20× slower; see _thresh_bench history).
            w10, _ = jax.lax.approx_max_k(
                aff, topk, recall_target=0.95, aggregate_to_topk=True
            )
            m = jnp.maximum(jnp.max(w10, -1, keepdims=True), -1e30)
            thresh = jnp.maximum(jnp.min(w10, -1, keepdims=True), -1e30)
            z = jnp.sum(jnp.exp(w10 - m), axis=-1, keepdims=True) + 1e-30
            step = jnp.clip(jnp.sign(aff - thresh) + 1.0, 0.0, 1.0)
            weights = jnp.exp(aff - m) * step / z
            out = jnp.einsum(
                "sk,kc->sc",
                weights,
                v_t.reshape(K, Cv),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        elif topk is not None and mode == "softmax" and topk_impl == "certified":
            # EXACT top-k at ~approx speed: oversampled approx_max_k gives
            # k'=max(32, 2k) candidates via the TPU PartialReduce unit; a
            # one-pass count certificate proves every element strictly above
            # the candidate floor is inside the candidate set (hence the true
            # top-k is); the rare failure falls back to lax.top_k. The value
            # lookup is the same gather-free thresholded matmul with the
            # tie-split correction as the segmented path.
            kp = max(32, 2 * topk)
            cand, _ = jax.lax.approx_max_k(
                aff, kp, recall_target=0.95, aggregate_to_topk=True
            )
            floor = jnp.maximum(jnp.min(cand, -1, keepdims=True), -1e30)
            n_above_all = jnp.sum(aff > floor, axis=-1)
            n_above_cand = jnp.sum(cand > floor, axis=-1)
            certified = jnp.all(n_above_all == n_above_cand)

            w10 = jax.lax.cond(
                certified,
                lambda: jax.lax.top_k(cand, topk)[0],
                lambda: jax.lax.top_k(aff, topk)[0],
            )
            out = _gather_free_value_matmul(aff, w10, v_t.reshape(K, Cv), prec)
        elif topk is not None and mode == "softmax" and topk_impl == "segmented":
            # EXACT top-k via segment-max prefiltering (ops/topk.py: the
            # bitonic sort runs over k·seg candidates instead of K) + the
            # same gather-free thresholded value matmul as approx mode.
            # Numerically identical to the exact path except on exact
            # affinity ties at the k-th value (measure-zero for real
            # features): every entry ≥ the k-th affinity gets weighted.
            from fgvc_tpu.ops.topk import topk_segmented

            w10, _ = topk_segmented(aff, topk, seg=512)
            out = _gather_free_value_matmul(aff, w10, v_t.reshape(K, Cv), prec)
        elif topk is not None:
            w, idxs = jax.lax.top_k(aff, topk)  # (S, k)
            if mode == "softmax":
                w = jax.nn.softmax(w, axis=-1)
            else:
                w = jnp.maximum(w, 0.0) ** 2
            vals = v_t.reshape(K, Cv)[idxs]  # (S, k, Cv)
            out = jnp.einsum(
                "sk,skc->sc",
                w,
                vals,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        else:
            if mode == "softmax":
                w = jax.nn.softmax(aff, axis=-1)
            else:
                w = jnp.maximum(aff, 0.0) ** 2
            out = jnp.einsum(
                "sk,kc->sc",
                w,
                v_t.reshape(K, Cv),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        return None, out  # (S, Cv)

    _, outs = jax.lax.scan(tile_fn, None, jnp.arange(nth * ntw))
    return g.untile(outs, Cv)


def masked_topk_attention_tiled_bank_sharded(
    query: jax.Array,
    bank_shard: jax.Array,
    value: jax.Array,
    *,
    frame_idx: jax.Array,
    shard_lo: jax.Array,
    axis_name: str = "bank",
    radius: float,
    temperature: float = 1.0,
    topk: int = 10,
    tile: int = 32,
    mask_shape: str = "circle",
    key_valid: Optional[jax.Array] = None,
    precision: str = "highest",
) -> jax.Array:
    """Bank-SHARDED windowed top-k attention — distributed exact top-k.

    Memory-parallel counterpart of `masked_topk_attention_tiled`'s bank
    mode for banks too large for one chip's HBM: the padded feature bank
    is sharded over a mesh axis (`axis_name`) on its FRAME dim, and the
    exact top-k + softmax value mix is reconstructed with three small
    collectives per query tile:

      1. each device computes affinities only for the window slots its
         shard owns (others are -inf) and takes its LOCAL top-k values,
      2. an `all_gather` of the (S, k) local top-k lists merges them into
         the GLOBAL top-k (the global top-k of a union is contained in
         the union of per-shard top-ks),
      3. every device mixes its local values with the global-threshold
         softmax weights (same tie-split semantics as
         `_gather_free_value_matmul`, with the tie COUNT `psum`-ed so the
         fractional split is global), and a `psum` sums the partial
         numerators.

    The softmax normalizer comes from the gathered global top-k values
    alone, so the result equals the single-device kernel up to partial-sum
    reassociation (verified ≲1e-5 in tests/test_bank_parallel.py; top-k
    SELECTION is bitwise identical).

    Must be called inside `shard_map` over a mesh with axis `axis_name`.
    The reference has no counterpart — its banks are single-GPU resident
    (/root/reference/mmpt/models/trackers/vanilla_tracker.py forward_test
    keeps the whole feature history on one device).

    Args:
      query: (H, W, C) full query frame, PRE-NORMALIZED, replicated.
      bank_shard: (Tl, gridH + 2·halo, Wp + 2·halo, C) this device's
        contiguous frame shard of the pad_key_bank() output.
      value: (Twin, H, W, Cv) replicated window value maps (slot order
        matches `frame_idx`).
      frame_idx: (Twin,) GLOBAL bank indices of the window slots.
      shard_lo: traced scalar — global index of bank_shard[0]
        (axis_index * Tl at the call site).
      key_valid: (Twin,) bool — invalid slots contribute nothing.
      topk: required (the distributed merge is what this op is for).

    Returns: (H, W, Cv) propagated values, replicated across the axis.
    """
    if topk is None:
        raise ValueError("bank-sharded attention requires topk")
    H, W, C = query.shape
    Tl = bank_shard.shape[0]
    Twin = value.shape[0]
    Cv = value.shape[-1]
    prec = _PRECISIONS[precision]

    g = _TileGeometry(H, W, tile, radius, mask_shape)
    win, S = g.win, g.S
    K = Twin * win * win
    nth, ntw = g.nth, g.ntw

    qpad = g.pad_query(query)
    vpad = g.pad_values(value)

    owns = (frame_idx >= shard_lo) & (frame_idx < shard_lo + Tl)
    lidx = jnp.clip(frame_idx - shard_lo, 0, Tl - 1).astype(jnp.int32)
    valid = owns if key_valid is None else (owns & key_valid)
    ninf = jnp.float32(-jnp.inf)
    frame_bias = jnp.where(valid, 0.0, ninf)  # (Twin,)

    def tile_fn(_, t_idx):
        tr = (t_idx // ntw) * tile
        tc = (t_idx % ntw) * tile
        q_t = jax.lax.dynamic_slice(qpad, (tr, tc, 0), (tile, tile, C))
        k_t = jax.vmap(
            lambda fi: jax.lax.dynamic_slice(
                bank_shard, (fi, tr, tc, 0), (1, win, win, C)
            )[0]
        )(lidx)
        v_t = jax.lax.dynamic_slice(vpad, (0, tr, tc, 0), (Twin, win, win, Cv))

        aff = (
            jnp.einsum(
                "sc,kc->sk",
                q_t.reshape(S, C),
                k_t.reshape(K, C),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            / temperature
        )  # (S, K)

        aff = aff + g.bias(tr, tc, frame_bias).reshape(S, K)

        # --- distributed exact top-k merge over the bank axis ---
        w_loc = jax.lax.top_k(aff, topk)[0]  # (S, k) local
        w_all = jax.lax.all_gather(w_loc, axis_name)  # (n, S, k)
        w10 = jax.lax.top_k(
            jnp.moveaxis(w_all, 0, 1).reshape(S, -1), topk
        )[0]  # (S, k) GLOBAL — identical on every device

        m = jnp.maximum(jnp.max(w10, -1, keepdims=True), -1e30)
        thresh = jnp.maximum(jnp.min(w10, -1, keepdims=True), -1e30)
        z = jnp.sum(jnp.exp(w10 - m), axis=-1, keepdims=True) + 1e-30
        above = (aff > thresh).astype(jnp.float32)
        at = (aff == thresh).astype(jnp.float32)
        n_at = jax.lax.psum(
            jnp.sum(at, axis=-1, keepdims=True), axis_name
        )  # global tie count at the threshold
        n_sel = jnp.sum((w10 == thresh).astype(jnp.float32), -1, keepdims=True)
        tie_frac = jnp.where(n_at > 0, n_sel / jnp.maximum(n_at, 1.0), 0.0)
        weights = jnp.exp(aff - m) * (above + tie_frac * at) / z
        part = jnp.einsum(
            "sk,kc->sc",
            weights,
            v_t.reshape(K, Cv),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return None, jax.lax.psum(part, axis_name)  # (S, Cv)

    _, outs = jax.lax.scan(tile_fn, None, jnp.arange(nth * ntw))
    return g.untile(outs, Cv)


def pad_key_bank(
    bank: jax.Array,
    radius: float,
    tile: int = 32,
    grid_rows: Optional[int] = None,
) -> jax.Array:
    """Pre-normalize + halo-pad a (Tb, H, W, C) feature bank for bank mode.

    `grid_rows` over-pads the row extent for spatial-parallel row blocks
    (n_shards · rows_per_shard may exceed the single-grid padded height).
    """
    halo = int(radius)
    H, W = bank.shape[1:3]
    Hp = (-(-H // tile) * tile) if grid_rows is None else grid_rows
    Wp = -(-W // tile) * tile
    from fgvc_tpu.ops.attention import build_padded_bank

    # chunked normalize-into-pad: no full normalized temp in HBM
    return build_padded_bank(
        bank,
        halo=halo,
        rows_total=H + 2 * halo + (Hp - H),
        cols_total=W + 2 * halo + (Wp - W),
        normalize=True,
    )
