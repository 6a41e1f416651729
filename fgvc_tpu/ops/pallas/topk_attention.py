"""Fused windowed top-k attention — single-pass Pallas TPU kernel.

The hot op of the framework (label propagation: each query tile attends over
a radius-masked halo of T key frames, top-k softmax, value propagation)
fused into one kernel. v2 design (kernel roadmap item 1): the query tile is
small enough (tile=16 → S=256) that the FULL (S, T·win²) affinity block
stays resident in VMEM, so everything happens in ONE pass:

  1. per key frame, DMA its halo window HBM→VMEM (double-buffered) and
     compute the affinity block on the MXU straight into a VMEM scratch,
  2. exact top-k statistics by k+1 streamed VPU rounds: round r extracts
     the r-th DISTINCT value (masked row-max) AND the cumulative
     occurrence count of round r-1's value from the SAME read — no bitonic
     sort, no affinity recompute, arbitrary ties counted exactly,
  3. per key frame, DMA its value halo and accumulate
     output += exp(aff − max)·[aff > kth] (+ fractional tie share) @ V —
     a dense MXU matmul instead of a scattered gather, reading the affinity
     back from VMEM.

Frame indices arrive through SMEM, so the key/value HBM operands can be a
FULL per-video bank indexed by the sliding window (first + preceding
frames) — no per-step gather of multi-GB banks (roadmap item 3).

Semantics match the XLA kernels (ops/windowed_attention.py) and therefore
the reference masked_attention_efficient
(/root/reference/mmpt/models/common/local_attention.py:267), with one
precisely-scoped exception: candidates TIED at the k-th affinity value.
The top-k STATISTICS (threshold, selected count, softmax normalizer) are
exact for every tie structure, but the value mixing is a fractional
tie-split — each tied candidate receives (slots remaining)/(ties) of the
threshold weight — where lax.top_k/torch.topk pick winners by index order.
The two coincide whenever tied candidates carry equal values (duplicated
first frames of early steps, flat regions propagating a locally-constant
label map); they differ only when identical-feature keys hold DIFFERENT
values, where the reference's pick is itself an arbitrary index-order
artifact and the fractional split is the permutation-invariant choice.
Pinned in tests/test_pallas_attention.py::test_tie_semantics_at_threshold;
the synthetic metric study (docs/precision_study.md) bounds the end-to-end
effect together with the precision modes.

VMEM peak ≈ 22 MB at DAVIS shapes (tile 16, halo 15, T 6, C 256, Pp 128).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fgvc_tpu.ops.attention import l2_normalize

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_compute_dtype(matmul_precision: str) -> str:
    """TestConfig.matmul_precision -> fused-kernel compute_dtype."""
    return {"default": "bfloat16", "high": "high"}.get(
        matmul_precision, "float32"
    )


_PALLAS_PRECISIONS = {
    # compute_dtype -> operand dtype (the matmul mode rides separately:
    # float32 = 6-pass HIGHEST, high = manual 3-term bf16x3, bfloat16 =
    # native one-pass)
    "float32": jnp.float32,
    "high": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def _make_kernel(
    *,
    T: int,
    tile: int,
    halo: int,
    C: int,
    Pp: int,
    H: int,
    W: int,
    topk: int,
    inv_temp: float,
    radius: float,
    square: bool,
    dtype,
    mode: str = "float32",
    debug_passes: str = "abc",
):
    win = tile + 2 * halo
    wpad = _round_up(win, 8)   # HBM slice widths must align to sublane tiling
    rows_pad = _round_up(win, 8)
    S = tile * tile
    FK = rows_pad * wpad       # keys per frame block (incl. masked pad)
    K = T * FK

    def kernel(row0_ref, idx_ref, fb_ref, rbias_ref, q_ref, k_hbm, v_hbm,
               out_ref, aff_ref, k_buf, v_buf, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        # row0: global row origin of this query block (0 unless the caller
        # runs a spatial-parallel row block — see fused_topk_attention_banked)
        r0 = row0_ref[0] + ti * tile
        c0 = tj * tile

        q = q_ref[:].reshape(S, C)
        if mode == "high":
            # manual bf16x3: x = hi + lo with hi = bf16(x); the affinity is
            # hi·hi + hi·lo + lo·hi on the native bf16 MXU path (the lo·lo
            # term is ~2^-18 relative — below f32 rounding of the sum).
            # Mosaic lacks Precision.HIGH, hence the explicit decomposition.
            q_hi = q.astype(jnp.bfloat16)
            q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        # mask bias over one frame block (S, FK): the tile-INVARIANT
        # radius/window part arrives precomputed (rbias_ref — constant
        # index_map, so it is DMA'd once and stays VMEM-resident across
        # grid steps instead of ~26 VPU ops × (S, FK) per tile); only the
        # image-border clip depends on the tile origin, and it is
        # query-row-invariant — a (1, FK) strip broadcast over S
        col_1 = jax.lax.broadcasted_iota(jnp.int32, (1, FK), 1)
        wi1 = (col_1 // wpad).astype(jnp.float32)
        wj1 = (col_1 % wpad).astype(jnp.float32)
        kgi = r0 + wi1 - halo
        kgj = c0 + wj1 - halo
        in_img = (kgi >= 0) & (kgi <= H - 1) & (kgj >= 0) & (kgj <= W - 1)
        bias = rbias_ref[:] + jnp.where(in_img, 0.0, NEG)

        def k_dma(slot, t, r=None, c=None):
            return pltpu.make_async_copy(
                k_hbm.at[
                    idx_ref[t],
                    pl.ds(r0 if r is None else r, rows_pad),
                    pl.ds(c0 if c is None else c, wpad),
                    :,
                ],
                k_buf.at[slot],
                sem.at[slot],
            )

        def v_dma(slot, t):
            return pltpu.make_async_copy(
                v_hbm.at[t, pl.ds(r0, rows_pad), pl.ds(c0, wpad), :],
                v_buf.at[slot],
                sem.at[2 + slot],
            )

        # ---------- pass A: affinity into VMEM, one matmul per frame ------- #
        # frame-0 keys arrive by CROSS-STEP PREFETCH: every grid step but
        # the last issues the NEXT step's frame-0 key DMA right after its
        # own pass A (k_buf[0] is free then), so the copy streams behind
        # passes B+C (~⅔ of the kernel) instead of stalling the next pass A.
        # Grid steps run sequentially row-major on a TPU core
        # (dimension_semantics='arbitrary' pins it); only the very first
        # step starts its own frame 0.
        @pl.when((ti == 0) & (tj == 0))
        def _():
            k_dma(0, 0).start()

        if debug_passes == "abc":
            # value frame 0 can stream behind the whole of pass A/B (the
            # profiling cut-downs never reach pass C — keep their
            # semaphore accounting clean by not issuing it there)
            v_dma(0, 0).start()

        def pa_frame(t, _):
            slot = t % 2

            @pl.when(t + 1 < T)
            def _():
                k_dma((t + 1) % 2, t + 1).start()

            k_dma(slot, t).wait()
            kf = k_buf[slot].reshape(FK, C)

            def dot_bf16(a, b):
                return jax.lax.dot_general(
                    a,
                    b,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            if mode == "high":
                k_hi = kf.astype(jnp.bfloat16)
                k_lo = (kf - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                aff = (
                    dot_bf16(q_hi, k_hi)
                    + dot_bf16(q_hi, k_lo)
                    + dot_bf16(q_lo, k_hi)
                ) * inv_temp
            else:
                aff = (
                    jax.lax.dot_general(
                        q,
                        kf,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(
                            jax.lax.Precision.DEFAULT
                            if dtype == jnp.bfloat16
                            else jax.lax.Precision.HIGHEST
                        ),
                    )
                    * inv_temp
                )
            aff_ref[:, pl.ds(t * FK, FK)] = aff + bias + fb_ref[t]
            return 0

        jax.lax.fori_loop(0, T, pa_frame, 0)

        # cross-step prefetch: next grid step's frame-0 keys (see pass A)
        ntw = pl.num_programs(1)
        lin_next = ti * ntw + tj + 1
        @pl.when(lin_next < pl.num_programs(0) * ntw)
        def _():
            r2 = row0_ref[0] + (lin_next // ntw) * tile
            c2 = (lin_next % ntw) * tile
            k_dma(0, 0, r=r2, c=c2).start()

        if debug_passes == "a":
            # profiling mode (tools/bench/pass_breakdown.py): pass A only —
            # emit a cheap slice of the resident affinity so nothing is DCE'd
            out_ref[:] = aff_ref[:, :Pp].reshape(tile, tile, Pp)
            return

        # ---------- pass B: distinct-value top-k stats on the VPU ---------- #
        # Round r finds the largest affinity STRICTLY below round r-1's
        # value — a read-only descending scan of the resident affinity
        # (values per round strictly decrease, so at most k rounds cover
        # >= k elements).  The SAME read also produces the cumulative
        # occurrence count count_ge(v_{r-1}) of the PREVIOUS round's value:
        # the two reductions are data-independent, so they share one VMEM
        # traversal instead of the old dependent max-then-count pair —
        # pass B is ~k+1 streamed passes, and exact for EVERY tie
        # structure (duplicated first frames, frozen videos, flat regions
        # tying within a frame, bf16 value collisions), with no
        # duplicate-detection predicates.
        RUNW = 128
        assert topk <= RUNW, f"topk={topk} exceeds the {RUNW}-lane run buffer"
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, RUNW), 1)

        vals = jnp.full((S, RUNW), NEG, jnp.float32)
        cges = jnp.zeros((S, RUNW), jnp.float32)  # cge_i = #(a >= v_i)
        prev = jnp.full((S, 1), jnp.float32(1e30))
        for r in range(topk + 1):
            a = aff_ref[:]
            # ONE comparison serves both reductions: count(a >= prev) is the
            # complement of count(a < prev), and the next distinct value is
            # the max over exactly the a < prev elements — the masked pad
            # lanes (NEG) are always < prev, so they land in the complement
            # count and never in the max
            lt = a < prev
            if r > 0:
                cge = jnp.float32(a.shape[-1]) - jnp.sum(
                    lt.astype(jnp.float32), axis=-1, keepdims=True
                )
                cges = jnp.where(lane == r - 1, cge, cges)
            if r < topk:
                m = jnp.max(
                    jnp.where(lt, a, NEG), axis=-1, keepdims=True
                )
                vals = jnp.where(lane == r, m, vals)
                prev = m

        live = (lane < topk) & (vals > NEG / 2)
        mmax = vals[:, 0:1]

        # per-distinct counts from successive cumulative counts
        # (lane shift via a sub-diagonal matmul — Mosaic has no roll)
        li = jax.lax.broadcasted_iota(jnp.int32, (RUNW, RUNW), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (RUNW, RUNW), 1)
        shift = (li == lj - 1).astype(jnp.float32)
        cge_prev = jax.lax.dot_general(
            jnp.where(live, cges, 0.0),
            shift,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # cge_{i-1} at lane i (0 at lane 0)
        cnts = jnp.maximum(cges - cge_prev, 0.0)

        # threshold = k-th-largest ELEMENT: the first distinct value whose
        # cumulative count reaches topk; underfull rows (fewer live keys
        # than topk) fall back to their last live value — every tied key is
        # then taken exactly once (XLA tiled kernel semantics)
        # candidates are a SUFFIX of lanes (cges grow as vals fall): the
        # first lane reaching topk holds the LARGEST such value
        cand = live & (cges >= jnp.float32(topk))
        t1 = jnp.max(jnp.where(cand, vals, -jnp.inf), axis=-1, keepdims=True)
        t2 = jnp.min(jnp.where(live, vals, jnp.inf), axis=-1, keepdims=True)
        thresh = jnp.where(jnp.isfinite(t1), t1, t2)
        thresh = jnp.where(jnp.isfinite(thresh), thresh, NEG)

        # exact selection stats at the threshold lane (vals strictly
        # decrease across live lanes, so the lane match is unique)
        at_lane = live & (vals >= thresh) & (vals <= thresh)
        n_above = jnp.sum(
            jnp.where(at_lane, cge_prev, 0.0), -1, keepdims=True
        )
        cnt_at = jnp.sum(jnp.where(at_lane, cnts, 0.0), -1, keepdims=True)
        frac = jnp.clip(jnp.float32(topk) - n_above, 0.0, cnt_at) / (
            jnp.maximum(cnt_at, 1.0)
        )

        e_vals = jnp.exp(jnp.minimum(vals - mmax, 0.0))
        z = jnp.sum(
            jnp.where(live & (vals > thresh), e_vals * cnts, 0.0),
            -1,
            keepdims=True,
        ) + frac * cnt_at * jnp.exp(
            jnp.minimum(thresh - mmax, 0.0)
        ) * jnp.clip(jnp.sign(thresh - NEG / 2), 0.0, 1.0)
        z = jnp.maximum(z, 1e-30)

        if debug_passes == "ab":
            # profiling mode: passes A+B — emit the pass-B statistics so the
            # whole selection chain is live, skip the value pass
            stats = jnp.concatenate(
                [thresh, mmax, z, frac, n_above, cnt_at], axis=-1
            )
            out_ref[:] = jnp.pad(
                stats, ((0, 0), (0, Pp - 6))
            ).reshape(tile, tile, Pp)
            return

        # ---------- pass C: value accumulation from resident affinity ------ #
        # (frame-0 value DMA was issued at kernel entry — already resident)

        def pc_frame(t, acc):
            slot = t % 2

            @pl.when(t + 1 < T)
            def _():
                v_dma((t + 1) % 2, t + 1).start()

            v_dma(slot, t).wait()
            aff = aff_ref[:, pl.ds(t * FK, FK)]
            d = jnp.sign(aff - thresh)
            above = jnp.clip(d, 0.0, 1.0)                # aff > thresh
            at = (1.0 - jnp.abs(d)) * jnp.clip(          # aff == thresh,
                jnp.sign(aff - NEG / 2) + 1.0, 0.0, 1.0  # excluding masked
            )
            w = jnp.exp(jnp.minimum(aff - mmax, 0.0)) * (above + frac * at)
            if mode == "bfloat16":
                # throughput mode: native bf16 value matmul (f32 accum).
                # Weights are softmax terms in [0, 1] and values are label
                # probabilities — bf16 rounding is ~0.4% relative, inside
                # the mode's existing affinity rounding; measured
                # metric-neutral (docs/precision_study.md).
                acc = acc + jax.lax.dot_general(
                    w.astype(jnp.bfloat16),
                    v_buf[slot].reshape(FK, Pp),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            elif mode == "high":
                # same bf16x3 contract as the mode's affinity matmuls
                # (drop only the lo·lo term, ~2^-16 relative): 3 native
                # bf16 passes instead of the 6-pass HIGHEST lowering —
                # measured ~0.9 ms/frame off pass C at DAVIS shapes
                vf = v_buf[slot].reshape(FK, Pp)
                w_hi = w.astype(jnp.bfloat16)
                w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                v_hi = vf.astype(jnp.bfloat16)
                v_lo = (vf - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def dot_hv(x, y):
                    return jax.lax.dot_general(
                        x,
                        y,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )

                acc = (
                    acc
                    + dot_hv(w_hi, v_hi)
                    + dot_hv(w_hi, v_lo)
                    + dot_hv(w_lo, v_hi)
                )
            else:
                acc = acc + jax.lax.dot_general(
                    w,
                    v_buf[slot].reshape(FK, Pp),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            return acc

        acc = jax.lax.fori_loop(
            0, T, pc_frame, jnp.zeros((S, Pp), jnp.float32)
        )
        out_ref[:] = (acc / z).reshape(tile, tile, Pp)

    return kernel, rows_pad, wpad, FK, K


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "temperature",
        "topk",
        "normalize",
        "tile",
        "mask_shape",
        "compute_dtype",
        "interpret",
        "debug_passes",
    ),
)
def fused_topk_attention(
    query: jax.Array,    # (H, W, C)
    key: jax.Array,      # (Tb, H, W, C) key bank (>= T frames)
    value: jax.Array,    # (T, H, W, Cv)
    *,
    radius: float,
    temperature: float = 1.0,
    topk: int = 10,
    normalize: bool = True,
    tile: int = 16,
    mask_shape: str = "circle",
    key_valid: Optional[jax.Array] = None,
    frame_idx: Optional[jax.Array] = None,  # (T,) int32 into the key bank
    compute_dtype: str = "float32",
    interpret: bool = False,
    debug_passes: str = "abc",  # 'a'/'ab': profiling cut-downs (roofline)
) -> jax.Array:
    """Pallas-fused masked_topk_attention_tiled (softmax mode).

    `frame_idx` selects which bank frames serve as keys (bank-direct mode);
    without it the first T=value.shape[0] frames are used in order.

    compute_dtype 'bfloat16' computes affinities from bf16 query/key on the
    native MXU path (f32 accumulation) — ~2x faster, affinity error ~1e-2
    relative (may flip near-tied top-k members).
    """
    H, W, C = query.shape
    T = value.shape[0]
    Cv = value.shape[-1]

    halo = int(radius)
    win = tile + 2 * halo
    Hp = _round_up(H, tile)
    Wp = _round_up(W, tile)
    nth, ntw = Hp // tile, Wp // tile
    Pp = _round_up(Cv, 128)

    dtype = _PALLAS_PRECISIONS[compute_dtype]
    if normalize:
        query = l2_normalize(query)
        key = l2_normalize(key)
    query = query.astype(dtype)
    key = key.astype(dtype)

    rows_pad = _round_up(win, 8)
    wpad = _round_up(win, 8)
    qpad = jnp.pad(query, ((0, Hp - H), (0, Wp - W), (0, 0)))
    kpad = jnp.pad(
        key,
        (
            (0, 0),
            (halo, halo + Hp - H + (rows_pad - win)),
            (halo, halo + Wp - W + (wpad - win)),
            (0, 0),
        ),
    )
    vpad = jnp.pad(
        value,
        (
            (0, 0),
            (halo, halo + Hp - H + (rows_pad - win)),
            (halo, halo + Wp - W + (wpad - win)),
            (0, Pp - Cv),
        ),
    )

    return _call_fused_kernel(
        qpad, kpad, vpad,
        frame_idx=frame_idx, key_valid=key_valid,
        H=H, W=W, T=T, Cv=Cv,
        radius=float(radius), temperature=temperature, topk=topk,
        tile=tile, mask_shape=mask_shape, dtype=dtype, mode=compute_dtype,
        interpret=interpret, debug_passes=debug_passes,
    )


def pad_key_bank_pallas(
    bank: jax.Array,     # (Tb, H, W, C) raw feature bank
    radius: float,
    tile: int = 16,
    normalize: bool = True,
    compute_dtype: str = "float32",
    grid_rows: Optional[int] = None,
) -> jax.Array:
    """Normalize + halo-pad a full per-video feature bank ONCE for banked
    fused-kernel calls (roadmap item 3 — no per-step gathers).

    `grid_rows` over-pads the rows for spatial-parallel row blocks
    (n_shards · rows_per_shard may exceed the single-grid padded height)."""
    H, W = bank.shape[1:3]
    halo = int(radius)
    win = tile + 2 * halo
    Hp = _round_up(H, tile) if grid_rows is None else grid_rows
    Wp = _round_up(W, tile)
    rows_pad = _round_up(win, 8)
    wpad = _round_up(win, 8)
    from fgvc_tpu.ops.attention import build_padded_bank

    # chunked normalize-into-pad: no full normalized temp (the temp sets
    # the single-chip bank ceiling at Kinetics scale — docs/roofline.md)
    return build_padded_bank(
        bank,
        halo=halo,
        rows_total=H + 2 * halo + (Hp - H) + (rows_pad - win),
        cols_total=W + 2 * halo + (Wp - W) + (wpad - win),
        normalize=normalize,
        dtype=_PALLAS_PRECISIONS[compute_dtype],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "radius", "temperature", "topk", "tile", "mask_shape",
        "compute_dtype", "interpret", "grid_rows",
    ),
)
def fused_topk_attention_banked(
    qpad: jax.Array,     # (Hp, Wp, C) normalized padded query (bank dtype)
    kpad: jax.Array,     # padded bank from pad_key_bank_pallas
    value: jax.Array,    # (T, H, W, Cv) window value maps (unpadded)
    *,
    frame_idx: jax.Array,   # (T,) int32 bank indices of the key window
    key_valid: Optional[jax.Array],
    H: int,
    W: int,
    radius: float,
    temperature: float = 1.0,
    topk: int = 10,
    tile: int = 16,
    mask_shape: str = "circle",
    compute_dtype: str = "float32",
    interpret: bool = False,
    row0: Optional[jax.Array] = None,
    grid_rows: Optional[int] = None,
) -> jax.Array:
    """Bank-direct fused attention: keys are DMA'd per tile straight from the
    pre-padded full bank at `frame_idx` — built for the propagation scan.

    Spatial-parallel row-block mode (`row0` given): `qpad` is a row block of
    the padded query grid whose global row origin is the traced scalar
    `row0` (each shard_map participant passes its own), `kpad` comes from
    pad_key_bank_pallas(..., grid_rows=grid_rows), and the result keeps all
    block rows (shards all_gather then slice to H).  Block rows that fall
    outside the real grid compute zeros (fully-masked softmax)."""
    T = value.shape[0]
    Cv = value.shape[-1]
    halo = int(radius)
    win = tile + 2 * halo
    Hp = _round_up(H, tile) if grid_rows is None else grid_rows
    Wp = _round_up(W, tile)
    Pp = _round_up(Cv, 128)
    rows_pad = _round_up(win, 8)
    wpad = _round_up(win, 8)
    vpad = jnp.pad(
        value,
        (
            (0, 0),
            (halo, halo + Hp - H + (rows_pad - win)),
            (halo, halo + Wp - W + (wpad - win)),
            (0, Pp - Cv),
        ),
    )
    return _call_fused_kernel(
        qpad, kpad, vpad,
        frame_idx=frame_idx, key_valid=key_valid,
        H=H, W=W, T=T, Cv=Cv,
        radius=float(radius), temperature=temperature, topk=topk,
        tile=tile, mask_shape=mask_shape, dtype=qpad.dtype,
        mode=compute_dtype, interpret=interpret, row0=row0,
    )


def _call_fused_kernel(
    qpad, kpad, vpad, *, frame_idx, key_valid, H, W, T, Cv,
    radius, temperature, topk, tile, mask_shape, dtype, interpret,
    mode: str = "float32", row0: Optional[jax.Array] = None,
    debug_passes: str = "abc",
):
    if mode == "high" and qpad.dtype != jnp.float32:
        # bf16 operands would make the lo terms exactly zero — the caller
        # would silently get plain-bf16 accuracy while believing in bf16x3
        raise ValueError(
            "compute_dtype='high' needs float32 query/key operands; the "
            f"given bank is {qpad.dtype}"
        )
    C = qpad.shape[-1]
    if mode == "bfloat16":
        # bf16 value operand: halves the pass-C DMA bytes and runs the
        # value matmul on the native bf16 MXU path
        vpad = vpad.astype(jnp.bfloat16)
    halo = int(radius)
    win = tile + 2 * halo
    Wp = _round_up(W, tile)
    # grid rows come from the query block itself: the full padded grid
    # normally, a row block in spatial-parallel mode (row0 given)
    sp_block = row0 is not None
    nth, ntw = qpad.shape[0] // tile, Wp // tile
    Pp = vpad.shape[-1]

    if key_valid is not None:
        fb = jnp.where(key_valid, 0.0, NEG).astype(jnp.float32)
    else:
        fb = jnp.zeros((T,), jnp.float32)
    if frame_idx is None:
        frame_idx = jnp.arange(T, dtype=jnp.int32)
    idx_smem = frame_idx.astype(jnp.int32)
    fb_smem = fb

    kernel, rows_pad, wpad, FK, K = _make_kernel(
        T=T,
        tile=tile,
        halo=halo,
        C=C,
        Pp=Pp,
        H=H,
        W=W,
        topk=topk,
        inv_temp=1.0 / temperature,
        radius=float(radius),
        square=(mask_shape == "square"),
        dtype=dtype,
        mode=mode,
        debug_passes=debug_passes,
    )

    row0_smem = (
        jnp.zeros((1,), jnp.int32)
        if row0 is None
        else jnp.asarray(row0, jnp.int32).reshape(1)
    )

    S = tile * tile
    # tile-invariant radius/window-pad bias (S, FK), computed ONCE by XLA
    # (jit hoists it out of the propagation scan) and kept VMEM-resident in
    # the kernel via a constant index_map
    qi = (jnp.arange(S, dtype=jnp.int32)[:, None] // tile).astype(jnp.float32)
    qj = (jnp.arange(S, dtype=jnp.int32)[:, None] % tile).astype(jnp.float32)
    col = jnp.arange(FK, dtype=jnp.int32)[None, :]
    wi = (col // wpad).astype(jnp.float32)
    wj = (col % wpad).astype(jnp.float32)
    dy = wi - halo - qi
    dx = wj - halo - qj
    if mask_shape == "square":
        in_range = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
    else:
        in_range = dy * dy + dx * dx < radius * radius
    ok = in_range & (wi < win) & (wj < win)
    rbias = jnp.where(ok, 0.0, NEG).astype(jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nth * tile, Wp, Pp), jnp.float32),
        grid=(nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (S, FK), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile, Pp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S, K), jnp.float32),
            pltpu.VMEM((2, rows_pad, wpad, C), dtype),
            pltpu.VMEM((2, rows_pad, wpad, Pp), vpad.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            # the kernel prefetches the NEXT grid step's frame-0 keys —
            # grid steps must execute sequentially row-major (also keeps
            # Megacore from splitting the grid on multi-core chips)
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row0_smem, idx_smem, fb_smem, rbias, qpad, kpad, vpad)

    # spatial-parallel row blocks return every block row (the caller
    # gathers blocks across shards, then slices to the full grid height)
    return out[:, :W, :Cv] if sp_block else out[:H, :W, :Cv]
