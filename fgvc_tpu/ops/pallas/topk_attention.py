"""Fused windowed top-k attention — Pallas TPU kernel.

The hot op of the framework (label propagation: each query tile attends over
a radius-masked halo of T key frames, top-k softmax, value propagation)
fused into one kernel so the (S, T·win²) affinity never leaves VMEM:

  pass 1: per key frame, DMA its halo window HBM→VMEM; per window-row chunk
          compute the affinity block on the MXU and extract the chunk's
          top-k by k rounds of (row-max → wipe-one-occurrence) on the VPU —
          no bitonic sort; chunk top-k's land in a small candidate buffer,
  inter:  global top-k statistics (max, k-th value, softmax partition Z)
          from k extraction rounds over the candidates,
  pass 2: re-DMA each window, recompute each affinity block, and accumulate
          output += exp(aff − max)·[aff ≥ kth]/Z @ values — a dense MXU
          matmul instead of a scattered gather.

Semantics match the XLA kernels (ops/windowed_attention.py) and therefore
the reference masked_attention_efficient
(/root/reference/mmpt/models/common/local_attention.py:267), with one
documented tie caveat: keys whose affinity exactly equals the k-th value are
all selected (the duplicated-first-frame keys of early steps are still
counted exactly, because extraction wipes one occurrence at a time).

VMEM peak ≈ 12 MB at DAVIS shapes (tile 32, halo 15, T 6, C 256, Pp 128).
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
    rows_per_chunk: int,
    dtype,
):
    win = tile + 2 * halo
    wpad = _round_up(win, 8)  # HBM slice widths must align to sublane tiling
    rows_pad = _round_up(win, rows_per_chunk)
    n_chunks = rows_pad // rows_per_chunk
    S = tile * tile
    chunk = rows_per_chunk * wpad  # keys per chunk (incl. masked pad cols)
    n_cand = _round_up(T * n_chunks * topk, 128)

    def kernel(q_ref, k_hbm, v_hbm, fb_ref, out_ref, k_buf, v_buf, sem):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        r0 = ti * tile
        c0 = tj * tile

        q = q_ref[:].reshape(S, C)

        # tile-local query coordinates (S, 1) — iota must be integer on TPU
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        qi = (s_iota // tile).astype(jnp.float32)
        qj = (s_iota % tile).astype(jnp.float32)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (S, chunk), 1)

        def chunk_bias(c):
            """(S, chunk) additive mask bias for window rows of chunk c."""
            wi = (c * rows_per_chunk + col_iota // wpad).astype(jnp.float32)
            wj = (col_iota % wpad).astype(jnp.float32)
            dy = wi - halo - qi
            dx = wj - halo - qj
            if square:
                in_range = (jnp.abs(dy) <= radius) & (jnp.abs(dx) <= radius)
            else:
                in_range = dy * dy + dx * dx < radius * radius
            kgi = r0 + wi - halo
            kgj = c0 + wj - halo
            in_img = (kgi >= 0) & (kgi <= H - 1) & (kgj >= 0) & (kgj <= W - 1)
            ok = in_range & in_img & (wi < win) & (wj < win)
            return jnp.where(ok, 0.0, NEG)

        def chunk_dma(hbm, buf, slot, t, c, sem_base):
            # DMA frame t / chunk c rows into a double-buffer slot
            return pltpu.make_async_copy(
                hbm.at[
                    t,
                    pl.ds(r0 + c * rows_per_chunk, rows_per_chunk),
                    pl.ds(c0, wpad),
                    :,
                ],
                buf.at[slot],
                sem.at[sem_base + slot],
            )

        def affinity(slot, t, bias_c):
            # affinity for the already-loaded k slot; bf16 inputs hit the
            # MXU natively (~6x the f32 6-pass path), f32 accumulation
            aff = (
                jax.lax.dot_general(
                    q,
                    k_buf[slot].reshape(chunk, C),
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
            return aff + bias_c + fb_ref[0, t]

        def wipe_one(a, m, iota):
            """Set the first occurrence of the row max m to NEG."""
            pos = jnp.min(
                jnp.where(a >= m, iota, jnp.int32(2**30)),
                axis=-1,
                keepdims=True,
            )
            return jnp.where(iota == pos, NEG, a)

        # ---------------- pass 1: running sorted top-k ---------------- #
        # `run` (S, RUNW) holds the best-so-far values sorted descending in
        # the first `topk` lanes.  Each chunk's top-k is extracted by k
        # (row-max → wipe-one) rounds and merged by a vectorized
        # compare-and-shift insertion (roll + select) — no sorts, no
        # dynamic lane indexing.
        RUNW = 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, RUNW), 1)

        def insert(run, m):
            pos = jnp.sum((run > m).astype(jnp.int32), axis=-1, keepdims=True)
            shifted = pltpu.roll(run, 1, 1)
            return jnp.where(
                lane < pos, run, jnp.where(lane == pos, m, shifted)
            )

        # chunks outer / frames inner: the mask bias is frame-invariant, so
        # it is computed once per chunk and reused across all T frames.
        def p1_chunk(c, run):
            bias_c = chunk_bias(c)
            chunk_dma(k_hbm, k_buf, 0, 0, c, 0).start()

            def p1_frame(t, run):
                slot = t % 2

                @pl.when(t + 1 < T)
                def _():
                    chunk_dma(k_hbm, k_buf, (t + 1) % 2, t + 1, c, 0).start()

                chunk_dma(k_hbm, k_buf, slot, t, c, 0).wait()

                def p1_round(r, carry):
                    aff, run = carry
                    m = jnp.max(aff, axis=-1, keepdims=True)
                    return wipe_one(aff, m, col_iota), insert(run, m)

                _, run = jax.lax.fori_loop(
                    0,
                    topk,
                    p1_round,
                    (affinity(slot, t, bias_c), run),
                    unroll=True,
                )
                return run

            return jax.lax.fori_loop(0, T, p1_frame, run)

        run0 = jnp.full((S, RUNW), NEG, jnp.float32)
        run = jax.lax.fori_loop(0, n_chunks, p1_chunk, run0)

        # ---------------- global top-k stats ---------------- #
        mmax = run[:, 0:1]
        thresh = run[:, topk - 1 : topk]
        in_k = (lane < topk) & (run > NEG / 2)
        z = jnp.sum(
            jnp.where(in_k, jnp.exp(run - mmax), 0.0), axis=-1, keepdims=True
        )
        z = jnp.maximum(z, 1e-30)

        # ---------------- pass 2: value accumulation ---------------- #
        # Exact top-k tie handling: keys strictly above the k-th value get
        # their full softmax weight; keys EQUAL to the k-th value share the
        # remaining (k - n_above) slots fractionally.  With the duplicated
        # first-frame keys of early steps (identical keys AND values) this
        # reproduces the reference's pick-one-copy top-k bit-exactly.
        def p2_chunk(c, carry):
            bias_c = chunk_bias(c)
            chunk_dma(k_hbm, k_buf, 0, 0, c, 0).start()
            chunk_dma(v_hbm, v_buf, 0, 0, c, 2).start()

            def p2_frame(t, carry):
                acc, acc_at, n_above, cnt_at = carry
                slot = t % 2

                @pl.when(t + 1 < T)
                def _():
                    chunk_dma(k_hbm, k_buf, (t + 1) % 2, t + 1, c, 0).start()
                    chunk_dma(v_hbm, v_buf, (t + 1) % 2, t + 1, c, 2).start()

                chunk_dma(k_hbm, k_buf, slot, t, c, 0).wait()
                chunk_dma(v_hbm, v_buf, slot, t, c, 2).wait()
                aff = affinity(slot, t, bias_c)
                d = jnp.sign(aff - thresh)
                above = jnp.clip(d, 0.0, 1.0)               # aff > thresh
                at = (1.0 - jnp.abs(d)) * jnp.clip(         # aff == thresh,
                    jnp.sign(aff - NEG / 2) + 1.0, 0.0, 1.0  # excluding masked
                )
                e = jnp.exp(jnp.minimum(aff - mmax, 0.0))
                vc = v_buf[slot].reshape(chunk, Pp)
                acc = acc + jax.lax.dot_general(
                    e * above,
                    vc,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                acc_at = acc_at + jax.lax.dot_general(
                    at,
                    vc,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                n_above = n_above + jnp.sum(above, axis=-1, keepdims=True)
                cnt_at = cnt_at + jnp.sum(at, axis=-1, keepdims=True)
                return acc, acc_at, n_above, cnt_at

            return jax.lax.fori_loop(0, T, p2_frame, carry)

        acc, acc_at, n_above, cnt_at = jax.lax.fori_loop(
            0,
            n_chunks,
            p2_chunk,
            (
                jnp.zeros((S, Pp), jnp.float32),
                jnp.zeros((S, Pp), jnp.float32),
                jnp.zeros((S, 1), jnp.float32),
                jnp.zeros((S, 1), jnp.float32),
            ),
        )

        frac = (topk - n_above) / jnp.maximum(cnt_at, 1.0)
        e_th = jnp.exp(jnp.minimum(thresh - mmax, 0.0))
        out = (acc + e_th * frac * acc_at) / z
        out_ref[:] = out.reshape(tile, tile, Pp)

    return kernel, rows_pad, wpad, n_cand


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
    ),
)
def fused_topk_attention(
    query: jax.Array,    # (H, W, C)
    key: jax.Array,      # (T, H, W, C)
    value: jax.Array,    # (T, H, W, Cv)
    *,
    radius: float,
    temperature: float = 1.0,
    topk: int = 10,
    normalize: bool = True,
    tile: int = 32,
    mask_shape: str = "circle",
    key_valid: Optional[jax.Array] = None,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """Pallas-fused masked_topk_attention_tiled (softmax mode).

    compute_dtype 'bfloat16' computes affinities from bf16 query/key on the
    native MXU path (f32 accumulation) — ~3x faster end to end, affinity
    error ~1e-2 relative (may flip near-tied top-k members).
    """
    H, W, C = query.shape
    T = key.shape[0]
    Cv = value.shape[-1]

    halo = int(radius)
    win = tile + 2 * halo
    Hp = _round_up(H, tile)
    Wp = _round_up(W, tile)
    nth, ntw = Hp // tile, Wp // tile
    Pp = _round_up(Cv, 128)
    # (S, chunk) affinity block ≈ (tile², 16·wpad) ≈ 4 MB — several live
    # copies must fit the raised VMEM budget
    rows_per_chunk = 32

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if normalize:
        query = l2_normalize(query)
        key = l2_normalize(key)
    query = query.astype(dtype)
    key = key.astype(dtype)

    wpad_extra = _round_up(win, 8) - win
    rows_extra = _round_up(win, rows_per_chunk) - win
    qpad = jnp.pad(query, ((0, Hp - H), (0, Wp - W), (0, 0)))
    kpad = jnp.pad(
        key,
        (
            (0, 0),
            (halo, halo + Hp - H + rows_extra),
            (halo, halo + Wp - W + wpad_extra),
            (0, 0),
        ),
    )
    vpad = jnp.pad(
        value,
        (
            (0, 0),
            (halo, halo + Hp - H + rows_extra),
            (halo, halo + Wp - W + wpad_extra),
            (0, Pp - Cv),
        ),
    )

    if key_valid is not None:
        frame_bias = jnp.where(key_valid, 0.0, NEG)[None, :].astype(jnp.float32)
    else:
        frame_bias = jnp.zeros((1, T), jnp.float32)

    kernel, rows_pad, wpad, n_cand = _make_kernel(
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
        rows_per_chunk=rows_per_chunk,
        dtype=dtype,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Pp), jnp.float32),
        grid=(nth, ntw),
        in_specs=[
            pl.BlockSpec(
                (tile, tile, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, T), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile, Pp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_chunk, wpad, C), dtype),
            pltpu.VMEM((2, rows_per_chunk, wpad, Pp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qpad, kpad, vpad, frame_bias)

    return out[:H, :W, :Cv]
