"""Trajectory pyramid decoders + MLP-Mixer heads — flax re-designs of the
reference's PIPs-style components:

  * CorrelationPyramid (per-point)   — traj_decoder.py:25-75
  * MLP_Mixer / MLP_Mixer_PIPS /
    Depthwise_Conv_Mixer_PIPS heads  — mlp_mixer.py:30-227
  * TRAJ_PyramidDecoder / V2 / V3    — traj_decoder.py:79-528

Layout: feats are (B, T, H, W, C) channels-last; coords are (B, T, P, 2)
(x, y) in FEATURE pixels; trajectory predictions are returned in input
pixels (× stride), one per refinement iteration, like the reference.
The per-iteration python loop is unrolled under jit (iters is static and
small, 4-6 — the reference uses the same fixed count).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fgvc_tpu.ops.misc import (
    get_2d_embedding,
    get_3d_embedding,
    sincos_embedding_1d,
    sincos_embedding_2d,
)
from fgvc_tpu.ops.warp import bilinear_sample


# --------------------------------------------------------------------- #
# per-point correlation pyramid + window lookup
# --------------------------------------------------------------------- #
def correlation_pyramid_per_point(
    query_feat: jax.Array,   # (B, T, P, C)
    feats: jax.Array,        # (B, T, H, W, C)
    num_levels: int = 4,
    normalize: bool = False,
    scaling: bool = True,
    temperature: float = 1.0,
):
    """Per-point correlation maps, avg-pooled into a pyramid
    (traj_decoder.py:42-75). Returns list of (B, T, P, H/2^l, W/2^l)."""
    if normalize:
        query_feat = query_feat / jnp.maximum(
            jnp.linalg.norm(query_feat, axis=-1, keepdims=True), 1e-12
        )
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )
    corr = jnp.einsum(
        "btpc,bthwc->btphw", query_feat, feats,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / temperature
    if scaling:
        corr = corr / jnp.sqrt(jnp.float32(query_feat.shape[-1]))

    pyr = [corr]
    for _ in range(num_levels - 1):
        c = pyr[-1]
        h2, w2 = c.shape[-2] // 2, c.shape[-1] // 2
        if h2 < 1 or w2 < 1:
            pyr.append(c)
            continue
        pooled = jax.lax.reduce_window(
            c, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 1, 2, 2),
            window_strides=(1, 1, 1, 2, 2),
            padding="VALID",
        ) * 0.25
        pyr.append(pooled)
    return pyr


def lookup_pyramid_per_point(
    pyramid: Sequence[jax.Array],  # each (B, T, P, h_l, w_l)
    coords: jax.Array,             # (B, T, P, 2) (x, y) in level-0 pixels
    radius: int,
) -> jax.Array:
    """Bilinear (2r+1)² window sample at coords/2^l per level
    (the CorrLookup operator, corr_lookup.py:70). Returns
    (B, T, P, levels·(2r+1)²)."""
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # reference quirk (corr_lookup.py:52/191): delta = stack(meshgrid(dy,dx))
    # is ADDED to (x, y) coords, so flat window index k = i*(2r+1)+j samples
    # (x + d[i], y + d[j]) — the x offset varies along the SLOW axis
    dslow, dfast = jnp.meshgrid(d, d, indexing="ij")
    offsets = jnp.stack([dslow, dfast], axis=-1).reshape(-1, 2)  # (R2, 2) (x, y)

    outs = []
    for lvl, corr in enumerate(pyramid):
        B, T, P, h, w = corr.shape
        c = coords / (2.0**lvl)
        pts = c[..., None, :] + offsets  # (B, T, P, R2, 2)

        flat_maps = corr.reshape(B * T * P, h, w, 1)
        flat_pts = pts.reshape(B * T * P, -1, 2)
        vals = jax.vmap(lambda m, p: bilinear_sample(m, p)[..., 0])(
            flat_maps, flat_pts
        )
        outs.append(vals.reshape(B, T, P, -1))
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------- #
# mixer heads (mlp_mixer.py)
# --------------------------------------------------------------------- #
class _PreNormFF(nn.Module):
    """LayerNorm -> FeedForward -> residual over the given axis."""

    expansion: int = 4
    token_mixing: bool = False  # mix over the T (token) axis instead

    @nn.compact
    def __call__(self, x):  # (N, T, D)
        y = nn.LayerNorm()(x)
        if self.token_mixing:
            y = jnp.swapaxes(y, -1, -2)  # (N, D, T)
        dim = y.shape[-1]
        y = nn.Dense(dim * self.expansion)(y)
        y = nn.gelu(y)
        y = nn.Dense(dim)(y)
        if self.token_mixing:
            y = jnp.swapaxes(y, -1, -2)
        return x + y


class MLPMixer(nn.Module):
    """MLP_Mixer head (mlp_mixer.py:30-72): (B, T, P, Cin) -> (B, T, P, 2)."""

    input_dim: int
    dim: int
    depth: int
    T: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        B, T, P, _ = x.shape
        x = jnp.swapaxes(x, 1, 2).reshape(B * P, T, -1)
        x = nn.Dense(self.dim, name="pre")(x)
        for i in range(self.depth):
            x = _PreNormFF(self.expansion, token_mixing=True, name=f"tok{i}")(x)
            x = _PreNormFF(self.expansion, token_mixing=False, name=f"ch{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        x = x.mean(axis=1)  # (B·P, dim)
        x = nn.Dense(self.T * 2, name="post")(x)
        return jnp.swapaxes(x.reshape(B, P, T, 2), 1, 2)


class MLPMixerPIPS(nn.Module):
    """MLP_Mixer_PIPS head (mlp_mixer.py:76-134): optionally predicts
    per-frame feature updates alongside the coordinate deltas."""

    input_dim: int     # C of query features (also the update width)
    dim: int
    depth: int
    T: int
    expansion: int = 4
    update_feat: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, P, kitchen_dim)
        B, T, P, _ = x.shape
        out_ch = self.input_dim + 2 if self.update_feat else 2
        x = jnp.swapaxes(x, 1, 2).reshape(B * P, T, -1)
        x = nn.Dense(self.dim, name="pre")(x)
        for i in range(self.depth):
            x = _PreNormFF(self.expansion, token_mixing=True, name=f"tok{i}")(x)
            x = _PreNormFF(self.expansion, token_mixing=False, name=f"ch{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        x = x.mean(axis=1)
        x = nn.Dense(self.T * out_ch, name="post")(x)
        return jnp.swapaxes(x.reshape(B, P, T, out_ch), 1, 2)


class DepthwiseConvMixerPIPS(nn.Module):
    """Depthwise_Conv_Mixer_PIPS head (mlp_mixer.py:168-227): temporal
    depthwise conv token mixing; per-token output (no mean-reduce)."""

    input_dim: int
    dim: int
    depth: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):  # (B, T, P, kitchen_dim)
        B, T, P, _ = x.shape
        x = jnp.swapaxes(x, 1, 2).reshape(B * P, T, -1)
        x = nn.Dense(self.dim, name="pre")(x)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"dw{i}_norm")(x)
            y = nn.Conv(
                self.dim * self.expansion, (3,), padding=1,
                feature_group_count=self.dim, name=f"dw{i}_depth",
            )(y)
            y = nn.gelu(y)
            # grouped 1x1 projection summed over the expansion factor
            y = y.reshape(B * P, T, self.dim, self.expansion)
            w = self.param(
                f"dw{i}_proj", nn.initializers.lecun_normal(),
                (self.dim, self.expansion),
            )
            y = jnp.einsum("ntce,ce->ntc", y, w)
            x = x + y
            x = _PreNormFF(self.expansion, token_mixing=False, name=f"ch{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        x = nn.Dense(self.input_dim + 2, name="post")(x)
        return jnp.swapaxes(x.reshape(B, P, T, -1), 1, 2)


# --------------------------------------------------------------------- #
# decoders
# --------------------------------------------------------------------- #
class TrajPyramidDecoder(nn.Module):
    """TRAJ_PyramidDecoder (traj_decoder.py:79-227): iterative per-point
    trajectory refinement over a correlation pyramid with a mixer head."""

    traj_pred: nn.Module
    radius: int = 3
    iters: int = 6
    input_dim: int = 128
    time_dim: int = 64
    stride: int = 8
    use_update_feat: bool = True
    corr_levels: int = 4
    corr_norm: bool = False
    corr_scaling: bool = True
    corr_temp: float = 1.0

    @nn.compact
    def __call__(self, feats, coords, query_feat):
        B, T, P, _ = coords.shape
        query_feat_init = query_feat

        # submodules are created ONCE and shared across iterations
        # (the reference's ffeat_updater is likewise shared)
        ffeat_norm = nn.GroupNorm(num_groups=1, name="ffeat_norm")
        ffeat_dense = nn.Dense(self.input_dim, name="ffeat_dense")

        # reference quirk: linspace(0, T, T) INCLUDES the endpoint T
        times = jnp.linspace(0.0, T, T).reshape(1, T, 1, 1)
        times = jnp.broadcast_to(times, (B, T, P, 1))

        preds = []
        for _ in range(self.iters):
            coords = jax.lax.stop_gradient(coords)
            pyr = correlation_pyramid_per_point(
                query_feat, feats, self.corr_levels,
                self.corr_norm, self.corr_scaling, self.corr_temp,
            )
            cur_corrs = lookup_pyramid_per_point(pyr, coords, self.radius)

            rel = coords - coords[:, 0:1]
            t3 = jnp.concatenate([rel, times], axis=-1)  # (B, T, P, 3)
            time_emb = get_3d_embedding(t3, self.time_dim, cat_coords=True)

            x = jnp.concatenate([cur_corrs, time_emb, query_feat], axis=-1)
            delta = self.traj_pred(x)
            if self.use_update_feat:
                assert delta.shape[-1] == self.input_dim + 2, (
                    "use_update_feat=True needs a head emitting "
                    f"input_dim+2={self.input_dim + 2} channels, got "
                    f"{delta.shape[-1]} (set update_feat on the head)"
                )
                # per-point statistics: the reference GroupNorm(1, C) runs on
                # the flattened (B*T*P, C) tensor (traj_decoder.py:141-146)
                df = delta[..., :-2].reshape(-1, self.input_dim)
                df = nn.gelu(ffeat_dense(ffeat_norm(df)))
                query_feat = query_feat + df.reshape(query_feat.shape)
            coords = coords + delta[..., -2:]
            preds.append(coords * self.stride)
        return preds, query_feat_init, query_feat


class TrajPyramidDecoderV2(nn.Module):
    """TRAJ_PyramidDecoderV2 (traj_decoder.py:229-366): adds 2-D flow
    embeddings, visibility/track-mask channels, and shared pos/time
    sincos embeddings of width embed_dim (456 in the reference)."""

    traj_pred: nn.Module
    radius: int = 3
    iters: int = 6
    input_dim: int = 128
    stride: int = 8
    embed_dim: int = 456
    use_update_feat: bool = True
    corr_levels: int = 4

    @nn.compact
    def __call__(self, feats, coords, query_feat, vis_init, track_mask):
        B, T, P, _ = coords.shape
        H, W = feats.shape[2], feats.shape[3]
        query_feat_init = query_feat
        ffeat_norm = nn.GroupNorm(num_groups=1, name="ffeat_norm")
        ffeat_dense = nn.Dense(self.input_dim, name="ffeat_dense")

        # shared positional embedding sampled at the INITIAL coords
        # (sampling.py sample_pos_embed) + 1-D time embedding
        grid_pe = sincos_embedding_2d(self.embed_dim, H, W)  # (H, W, E)
        pe0 = jax.vmap(lambda c: bilinear_sample(grid_pe, c))(
            coords[:, 0]
        )  # (B, P, E)
        pos_embed = pe0[:, None]  # (B, 1, P, E)
        times = jnp.arange(T, dtype=jnp.float32)
        time_embed = sincos_embedding_1d(self.embed_dim, times)[
            None, :, None, :
        ]  # (1, T, 1, E)

        concat = jnp.concatenate([track_mask, vis_init], axis=-1)  # (B,T,P,2)

        preds = []
        for _ in range(self.iters):
            coords = jax.lax.stop_gradient(coords)
            pyr = correlation_pyramid_per_point(
                query_feat, feats, self.corr_levels
            )
            cur_corrs = lookup_pyramid_per_point(pyr, coords, self.radius)

            rel = coords - coords[:, 0:1]
            flows_cat = get_2d_embedding(rel, 64, cat_coords=True)

            x = jnp.concatenate(
                [flows_cat, cur_corrs, query_feat, concat], axis=-1
            )
            x = x + pos_embed + time_embed
            delta = self.traj_pred(x)
            if self.use_update_feat:
                assert delta.shape[-1] == self.input_dim + 2
                df = delta[..., :-2].reshape(-1, self.input_dim)
                df = nn.gelu(ffeat_dense(ffeat_norm(df)))
                query_feat = query_feat + df.reshape(query_feat.shape)
            coords = coords + delta[..., -2:]
            preds.append(coords * self.stride)
        return preds, query_feat_init, query_feat


class TrajPyramidDecoderV3(nn.Module):
    """TRAJ_PyramidDecoderV3 (traj_decoder.py:369-528): a second half-res
    correlation pyramid from a coarser feature level, optional learned
    corr / context projections."""

    traj_pred: nn.Module
    radius: int = 3
    iters: int = 6
    input_dim: int = 128
    time_dim: int = 64
    stride: int = 8
    use_update_feat: bool = True
    use_corr_pre: bool = True
    use_corr_layer: bool = False
    context_hid_dim: Optional[int] = None  # enables the context MLP
    corr_levels: int = 4

    @nn.compact
    def __call__(self, feats, coords, query_feat, feats_pre, query_feat_pre):
        B, T, P, _ = coords.shape
        query_feat_init = query_feat

        # shared submodules (created once, reused across iterations)
        ffeat_norm = nn.GroupNorm(num_groups=1, name="ffeat_norm")
        ffeat_dense = nn.Dense(self.input_dim, name="ffeat_dense")
        cdim = (self.radius * 2 + 1) ** 2 * self.corr_levels
        if self.use_corr_layer:
            corr_mlps = {
                name: (
                    nn.Dense(2 * cdim, name=f"{name}_fc1"),
                    nn.Dense(2 * cdim, name=f"{name}_fc2"),
                )
                for name in ("corr_layer", "corr_layer_pre")
            }
        if self.context_hid_dim is not None:
            ctx_fc1 = nn.Dense(self.context_hid_dim, name="ctx_fc1")
            ctx_fc2 = nn.Dense(self.context_hid_dim, name="ctx_fc2")
            ctx_fc3 = nn.Dense(self.input_dim, name="ctx_fc3")

        def corr_mlp(x, name):
            fc1, fc2 = corr_mlps[name]
            return fc2(nn.gelu(fc1(x)))

        times = jnp.linspace(0.0, T, T).reshape(1, T, 1, 1)
        times = jnp.broadcast_to(times, (B, T, P, 1))

        if self.use_corr_pre:
            pyr_pre = correlation_pyramid_per_point(
                query_feat_pre, feats_pre, self.corr_levels
            )

        preds = []
        for _ in range(self.iters):
            coords = jax.lax.stop_gradient(coords)
            pyr = correlation_pyramid_per_point(
                query_feat, feats, self.corr_levels
            )
            cur = lookup_pyramid_per_point(pyr, coords, self.radius)
            if self.use_corr_layer:
                cur = corr_mlp(cur, "corr_layer")
            if self.use_corr_pre:
                cur_pre = lookup_pyramid_per_point(
                    pyr_pre, coords / 2.0, self.radius
                )
                if self.use_corr_layer:
                    cur_pre = corr_mlp(cur_pre, "corr_layer_pre")
                corr_input = jnp.concatenate([cur, cur_pre], axis=-1)
            else:
                corr_input = cur

            rel = coords - coords[:, 0:1]
            t3 = jnp.concatenate([rel, times], axis=-1)
            time_emb = get_3d_embedding(t3, self.time_dim, cat_coords=False)

            if self.context_hid_dim is not None:
                ctx = jnp.concatenate([query_feat, query_feat_pre], axis=-1)
                feat_input = ctx_fc3(nn.gelu(ctx_fc2(nn.gelu(ctx_fc1(ctx)))))
            else:
                feat_input = query_feat

            x = jnp.concatenate([corr_input, feat_input, time_emb], axis=-1)
            delta = self.traj_pred(x)
            if self.use_update_feat:
                assert delta.shape[-1] == self.input_dim + 2
                df = delta[..., :-2].reshape(-1, self.input_dim)
                df = nn.gelu(ffeat_dense(ffeat_norm(df)))
                query_feat = query_feat + df.reshape(query_feat.shape)
            coords = coords + delta[..., -2:]
            preds.append(coords * self.stride)
        return preds, query_feat_init, query_feat
