"""Transformer heads — flax re-designs of the reference's component zoo:

  * LinearAttention / FullAttention (LoFTR)
      /root/reference/mmpt/models/trackers/modules.py:31-100 (also
      components/transformer_modules/vanilla_transformer/linear_attention.py)
  * PositionEncodingSine  — transformer_modules/position_encoding.py:7-46
  * FeatureTransformer (LoFTR self/cross stack)
      — vanilla_transformer/transformer.py:66-130
  * SpaTempFormer (time/space attention trajectory head)
      — st_transformer/transformer.py:39-118

Layout: channels-last; feature maps are (N, H, W, C).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def elu_feature_map(x):
    return nn.elu(x) + 1.0


def linear_attention(q, k, v, q_mask=None, kv_mask=None, eps=1e-6):
    """LoFTR linear attention (modules.py:31-64). q/k/v: (N, L|S, H, D)."""
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    s = v.shape[1]
    v = v / s
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s


def full_attention(q, k, v, q_mask=None, kv_mask=None):
    """Softmax attention with 1/sqrt(D) scaling (modules.py:67-100)."""
    qk = jnp.einsum("nlhd,nshd->nlsh", q, k)
    if kv_mask is not None:
        ok = q_mask[:, :, None, None] & kv_mask[:, None, :, None]
        qk = jnp.where(ok, qk, -jnp.inf)
    a = jax.nn.softmax(qk / jnp.sqrt(jnp.float32(q.shape[-1])), axis=2)
    return jnp.einsum("nlsh,nshd->nlhd", a, v)


def position_encoding_sine(
    d_model: int, height: int, width: int, temp_bug_fix: bool = True
) -> jax.Array:
    """(H, W, d_model) LoFTR sinusoidal 2-D encoding, channels-last.

    Matches position_encoding.py:7-46 including its 1-indexed cumsum
    positions and the interleaved [sin x, cos x, sin y, cos y] channel
    groups; channels beyond d_model - d_model % 4 stay zero.
    """
    n4 = d_model // 4
    if temp_bug_fix:
        div = jnp.exp(
            jnp.arange(0, d_model // 2, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / (d_model // 2))
        )
    else:  # reference's buggy variant kept for back-compat
        div = jnp.exp(
            jnp.arange(0, d_model // 2, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / d_model // 2)
        )
    y = (jnp.arange(height, dtype=jnp.float32) + 1.0)[:, None, None]
    x = (jnp.arange(width, dtype=jnp.float32) + 1.0)[None, :, None]
    x = jnp.broadcast_to(x * div, (height, width, n4))
    y = jnp.broadcast_to(y * div, (height, width, n4))
    quad = jnp.stack(
        [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=-1
    )  # (H, W, n4, 4)
    pe = quad.reshape(height, width, n4 * 4)
    if n4 * 4 < d_model:
        pe = jnp.pad(pe, ((0, 0), (0, 0), (0, d_model - n4 * 4)))
    return pe


class TransEncoderLayer(nn.Module):
    """LoFTR encoder layer (vanilla_transformer/transformer.py:12-63)."""

    d_model: int
    nhead: int
    attention: str = "linear"

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        N = x.shape[0]
        dim = self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj")(source)
        q = q.reshape(N, -1, self.nhead, dim)
        k = k.reshape(N, -1, self.nhead, dim)
        v = v.reshape(N, -1, self.nhead, dim)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(q, k, v, x_mask, source_mask)
        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(
            msg.reshape(N, -1, self.d_model)
        )
        msg = nn.LayerNorm(name="norm1")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.d_model, use_bias=False, name="mlp1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, name="mlp2")(y)
        y = nn.LayerNorm(name="norm2")(y)
        return x + y


class FeatureTransformer(nn.Module):
    """LoFTR feature transformer over one or two feature maps
    (vanilla_transformer/transformer.py:66-130).

    feat0/feat1: (N, H, W, C); layer_names entries are 'self' or 'cross'.
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    layer_names: Tuple[str, ...] = ("self", "cross")
    pos_emb: bool = True
    temp_bug_fix: bool = True

    @nn.compact
    def __call__(self, feat0, feat1=None, mask0=None, mask1=None):
        N, H, W, C = feat0.shape
        assert C == self.d_model
        if self.pos_emb:
            pe = position_encoding_sine(C, H, W, self.temp_bug_fix)
            feat0 = feat0 + pe
            if feat1 is not None:
                feat1 = feat1 + pe
        f0 = feat0.reshape(N, H * W, C)
        f1 = feat1.reshape(N, H * W, C) if feat1 is not None else None

        layers = [
            TransEncoderLayer(
                self.d_model, self.nhead, self.attention, name=f"layer{i}"
            )
            for i in range(len(self.layer_names))
        ]
        for layer, name in zip(layers, self.layer_names):
            if name == "self":
                f0 = layer(f0, f0, mask0, mask0)
                if f1 is not None:
                    f1 = layer(f1, f1, mask1, mask1)
            elif name == "cross":
                new0 = layer(f0, f1, mask0, mask1)
                f1 = layer(f1, new0, mask1, mask0)
                f0 = new0
            else:
                raise KeyError(name)
        out0 = f0.reshape(N, H, W, C)
        if f1 is None:
            return out0
        return out0, f1.reshape(N, H, W, C)


class AttnBlock(nn.Module):
    """Pre-LN ViT block (st_transformer AttnBlock)."""

    hidden: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (N, L, C)
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.hidden * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.hidden, name="fc2")(y)
        return x + y


class SpaTempFormer(nn.Module):
    """Trajectory update transformer with interleaved time/space attention
    (st_transformer/transformer.py:39-118).

    Input (B, T, P, input_dim) -> (B, T, P, output_dim).
    """

    space_depth: int = 3
    time_depth: int = 3
    input_dim: int = 320
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, P, _ = x.shape
        x = jnp.swapaxes(x, 1, 2)  # (B, P, T, C)
        x = nn.Dense(self.hidden_size, name="input_transform")(x)

        time_blocks = [
            AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                      name=f"time{i}")
            for i in range(self.time_depth)
        ]
        space_blocks = [
            AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                      name=f"space{i}")
            for i in range(self.space_depth if self.add_space_attn else 0)
        ]
        j = 0
        for i, blk in enumerate(time_blocks):
            xt = x.reshape(B * P, T, self.hidden_size)
            x = blk(xt).reshape(B, P, T, self.hidden_size)
            if self.add_space_attn and i % (
                len(time_blocks) // max(len(space_blocks), 1)
            ) == 0 and j < len(space_blocks):
                xs = jnp.swapaxes(x, 1, 2).reshape(B * T, P, self.hidden_size)
                xs = space_blocks[j](xs)
                x = jnp.swapaxes(
                    xs.reshape(B, T, P, self.hidden_size), 1, 2
                )
                j += 1
        out = nn.Dense(self.output_dim, name="flow_head")(x)
        return jnp.swapaxes(out, 1, 2)  # (B, T, P, out)


# --------------------------------------------------------------------- #
# GMFlow feature transformer (gmflow_transformer/transformer.py:111-347)
# --------------------------------------------------------------------- #
def _split_windows(x, H, W, k):
    """(B, H*W, C) -> (B*k*k, H/k*W/k, C) non-overlapping window split."""
    B, L, C = x.shape
    wh, ww = H // k, W // k
    x = x.reshape(B, k, wh, k, ww, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * k * k, wh * ww, C)


def _merge_windows(x, H, W, k):
    B = x.shape[0] // (k * k)
    wh, ww = H // k, W // k
    x = x.reshape(B, k, k, wh, ww, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * W, -1)


def gmflow_shift_window_attn_mask(H, W, k):
    """(k², L_w, L_w) additive mask for the shifted split-window attention
    (generate_shift_window_attn_mask)."""
    wh, ww = H // k, W // k
    sh, sw = wh // 2, ww // 2
    img = jnp.zeros((H, W), jnp.int32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img = img.at[hs, ws].set(cnt)
            cnt += 1
    mw = _split_windows(img[None, :, :, None].reshape(1, H * W, 1), H, W, k)[
        ..., 0
    ]  # (k², L_w)
    return jnp.where(mw[:, :, None] == mw[:, None, :], 0.0, -100.0)


class GMTransformerLayer(nn.Module):
    """Single-head attention layer with optional split-window (swin) scheme
    and the GMFlow ffn-on-concat design (transformer.py:111-190)."""

    d_model: int
    attention_type: str = "swin"
    no_ffn: bool = False
    ffn_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, H, W, num_splits=2, attn_mask=None):
        q = nn.Dense(self.d_model, use_bias=False, name="q_proj")(source)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(target)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj")(target)
        scale = 1.0 / jnp.sqrt(jnp.float32(self.d_model))

        if self.attention_type == "swin" and num_splits > 1:
            wh, ww = H // num_splits, W // num_splits
            if self.with_shift:
                def roll2(x):
                    B = x.shape[0]
                    x = x.reshape(B, H, W, -1)
                    x = jnp.roll(x, (-(wh // 2), -(ww // 2)), axis=(1, 2))
                    return x.reshape(B, H * W, -1)

                q, k, v = roll2(q), roll2(k), roll2(v)
            qw = _split_windows(q, H, W, num_splits)
            kw = _split_windows(k, H, W, num_splits)
            vw = _split_windows(v, H, W, num_splits)
            a = jnp.einsum("nlc,nmc->nlm", qw, kw) * scale
            if self.with_shift and attn_mask is not None:
                n_m = attn_mask.shape[0]
                a = a.reshape(-1, n_m, *a.shape[1:]) + attn_mask[None]
                a = a.reshape(-1, *a.shape[2:])
            a = jax.nn.softmax(a, axis=-1)
            msg = jnp.einsum("nlm,nmc->nlc", a, vw)
            msg = _merge_windows(msg, H, W, num_splits)
            if self.with_shift:
                B = msg.shape[0]
                msg = msg.reshape(B, H, W, -1)
                msg = jnp.roll(msg, (wh // 2, ww // 2), axis=(1, 2))
                msg = msg.reshape(B, H * W, -1)
        else:
            a = jax.nn.softmax(
                jnp.einsum("blc,bmc->blm", q, k) * scale, axis=-1
            )
            msg = jnp.einsum("blm,bmc->blc", a, v)

        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1")(msg)
        if not self.no_ffn:
            y = jnp.concatenate([source, msg], axis=-1)
            y = nn.Dense(
                2 * self.d_model * self.ffn_expansion, use_bias=False,
                name="mlp1",
            )(y)
            y = nn.gelu(y)
            msg = nn.Dense(self.d_model, use_bias=False, name="mlp2")(y)
            msg = nn.LayerNorm(name="norm2")(msg)
        return source + msg


class GMFeatureTransformer(nn.Module):
    """GMFlow cross-frame feature transformer
    (gmflow_transformer/transformer.py:247-347): alternating self + cross
    attention blocks over both frames in parallel, swin split-window scheme
    with shifts on odd blocks."""

    num_layers: int = 4
    d_model: int = 256
    attention_type: str = "swin"
    ffn_expansion: int = 4
    pos_emb: bool = True

    @nn.compact
    def __call__(self, feature0, feature1, num_splits: int = 2):
        """feature0/1: (B, H, W, C) -> transformed (B, H, W, C) pair."""
        B, H, W, C = feature0.shape
        assert C == self.d_model
        if self.pos_emb:
            pe = position_encoding_sine(C, H, W)
            feature0 = feature0 + pe
            feature1 = feature1 + pe
        f0 = feature0.reshape(B, H * W, C)
        f1 = feature1.reshape(B, H * W, C)

        attn_mask = (
            gmflow_shift_window_attn_mask(H, W, num_splits)
            if self.attention_type == "swin" and num_splits > 1
            else None
        )

        # both directions batched together (reference concat trick)
        c0 = jnp.concatenate([f0, f1], axis=0)
        c1 = jnp.concatenate([f1, f0], axis=0)
        for i in range(self.num_layers):
            shift = self.attention_type == "swin" and i % 2 == 1
            c0 = GMTransformerLayer(
                self.d_model, self.attention_type, no_ffn=True,
                ffn_expansion=self.ffn_expansion, with_shift=shift,
                name=f"block{i}_self",
            )(c0, c0, H, W, num_splits, attn_mask)
            c0 = GMTransformerLayer(
                self.d_model, self.attention_type, no_ffn=False,
                ffn_expansion=self.ffn_expansion, with_shift=shift,
                name=f"block{i}_cross",
            )(c0, jnp.concatenate(jnp.split(c0, 2, axis=0)[::-1], axis=0),
              H, W, num_splits, attn_mask)
        o0, o1 = jnp.split(c0, 2, axis=0)
        return o0.reshape(B, H, W, C), o1.reshape(B, H, W, C)


# --------------------------------------------------------------------- #
# Swin3D (swin3d_transformer/swin3d.py:88-500): 3-D shifted-window
# attention over (T, H, W) video feature volumes with a separate VALUE
# stream (the reference attends features but propagates value_dim maps).
# --------------------------------------------------------------------- #
def _window_partition_3d(x, ws):
    """(B, T, H, W, C) -> (B·nW, wt·wh·ww, C)."""
    B, T, H, W, C = x.shape
    wt, wh, ww = ws
    x = x.reshape(B, T // wt, wt, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wt * wh * ww, C)


def _window_reverse_3d(w, ws, B, T, H, W):
    wt, wh, ww = ws
    x = w.reshape(B, T // wt, H // wh, W // ww, wt, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, T, H, W, -1)


class WindowAttention3D(nn.Module):
    """3-D windowed attention with relative position bias over (t, h, w)
    offsets; queries/keys from the feature stream, values from a separate
    value stream (swin3d.py:88-188)."""

    dim: int
    value_dim: int
    heads: int
    window: Tuple[int, int, int]
    no_rel_pos: bool = False

    @nn.compact
    def __call__(self, x, v, mask=None):
        N, L, C = x.shape
        wt, wh, ww = self.window
        hd = C // self.heads
        q = nn.Dense(C, name="q")(x).reshape(N, L, self.heads, hd)
        k = nn.Dense(C, name="k")(x).reshape(N, L, self.heads, hd)
        a = jnp.einsum("nlhd,nmhd->nhlm", q, k) / jnp.sqrt(jnp.float32(hd))

        if not self.no_rel_pos:
            table = self.param(
                "rel_pos_bias",
                nn.initializers.normal(0.02),
                ((2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1), self.heads),
            )
            g = jnp.stack(
                jnp.meshgrid(
                    jnp.arange(wt), jnp.arange(wh), jnp.arange(ww),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(-1, 3)
            rel = g[:, None] - g[None, :]
            rel = rel + jnp.array([wt - 1, wh - 1, ww - 1])
            idx = (
                rel[..., 0] * (2 * wh - 1) * (2 * ww - 1)
                + rel[..., 1] * (2 * ww - 1)
                + rel[..., 2]
            )
            a = a + table[idx].transpose(2, 0, 1)[None]

        if mask is not None:
            nm = mask.shape[0]
            a = a.reshape(-1, nm, self.heads, L, L) + mask[None, :, None]
            a = a.reshape(N, self.heads, L, L)
        a = jax.nn.softmax(a, axis=-1)
        # value stream: per-head split of value_dim channels
        vh = self.value_dim // self.heads
        vv = v.reshape(N, L, self.heads, vh)
        y = jnp.einsum("nhlm,nmhd->nlhd", a, vv).reshape(N, L, self.value_dim)
        return y


class Swin3D(nn.Module):
    """Swin3D propagation head: alternating plain/shifted 3-D window
    attention blocks updating a value stream from video features
    (swin3d.py:190-500)."""

    embed_dim: int = 256
    value_dim: int = 512
    depth: int = 2
    heads: int = 1
    t_window: int = 2
    s_window: int = 7
    mlp_ratio: float = 4.0
    no_rel_pos: bool = False

    @nn.compact
    def __call__(self, x, v):
        """x: (B, T, H, W, embed_dim) features; v: (B, T, H, W, value_dim)."""
        B, T, H, W, C = x.shape
        wt = min(self.t_window, T)
        wh = min(self.s_window, H)
        ww = min(self.s_window, W)
        ws = (wt, wh, ww)
        # pad to window multiples
        pt = (-T) % wt
        ph = (-H) % wh
        pw = (-W) % ww
        xp = jnp.pad(x, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
        Tp, Hp, Wp = T + pt, H + ph, W + pw

        # shifted-window mask over the 3-D volume
        st, sh, sw = wt // 2, wh // 2, ww // 2
        img = jnp.zeros((Tp, Hp, Wp), jnp.int32)
        cnt = 0
        for ts in ((slice(0, -wt), slice(-wt, -st), slice(-st, None))
                   if st > 0 else (slice(None),)):
            for hs in ((slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
                       if sh > 0 else (slice(None),)):
                for wss in ((slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
                            if sw > 0 else (slice(None),)):
                    img = img.at[ts, hs, wss].set(cnt)
                    cnt += 1
        mw = _window_partition_3d(img[None, ..., None], ws)[..., 0]
        shift_mask = jnp.where(mw[:, :, None] == mw[:, None, :], 0.0, -100.0)

        for bi in range(self.depth):
            shifted = bi % 2 == 1 and (st or sh or sw)
            xs = nn.LayerNorm(name=f"norm{bi}")(xp)
            if shifted:
                xs = jnp.roll(xs, (-st, -sh, -sw), axis=(1, 2, 3))
                vs = jnp.roll(vp, (-st, -sh, -sw), axis=(1, 2, 3))
            else:
                vs = vp
            xw = _window_partition_3d(xs, ws)
            vw = _window_partition_3d(vs, ws)
            y = WindowAttention3D(
                self.embed_dim, self.value_dim, self.heads, ws,
                self.no_rel_pos, name=f"attn{bi}",
            )(xw, vw, shift_mask if shifted else None)
            y = _window_reverse_3d(y, ws, B, Tp, Hp, Wp)
            if shifted:
                y = jnp.roll(y, (st, sh, sw), axis=(1, 2, 3))
            vp = vp + nn.Dense(self.value_dim, name=f"proj{bi}")(y)
            # mlp on the value stream
            z = nn.LayerNorm(name=f"mlp_norm{bi}")(vp)
            z = nn.Dense(int(self.value_dim * self.mlp_ratio),
                         name=f"mlp{bi}_fc1")(z)
            z = nn.gelu(z)
            vp = vp + nn.Dense(self.value_dim, name=f"mlp{bi}_fc2")(z)
        return vp[:, :T, :H, :W]
