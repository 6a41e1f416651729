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
