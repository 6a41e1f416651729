"""Vision Transformer backbone — the ablation-zoo encoder family.

Compact flax ViT covering the roles of the reference's
VisionTransformer/DINO variants (/root/reference/mmpt/models/backbones/
vision_transformer.py, __init__.py:1-14): patchify → transformer blocks →
spatial feature map (the class token is dropped for dense correspondence).

Returns (B, H/patch, W/patch, dim) features, drop-in for the tracker's
backbone apply signature.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fgvc_tpu.ops.misc import sincos_embedding_2d


class MlpBlock(nn.Module):
    dim: int
    hidden_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.hidden_ratio, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(self.dim, name="fc2")(h)


class TransformerBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(name="ln2")(x)
        return x + MlpBlock(self.dim, name="mlp")(y)


class VisionTransformer(nn.Module):
    """Dense-feature ViT: patch embed + sincos positions + N blocks."""

    patch: int = 8
    dim: int = 256
    depth: int = 6
    heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        h, w = H // self.patch, W // self.patch
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            name="patch_embed",
        )(x)
        x = x.reshape(B, h * w, self.dim)
        pos = sincos_embedding_2d(self.dim, h, w).reshape(1, h * w, self.dim)
        x = x + pos
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(name="ln")(x)
        return x.reshape(B, h, w, self.dim)


def vit_small_d8() -> VisionTransformer:
    """Stride-8 ViT comparable to the reference's DINO-S/8 ablations."""
    return VisionTransformer(patch=8, dim=384, depth=12, heads=6)


class Conv2Plus1D(nn.Module):
    """(2+1)-D factorized convolution (Conv2plus1d equivalent,
    /root/reference/mmpt/models/common/conv2plus1d.py:6): a spatial k×k conv
    followed by a temporal k conv over (B, T, H, W, C) clips."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        k, s = self.kernel, self.stride
        mid = (T * k * k * C * self.features) // (
            k * k * C + k * self.features
        )
        mid = max(mid, 1)
        y = nn.Conv(
            mid, (k, k), strides=(s, s), padding=k // 2, name="spatial"
        )(x.reshape(B * T, H, W, C))
        Hs, Ws = y.shape[1:3]
        y = y.reshape(B, T, Hs, Ws, mid)
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(B * Hs * Ws, T, mid)
        y = nn.Conv(self.features, (k,), padding=k // 2, name="temporal")(y)
        y = y.reshape(B, Hs, Ws, T, self.features)
        return jnp.transpose(y, (0, 3, 1, 2, 4))
