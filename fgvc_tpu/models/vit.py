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


# --------------------------------------------------------------------- #
# DINO-faithful ViT: loads released DINO/DINOv1 checkpoints
# (the reference's VisionTransformerDinoV1 ablation encoder,
#  /root/reference/mmpt/models/backbones/vision_transformer.py)
# --------------------------------------------------------------------- #
class DinoAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        B, N, D = x.shape
        hd = D // self.heads
        qkv = nn.Dense(3 * D, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # checkpoint-parity path: pin precision (CLAUDE.md parity rule)
        a = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, precision=jax.lax.Precision.HIGHEST
        ) / jnp.sqrt(jnp.float32(hd))
        a = jax.nn.softmax(a, axis=-1)
        y = jnp.einsum(
            "bhnm,bmhd->bnhd", a, v, precision=jax.lax.Precision.HIGHEST
        ).reshape(B, N, D)
        return nn.Dense(D, name="proj")(y)


class DinoBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        x = x + DinoAttention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class DinoVisionTransformer(nn.Module):
    """DINO ViT: cls token + learned positions (bicubic-interpolated to the
    input grid, like interpolate_pos_encoding) + pre-norm blocks.

    Returns the (B, H/patch, W/patch, dim) PATCH-token feature map after the
    final LayerNorm — the dense-correspondence features the reference's
    DINO ablations use.
    """

    patch: int = 8
    dim: int = 384
    depth: int = 12
    heads: int = 6
    pos_grid: int = 28  # training-time grid edge (224/8)

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

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.dim),
        )
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        if (h, w) != (self.pos_grid, self.pos_grid):
            g = grid_pos.reshape(1, self.pos_grid, self.pos_grid, self.dim)
            g = jax.image.resize(g, (1, h, w, self.dim), method="bicubic")
            grid_pos = g.reshape(1, h * w, self.dim)
        x = x + grid_pos
        cls_tok = jnp.broadcast_to(cls + cls_pos, (B, 1, self.dim))
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(self.depth):
            x = DinoBlock(self.dim, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x[:, 1:].reshape(B, h, w, self.dim)


def dino_vit_small(patch: int = 8) -> DinoVisionTransformer:
    return DinoVisionTransformer(patch=patch, dim=384, depth=12, heads=6,
                                 pos_grid=224 // patch)


def dino_vit_base(patch: int = 8) -> DinoVisionTransformer:
    return DinoVisionTransformer(patch=patch, dim=768, depth=12, heads=12,
                                 pos_grid=224 // patch)


def convert_dino_vit_state_dict(state, prefix: str = ""):
    """Official DINO checkpoint (timm-style naming) → DinoVisionTransformer
    variables. Raises on unconverted keys (no silent partial loads)."""
    import numpy as np

    p = prefix
    state = {
        k.removeprefix("module.").removeprefix(p): np.asarray(v)
        for k, v in state.items()
        if not k.endswith("head.weight") and not k.endswith("head.bias")
    }
    params = {}
    consumed = set()

    def take(k):
        consumed.add(k)
        return state[k]

    params["cls_token"] = take("cls_token")
    params["pos_embed"] = take("pos_embed")
    params["patch_embed"] = {
        "kernel": np.transpose(take("patch_embed.proj.weight"), (2, 3, 1, 0)),
        "bias": take("patch_embed.proj.bias"),
    }
    params["norm"] = {
        "scale": take("norm.weight"),
        "bias": take("norm.bias"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in state:
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": take(f"{b}.norm1.weight"),
                      "bias": take(f"{b}.norm1.bias")},
            "norm2": {"scale": take(f"{b}.norm2.weight"),
                      "bias": take(f"{b}.norm2.bias")},
            "attn": {
                "qkv": {"kernel": take(f"{b}.attn.qkv.weight").T,
                        "bias": take(f"{b}.attn.qkv.bias")},
                "proj": {"kernel": take(f"{b}.attn.proj.weight").T,
                         "bias": take(f"{b}.attn.proj.bias")},
            },
            "mlp_fc1": {"kernel": take(f"{b}.mlp.fc1.weight").T,
                        "bias": take(f"{b}.mlp.fc1.bias")},
            "mlp_fc2": {"kernel": take(f"{b}.mlp.fc2.weight").T,
                        "bias": take(f"{b}.mlp.fc2.bias")},
        }
        i += 1

    leftover = set(state) - consumed
    if leftover:
        raise ValueError(
            f"unconverted DINO ViT keys: {sorted(leftover)[:8]}"
        )
    import jax.numpy as jnp_

    return {"params": jax.tree_util.tree_map(jnp_.asarray, params)}


class Conv2Plus1D(nn.Module):
    """(2+1)-D factorized convolution (Conv2plus1d equivalent,
    /root/reference/mmpt/models/common/conv2plus1d.py:6): a spatial k×k conv,
    BatchNorm + ReLU, then a temporal kernel-3 conv over (B, T, H, W, C)
    clips. Mid channels follow the R(2+1)D parameter-matching formula
    mid = 3·C·out·k² / (C·k² + 3·out) (temporal kernel fixed at 3)."""

    features: int
    kernel: int = 3
    stride: int = 1
    temporal_kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, H, W, C = x.shape
        k, s, kt = self.kernel, self.stride, self.temporal_kernel
        mid = (kt * k * k * C * self.features) // (
            k * k * C + kt * self.features
        )
        mid = max(mid, 1)
        y = nn.Conv(
            mid, (k, k), strides=(s, s), padding=k // 2, name="spatial"
        )(x.reshape(B * T, H, W, C))
        y = nn.BatchNorm(use_running_average=not train, name="bn_s")(y)
        y = nn.relu(y)
        Hs, Ws = y.shape[1:3]
        y = y.reshape(B, T, Hs, Ws, mid)
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(B * Hs * Ws, T, mid)
        y = nn.Conv(self.features, (kt,), padding=kt // 2, name="temporal")(y)
        y = y.reshape(B, Hs, Ws, T, self.features)
        return jnp.transpose(y, (0, 3, 1, 2, 4))
