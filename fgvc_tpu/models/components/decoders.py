"""Correlation-volume decoders — flax re-designs of the reference components:

  * MotionDecoderPlain / MotionDecoderSkipLayer
      — /root/reference/mmpt/models/components/decoder/motion_decoder.py:16-228
  * CorrResDecoder (residual upsample blocks)
      — decoder/res_decoder.py:232-280
  * CorrTransDecoder (transformer upsample blocks)
      — decoder/transformer_decoder.py:11-67

All operate on correlation volumes laid out channels-last (N, H, W, C) and
use align_corners=True bilinear upsampling like the reference
(ops/misc.bilinear_resize_align_corners).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fgvc_tpu.ops.misc import bilinear_resize_align_corners


def _conv_bn_relu(x, ch, name, train):
    x = nn.Conv(ch, (3, 3), padding=1, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn")(x)
    return nn.relu(x)


class MotionDecoderPlain(nn.Module):
    """Multi-scale conv decoder over a correlation volume
    (motion_decoder.py:16-104): parallel branches at pool strides `combo`,
    each two conv-BN-relu stages, upsampled back and fused by a 1x1 head."""

    output_dim: int = 2
    combo: Tuple[int, ...] = (1, 2, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, _ = x.shape
        feats = []
        for c in self.combo:
            assert c in (1, 2, 4, 8), f"invalid combo {self.combo}"
            y = x
            if c > 1:
                y = nn.max_pool(y, (c, c), strides=(c, c))
            y = _conv_bn_relu(y, 128, f"dec{c}_0", train)
            y = _conv_bn_relu(y, 128, f"dec{c}_1", train)
            if c > 1:
                y = bilinear_resize_align_corners(y, (H, W))
            feats.append(y)
        cat = jnp.concatenate(feats, axis=-1)
        return nn.Conv(self.output_dim, (1, 1), name="head")(cat)


class MotionDecoderSkipLayer(nn.Module):
    """U-Net-style decoder with skip connections from encoder levels
    (motion_decoder.py:107-228): bottom-up pooled branches, then top-down
    fusion with skip features at 1/2, 1/4, 1/8 resolutions."""

    output_dim: int = 2
    skip_dims: Tuple[int, int, int] = (64, 128, 256)  # C at /2, /4, /8

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        """x: (N, H, W, C) correlation volume at full decoder res;
        skips: dict with keys '2', '4', '8' — encoder features at those
        strides (channels skip_dims)."""
        N, H, W, _ = x.shape
        # each pooled branch fuses the SAME-resolution encoder skip, then
        # the top-down path upsamples and fuses level by level
        y8 = nn.max_pool(x, (8, 8), strides=(8, 8))
        y8 = _conv_bn_relu(y8, 256, "d8_0", train)
        y8 = _conv_bn_relu(
            jnp.concatenate([y8, skips["8"]], axis=-1), 256, "f8", train
        )

        y4 = nn.max_pool(x, (4, 4), strides=(4, 4))
        y4 = _conv_bn_relu(y4, 128, "d4_0", train)
        up8 = bilinear_resize_align_corners(y8, y4.shape[1:3])
        y4 = _conv_bn_relu(
            jnp.concatenate([y4, up8, skips["4"]], axis=-1), 128, "f4", train
        )

        y2 = nn.max_pool(x, (2, 2), strides=(2, 2))
        y2 = _conv_bn_relu(y2, 64, "d2_0", train)
        up4 = bilinear_resize_align_corners(y4, y2.shape[1:3])
        y2 = _conv_bn_relu(
            jnp.concatenate([y2, up4, skips["2"]], axis=-1), 64, "f2", train
        )

        y1 = _conv_bn_relu(x, 64, "d1_0", train)
        up2 = bilinear_resize_align_corners(y2, (H, W))
        y1 = _conv_bn_relu(
            jnp.concatenate([y1, up2], axis=-1), 64, "f1", train
        )
        return nn.Conv(self.output_dim, (1, 1), name="head")(y1)


class _ResUpsampleBlock(nn.Module):
    """Bottleneck residual conv + bilinear resize (res_decoder.py:232-254)."""

    channels: int
    size: Tuple[int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c4 = max(self.channels // 4, 1)
        y = nn.Conv(c4, (1, 1), name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(y))
        y = nn.Conv(c4, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn2")(y))
        y = nn.Conv(self.channels, (1, 1), name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3")(y)
        y = nn.relu(x + y)
        return bilinear_resize_align_corners(y, self.size)


class CorrResDecoder(nn.Module):
    """Correlation-volume upsampler (res_decoder.py:258-280): residual
    blocks + bilinear resizes; halfway through, the volume is transposed
    from (query², r, r) to (r², H, W) — decode the key side next."""

    channels: Tuple[int, ...] = (1024, 2401)
    sizes: Tuple[Tuple[int, int], ...] = ((49, 49), (128, 128))

    @nn.compact
    def __call__(self, x, shape: Tuple[int, int], train: bool = False):
        """x: (N, R, R, C) with C = flattened query grid; shape: (H, W) of
        the query grid for the halfway transpose."""
        n = len(self.channels)
        for i in range(n):
            if i == n // 2:
                N, R1, R2, C = x.shape
                # (N, R, R, HW) -> (N, H, W, R²)
                x = x.reshape(N, R1 * R2, *shape).transpose(0, 2, 3, 1)
            x = _ResUpsampleBlock(
                self.channels[i], tuple(self.sizes[i]), name=f"block{i}"
            )(x, train)
        return x


class CorrTransDecoder(nn.Module):
    """Transformer-based correlation upsampler
    (transformer_decoder.py:11-67): per block, a LoFTR FeatureTransformer
    over the volume followed by a bilinear resize; same halfway transpose."""

    d_models: Tuple[int, ...] = (1024, 2401)
    n_heads: Tuple[int, ...] = (8, 7)
    sizes: Tuple[Tuple[int, int], ...] = ((49, 49), (128, 128))
    attention: str = "linear"
    layer_names: Tuple[Tuple[str, ...], ...] = (("self",), ("self",))
    pos_emb: bool = True

    @nn.compact
    def __call__(self, x, shape: Tuple[int, int]):
        from fgvc_tpu.models.components.transformers import FeatureTransformer

        n = len(self.d_models)
        for i in range(n):
            if i == n // 2 and n > 1:
                N, R1, R2, C = x.shape
                x = x.reshape(N, R1 * R2, *shape).transpose(0, 2, 3, 1)
            x = FeatureTransformer(
                d_model=self.d_models[i],
                nhead=self.n_heads[i],
                attention=self.attention,
                layer_names=tuple(self.layer_names[i]),
                pos_emb=self.pos_emb,
                name=f"block{i}",
            )(x)
            x = bilinear_resize_align_corners(x, tuple(self.sizes[i]))
        return x
