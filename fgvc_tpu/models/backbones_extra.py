"""Ablation-zoo backbones — flax re-designs of the reference encoders:

  * ResNet18MAST — /root/reference/mmpt/models/backbones/resnet_mast.py:42-74
    (MAST's stride-2, all-stride-1-stages 256-ch encoder)
  * SwinTransformer — swin_transformer.py (shifted-window attention,
    relative position bias, patch merging)

SEResNet and ResNetTSM are parameterizations of models/resnet.py
(`se_ratio`, `tsm_segments`).  Layout: NHWC.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MastResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="short_conv")(x)
            x = bn("short_bn")(x)
        return nn.relu(x + y)


class ResNet18MAST(nn.Module):
    """MAST encoder: 7x7/2 stem, 4 stages of 2 blocks, ALL stride 1 —
    stride-2 features at 256 channels (resnet_mast.py:42-74)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        for li, planes in enumerate((64, 128, 256, 256)):
            for b in range(2):
                x = MastResidualBlock(
                    planes, stride=1, name=f"layer{li + 1}_{b}"
                )(x, train)
        return x


# --------------------------------------------------------------------- #
# Swin Transformer
# --------------------------------------------------------------------- #
def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(w, ws: int, H: int, W: int):
    B = w.shape[0] // (H // ws * W // ws)
    x = w.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (nW, ws², C); attn_mask: (n_mask, ws², ws²) additive or None."""
        N, L, C = x.shape
        ws = self.window
        hd = C // self.heads
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(N, L, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = jnp.einsum("nlhd,nmhd->nhlm", q, k) / jnp.sqrt(jnp.float32(hd))

        # relative position bias (swin): (2ws-1)² learned entries indexed by
        # pairwise offsets
        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.heads),
        )
        coords = jnp.stack(
            jnp.meshgrid(jnp.arange(ws), jnp.arange(ws), indexing="ij"),
            axis=-1,
        ).reshape(-1, 2)
        rel = coords[:, None] - coords[None, :] + (ws - 1)  # (L, L, 2)
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        bias = table[idx]  # (L, L, heads)
        a = a + bias.transpose(2, 0, 1)[None]

        if attn_mask is not None:
            n_mask = attn_mask.shape[0]
            a = a.reshape(-1, n_mask, self.heads, L, L)
            a = a + attn_mask[None, :, None]
            a = a.reshape(N, self.heads, L, L)
        a = jax.nn.softmax(a, axis=-1)
        y = jnp.einsum("nhlm,nmhd->nlhd", a, v).reshape(N, L, C)
        return nn.Dense(C, name="proj")(y)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int = 0
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C), H/W divisible by window."""
        B, H, W, C = x.shape
        # official Swin clamps the window to the feature map and disables
        # the shift when the map is no larger than one window (the roll
        # would be a pure permutation); the relative-position table sizes
        # to the clamped window, so init and apply must see the same
        # resolution (true everywhere here — static shapes)
        ws = min(self.window, H, W)
        shift = self.shift if min(H, W) > ws else 0
        y = nn.LayerNorm(name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # additive mask preventing attention across the wrapped border
            img_mask = jnp.zeros((H, W), jnp.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for ws_ in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask = img_mask.at[hs, ws_].set(cnt)
                    cnt += 1
            mw = window_partition(img_mask[None, :, :, None], ws)[..., 0]
            attn_mask = jnp.where(
                mw[:, :, None] == mw[:, None, :], 0.0, -1e9
            )
        else:
            attn_mask = None
        w = window_partition(y, ws)
        w = WindowAttention(self.dim, self.heads, ws, name="attn")(
            w, attn_mask
        )
        y = window_reverse(w, ws, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    """Hierarchical shifted-window transformer backbone
    (swin_transformer.py; Swin-T defaults). Returns features of the stage
    selected by out_index (stride 4·2^stage)."""

    patch: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Tuple[int, ...] = (-1,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        x = nn.Conv(
            self.embed_dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), name="patch_embed",
        )(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window // 2
                x = SwinBlock(
                    dim, self.heads[si], self.window, shift,
                    name=f"stage{si}_block{bi}",
                )(x)
            outs.append(x)
            if si < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear to 2*dim
                Bh, Hh, Wh, Ch = x.shape
                x = x.reshape(Bh, Hh // 2, 2, Wh // 2, 2, Ch)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    Bh, Hh // 2, Wh // 2, 4 * Ch
                )
                x = nn.LayerNorm(name=f"merge{si}_norm")(x)
                x = nn.Dense(2 * dim, use_bias=False, name=f"merge{si}")(x)
                dim *= 2

        sel = [outs[i] for i in self.out_indices]
        return sel[0] if len(sel) == 1 else tuple(sel)


def swin_tiny(**kw) -> SwinTransformer:
    return SwinTransformer(**kw)


# --------------------------------------------------------------------- #
# P3DA ResNet (p3d_resnet.py:32-386): pseudo-3D blocks — a 1x3x3 spatial
# conv followed by a 3x1x1 temporal conv — over (B, T, H, W, C) clips.
# --------------------------------------------------------------------- #
class P3DBasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, H, W, C)."""
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)

        def s_conv(feat, stride, name):
            return nn.Conv(
                feat, (1, 3, 3), strides=(1, stride, stride),
                padding=((0, 0), (1, 1), (1, 1)), use_bias=False, name=name,
            )

        def t_conv(feat, name):
            return nn.Conv(
                feat, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                use_bias=False, name=name,
            )

        identity = x
        y = s_conv(self.planes, self.stride, "conv1")(x)
        y = t_conv(self.planes, "conv1_t")(y)
        y = nn.relu(bn("bn1")(y))
        y = s_conv(self.planes, 1, "conv2")(y)
        y = t_conv(self.planes, "conv2_t")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1, 1), strides=(1, self.stride, self.stride),
                use_bias=False, name="down_conv",
            )(x)
            identity = bn("down_bn")(identity)
        return nn.relu(y + identity)


class P3DAResNet(nn.Module):
    """P3DA_ResNet-18 (p3d_resnet.py:123-386): (2+1)-D residual encoder
    over clips; returns per-frame stride-4 features by default."""

    layers: Tuple[int, ...] = (2, 2, 2, 2)
    strides: Tuple[int, ...] = (1, 2, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, H, W, 3)."""
        x = nn.Conv(
            64, (1, 7, 7), strides=(1, 2, 2),
            padding=((0, 0), (3, 3), (3, 3)), use_bias=False, name="stem",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        planes = (64, 128, 256, 256)
        for li, (n, p, s) in enumerate(zip(self.layers, planes, self.strides)):
            for b in range(n):
                x = P3DBasicBlock(
                    p, stride=s if b == 0 else 1, name=f"layer{li + 1}_{b}"
                )(x, train)
        return x


class ResNet18Pos(nn.Module):
    """ResNet18_Pos (resnet_pos.py:51-118): stem + learnable absolute
    position embedding (bicubic-resized to the activation grid), stages
    (64, 128, 256, 256) at strides (1, 2, 1, 1)."""

    pos_grid: int = 128
    use_ape: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, ape: Optional[bool] = None):
        ape = self.use_ape if ape is None else ape
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        pos = self.param(
            "pos_embed1", nn.initializers.zeros,
            (1, self.pos_grid, self.pos_grid, 64),
        )
        if ape:
            B, H, W, _ = x.shape
            pe = jax.image.resize(pos, (1, H, W, 64), method="bicubic")
            x = x + pe
        # REFERENCE QUIRK: resnet_pos.py defines layer4 but its forward
        # returns c4 (layer3 output) with layer4 commented out — only the
        # first three stages run
        for li, (planes, stride, blocks) in enumerate(
            zip((64, 128, 256), (1, 2, 1), (2, 2, 2))
        ):
            for b in range(blocks):
                x = MastResidualBlock(
                    planes, stride=stride if b == 0 else 1,
                    name=f"layer{li + 1}_{b}",
                )(x, train)
        return x


# --------------------------------------------------------------------- #
# MViT (mviit.py:60-474): multiscale ViT with depthwise-pooled q/k/v
# attention; stages downsample q (stride_q=2) while doubling channels.
# --------------------------------------------------------------------- #
class MultiScaleAttention(nn.Module):
    dim_out: int
    heads: int
    stride_q: int = 1
    stride_kv: int = 1
    pool_kernel: int = 3
    residual_pooling: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H/stride_q, W/stride_q, dim_out)."""
        B, H, W, _ = x.shape
        hd = self.dim_out // self.heads
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(B, H, W, 3, self.heads, hd)

        def pool(z, stride, name):
            # per-head depthwise conv pool + LayerNorm (attention_pool)
            z = z.transpose(0, 3, 1, 2, 4).reshape(B * self.heads, H, W, hd)
            z = nn.Conv(
                hd, (self.pool_kernel, self.pool_kernel),
                strides=(stride, stride), padding=self.pool_kernel // 2,
                feature_group_count=hd, use_bias=False, name=f"pool_{name}",
            )(z)
            z = nn.LayerNorm(name=f"norm_{name}")(z)
            return z  # (B*heads, H', W', hd)

        q = pool(qkv[..., 0, :, :], self.stride_q, "q")
        k = pool(qkv[..., 1, :, :], self.stride_kv, "k")
        v = pool(qkv[..., 2, :, :], self.stride_kv, "v")

        Hq, Wq = q.shape[1:3]
        Hk, Wk = k.shape[1:3]
        qf = q.reshape(B * self.heads, Hq * Wq, hd)
        kf = k.reshape(B * self.heads, Hk * Wk, hd)
        vf = v.reshape(B * self.heads, Hk * Wk, hd)
        a = jnp.einsum("nld,nmd->nlm", qf, kf) / jnp.sqrt(jnp.float32(hd))
        a = jax.nn.softmax(a, axis=-1)
        y = jnp.einsum("nlm,nmd->nld", a, vf)
        if self.residual_pooling:
            y = y + qf
        y = y.reshape(B, self.heads, Hq, Wq, hd)
        y = y.transpose(0, 2, 3, 1, 4).reshape(B, Hq, Wq, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(y)


class MultiScaleBlock(nn.Module):
    dim_out: int
    heads: int
    stride_q: int = 1
    stride_kv: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        xn = nn.LayerNorm(name="norm1")(x)
        y = MultiScaleAttention(
            self.dim_out, self.heads, self.stride_q, self.stride_kv,
            name="attn",
        )(xn)
        skip = x
        if x.shape[-1] != self.dim_out:
            skip = nn.Dense(self.dim_out, name="proj")(xn)
        if self.stride_q > 1:
            k = self.stride_q + 1
            skip = nn.max_pool(
                skip, (k, k), strides=(self.stride_q,) * 2,
                padding=((k // 2, k // 2), (k // 2, k // 2)),
            )
        x = skip + y
        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(self.dim_out * self.mlp_ratio), name="fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim_out, name="fc2")(z)
        return x + z


class MViT(nn.Module):
    """Multiscale ViT backbone (mviit.py:296-474): patchify stride 4, then
    stages that double channels and halve resolution via pooled attention."""

    patch: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 2)
    heads: Tuple[int, ...] = (1, 2, 4)
    out_indices: Tuple[int, ...] = (-1,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.embed_dim, (7, 7), strides=(self.patch, self.patch),
            padding=3, name="patch_embed",
        )(x)
        outs = []
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                first = bi == 0 and si > 0
                x = MultiScaleBlock(
                    dim_out=dim * 2 if first else dim,
                    heads=self.heads[si],
                    stride_q=2 if first else 1,
                    stride_kv=2 if first else 1,
                    name=f"stage{si}_block{bi}",
                )(x)
                if first:
                    dim *= 2
            outs.append(x)
        sel = [outs[i] for i in self.out_indices]
        return sel[0] if len(sel) == 1 else tuple(sel)
