"""DINO ViT: checkpoint conversion + feature parity vs a torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class TorchDinoBlock(nn.Module):
    """Standard timm/DINO ViT block (pre-norm, qkv packed)."""

    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, 3 * dim)
                self.proj = nn.Linear(dim, dim)

            def forward(self, x):
                B, N, D = x.shape
                hd = D // heads
                qkv = self.qkv(x).reshape(B, N, 3, heads, hd)
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                a = torch.einsum("bnhd,bmhd->bhnm", q, k) / hd**0.5
                a = a.softmax(-1)
                y = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
                return self.proj(y)

        self.attn = Attn()

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, dim * mlp_ratio)
                self.fc2 = nn.Linear(dim * mlp_ratio, dim)

            def forward(self, x):
                return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchDinoViT(nn.Module):
    def __init__(self, patch=8, dim=64, depth=2, heads=2, img=32):
        super().__init__()
        self.patch = patch
        grid = img // patch

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, dim, patch, patch)

        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchDinoBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x)  # (B, D, h, w)
        h, w = x.shape[2:]
        x = x.flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_token + self.pos_embed[:, :1]
        x = torch.cat([cls.expand(B, -1, -1), x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:].reshape(B, h, w, -1)


def test_dino_vit_checkpoint_conversion_feature_parity():
    import jax.numpy as jnp

    from fgvc_tpu.models.vit import (
        DinoVisionTransformer,
        convert_dino_vit_state_dict,
    )

    torch.manual_seed(0)
    tmodel = TorchDinoViT(patch=8, dim=64, depth=2, heads=2, img=32).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_dino_vit_state_dict(state)

    model = DinoVisionTransformer(patch=8, dim=64, depth=2, heads=2, pos_grid=4)
    x = np.random.default_rng(1).standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert out.shape == ref.shape == (1, 4, 4, 64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dino_vit_pos_embed_interpolation():
    """Non-training-size inputs interpolate the grid positions (the DINO
    interpolate_pos_encoding behavior) and still run."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.vit import DinoVisionTransformer

    model = DinoVisionTransformer(patch=8, dim=32, depth=1, heads=2, pos_grid=4)
    x = jnp.zeros((1, 48, 48, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 6, 6, 32)


def test_dino_vit_conversion_rejects_unknown_keys():
    from fgvc_tpu.models.vit import convert_dino_vit_state_dict

    state = {
        "cls_token": np.zeros((1, 1, 8), np.float32),
        "pos_embed": np.zeros((1, 17, 8), np.float32),
        "patch_embed.proj.weight": np.zeros((8, 3, 8, 8), np.float32),
        "patch_embed.proj.bias": np.zeros(8, np.float32),
        "norm.weight": np.ones(8, np.float32),
        "norm.bias": np.zeros(8, np.float32),
        "SURPRISE.weight": np.zeros(3, np.float32),
    }
    with pytest.raises(ValueError, match="unconverted"):
        convert_dino_vit_state_dict(state)
