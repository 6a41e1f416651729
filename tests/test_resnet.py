"""ResNet parity: flax model + torch-checkpoint conversion vs a torch oracle.

The torch oracle below re-states the standard ResNet-18 architecture with the
reference's configuration quirks (stride overrides, optional stem pool) so we
can golden-test conv/BN semantics and the state-dict converter without mmcv.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class TorchResNet18(nn.Module):
    def __init__(self, strides=(1, 1, 1, 4), pool=False, out_index=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.pool = nn.MaxPool2d(3, 2, 1) if pool else nn.Identity()
        self.out_index = out_index
        inplanes = 64
        for i, s in enumerate(strides):
            planes = 64 * 2**i
            layer = nn.Sequential(
                TorchBasicBlock(inplanes, planes, s),
                TorchBasicBlock(planes, planes, 1),
            )
            setattr(self, f"layer{i + 1}", layer)
            inplanes = planes

    def forward(self, x):
        x = self.pool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs[self.out_index]


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.1 + 1)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def test_resnet18_d1_matches_torch_oracle(prefix="backbone."):
    import jax.numpy as jnp

    from fgvc_tpu.models.resnet import resnet18_d1
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    torch.manual_seed(0)
    tmodel = TorchResNet18(strides=(1, 1, 1, 4), pool=False, out_index=2).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)

    state = {
        prefix + k: v.detach().numpy() for k, v in tmodel.state_dict().items()
    }
    # rename downsample.{0,1} style is already torch-native; converter handles it
    variables = convert_resnet_state_dict(state, prefix=prefix)

    x = np.random.default_rng(1).standard_normal((1, 32, 32, 3)).astype(np.float32)
    model = resnet18_d1()
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    assert out.shape == ref.shape == (1, 16, 16, 256)
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)


def test_resnet18_standard_with_pool():
    import jax.numpy as jnp

    from fgvc_tpu.models.resnet import ResNet
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    torch.manual_seed(2)
    tmodel = TorchResNet18(strides=(1, 2, 2, 2), pool=True, out_index=3).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=3)
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_resnet_state_dict(state, prefix="")

    x = np.random.default_rng(4).standard_normal((1, 32, 32, 3)).astype(np.float32)
    model = ResNet(depth=18, strides=(1, 2, 2, 2), out_indices=(3,), pool_type="max")
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)


def test_init_and_batchnorm_train_mode_runs():
    import jax

    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(0), input_hw=(32, 32))
    assert "params" in variables and "batch_stats" in variables
    x = np.zeros((1, 32, 32, 3), np.float32)
    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (1, 16, 16, 256)
    assert "batch_stats" in updates


def _to_mmcv_naming(state):
    """torchvision-style keys -> mmcv ConvModule keys, the naming the released
    res18_d1_fly_ytv_mixed_training.pth uses
    (/root/reference/mmpt/models/backbones/resnet.py:454-473, blocks :54-79)."""
    import re

    out = {}
    for k, v in state.items():
        nk = k
        nk = re.sub(r"^(backbone\.)?conv1\.weight$", r"\1conv1.conv.weight", nk)
        nk = re.sub(r"^(backbone\.)?bn1\.", r"\1conv1.bn.", nk)
        nk = re.sub(
            r"(layer\d+\.\d+)\.conv(\d)\.weight$", r"\1.conv\2.conv.weight", nk
        )
        nk = re.sub(r"(layer\d+\.\d+)\.bn(\d)\.", r"\1.conv\2.bn.", nk)
        nk = re.sub(
            r"(layer\d+\.\d+)\.downsample\.0\.weight$",
            r"\1.downsample.conv.weight",
            nk,
        )
        nk = re.sub(
            r"(layer\d+\.\d+)\.downsample\.1\.", r"\1.downsample.bn.", nk
        )
        out[nk] = v
    return out


def test_resnet18_d1_mmcv_checkpoint_naming_feature_parity():
    """The released checkpoint's exact naming (mmcv ConvModule) through the
    converter must reproduce torch features to <1e-4 at 256x256."""
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.resnet import resnet18_d1
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    torch.manual_seed(5)
    tmodel = TorchResNet18(strides=(1, 1, 1, 4), pool=False, out_index=2).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=6)

    state = _to_mmcv_naming(
        {"backbone." + k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )
    assert "backbone.conv1.conv.weight" in state
    assert "backbone.layer1.0.conv1.conv.weight" in state
    assert "backbone.layer4.0.downsample.conv.weight" in state
    variables = convert_resnet_state_dict(state, prefix="backbone.")

    x = np.random.default_rng(7).standard_normal((1, 256, 256, 3)).astype(np.float32)
    model = resnet18_d1()
    out = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x)
        )
    )
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert out.shape == ref.shape == (1, 128, 128, 256)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_converter_raises_on_unknown_naming():
    """A naming mismatch must raise, not silently drop block weights."""
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    state = {
        "backbone.conv1.conv.weight": np.zeros((64, 3, 7, 7), np.float32),
        "backbone.layer1.0.conv1.WEIRD.weight": np.zeros((64, 64, 3, 3), np.float32),
    }
    with pytest.raises(ValueError, match="unconverted"):
        convert_resnet_state_dict(state)


def test_build_tracker_loads_full_mixed_checkpoint_pth(tmp_path):
    """A Mixed_Tracker-style .pth (backbone.* + teacher.* + discriminator
    keys, mmcv naming, under a 'state_dict' wrapper) loads through
    build_tracker and matches direct conversion."""
    import dataclasses

    import jax.numpy as jnp

    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker
    from fgvc_tpu.models.torch_convert import convert_resnet_state_dict

    torch.manual_seed(8)
    tmodel = TorchResNet18(strides=(1, 1, 1, 4), pool=False, out_index=2).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=9)
    sd = {"backbone." + k: v for k, v in tmodel.state_dict().items()}
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in _to_mmcv_naming(
            {k: v.detach().numpy() for k, v in sd.items()}
        ).items()
    }
    # extra submodules present in the real training checkpoint
    sd["teacher.conv1.conv.weight"] = torch.zeros(64, 3, 7, 7)
    sd["discriminator.net.0.weight"] = torch.zeros(8, 8)
    path = tmp_path / "mixed.pth"
    torch.save({"state_dict": sd, "meta": {"epoch": 30}}, str(path))

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"], input_size=(32, 32), frame_bucket=4,
        point_bucket=16, neighbor_range=6, tile=8,
    )
    tracker = build_tracker(cfg, checkpoint=str(path))

    ref_vars = convert_resnet_state_dict(
        {k: v.numpy() for k, v in sd.items() if k.startswith("backbone.")}
    )
    got = tracker.variables["params"]["conv1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(ref_vars["params"]["conv1"]["kernel"])
    )
