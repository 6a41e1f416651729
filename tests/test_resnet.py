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
