"""flax -> torch checkpoint export: the reverse converter round-trips."""

import numpy as np
import pytest


def test_export_roundtrips_through_the_importer():
    import jax

    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.torch_convert import (
        convert_resnet_state_dict,
        export_resnet_state_dict,
    )

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(7), (32, 32))
    state = export_resnet_state_dict(variables)
    # the reference's released naming (mmcv ConvModule with backbone. prefix)
    assert "backbone.conv1.conv.weight" in state
    assert "backbone.layer1.0.conv1.bn.running_mean" in state
    back = convert_resnet_state_dict(state)

    flat = jax.tree_util.tree_leaves_with_path
    orig_p = dict(jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    back_p = dict(jax.tree_util.tree_flatten_with_path(back["params"])[0])
    assert orig_p.keys() == back_p.keys()
    for k in orig_p:
        np.testing.assert_array_equal(np.asarray(back_p[k]), np.asarray(orig_p[k]))
    orig_s = dict(jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0])
    back_s = dict(jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0])
    assert orig_s.keys() == back_s.keys()
    for k in orig_s:
        np.testing.assert_array_equal(np.asarray(back_s[k]), np.asarray(orig_s[k]))


def test_exported_state_loads_into_torch_and_reproduces_features():
    """The exported mmcv-named dict loads into the torch oracle ResNet
    (strict, all keys) and reproduces the flax features."""
    torch = pytest.importorskip("torch")
    import re

    import jax

    from test_resnet import TorchResNet18

    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.torch_convert import export_resnet_state_dict

    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(8), (32, 32))
    state = export_resnet_state_dict(variables, prefix="")

    def from_mmcv(k):
        # inverse of tests/test_resnet._to_mmcv_naming
        k = re.sub(r"^conv1\.conv\.weight$", "conv1.weight", k)
        k = re.sub(r"^conv1\.bn\.", "bn1.", k)
        k = re.sub(r"(layer\d+\.\d+)\.conv(\d)\.conv\.weight$",
                   r"\1.conv\2.weight", k)
        k = re.sub(r"(layer\d+\.\d+)\.conv(\d)\.bn\.", r"\1.bn\2.", k)
        k = re.sub(r"(layer\d+\.\d+)\.downsample\.conv\.weight$",
                   r"\1.downsample.0.weight", k)
        k = re.sub(r"(layer\d+\.\d+)\.downsample\.bn\.",
                   r"\1.downsample.1.", k)
        return k

    tv_state = {
        from_mmcv(k): torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state.items()
    }
    oracle = TorchResNet18(strides=(1, 1, 1, 4), pool=False, out_index=2)
    oracle.load_state_dict(tv_state, strict=True)  # every key must land
    oracle.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, x, train=False)[0])
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy()[0].transpose(1, 2, 0)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_export_cli_torch_format(tmp_path):
    """fgvc-export --format torch: released-style .pth in, reference-
    compatible .pth out, weights preserved end to end."""
    pytest.importorskip("torch")
    from test_reproduce_cli import _save_released_style_ckpt

    from fgvc_tpu.cli.export import main
    from fgvc_tpu.models.torch_convert import (
        convert_resnet_state_dict,
        load_torch_state_dict,
    )

    src = str(tmp_path / "released.pth")
    _save_released_style_ckpt(src)
    dst = str(tmp_path / "roundtrip.pth")
    main([
        "--format", "torch", "--checkpoint", src, "--out", dst,
        "--platform", "cpu",
    ])

    a = convert_resnet_state_dict(load_torch_state_dict(src))
    b = convert_resnet_state_dict(load_torch_state_dict(dst))
    import jax

    fa = dict(jax.tree_util.tree_flatten_with_path(a)[0])
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
