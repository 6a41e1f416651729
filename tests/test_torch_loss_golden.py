"""Direct-execution torch goldens for the round-4 loss-zoo tail
(Multi_Nce_Loss, Kl_Loss_Gaussion/Laplace, GradientPenaltyLoss,
DiscShiftLoss) and the HeatLookup operator: the reference classes are
imported from /root/reference (mmcv/registry stubbed) and run as oracles
against our jax functions."""

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference/mmpt"):
    pytest.skip("reference repo not mounted", allow_module_level=True)


class _Registry:
    def register_module(self, *a, **k):
        if a and isinstance(a[0], type):
            return a[0]

        def deco(cls):
            return cls

        return deco


def _stub_packages():
    for name in ("mmpt", "mmpt.models", "mmpt.utils", "mmpt.datasets"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules.setdefault("mmcv", types.ModuleType("mmcv"))
    reg = types.ModuleType("mmpt.models.registry")
    for r in ("OPERATORS", "MODELS", "BACKBONES", "COMPONENTS", "LOSSES"):
        setattr(reg, r, _Registry())
    sys.modules["mmpt.models.registry"] = reg
    # mmpt.models.losses.losses pulls these at import time
    builder = types.ModuleType("mmpt.models.builder")
    builder.build_loss = lambda cfg: None
    sys.modules["mmpt.models.builder"] = builder
    ftp_utils = types.ModuleType("mmpt.datasets.flyingthingsplus.utils")
    sys.modules.setdefault(
        "mmpt.datasets.flyingthingsplus",
        types.ModuleType("mmpt.datasets.flyingthingsplus"),
    )
    sys.modules["mmpt.datasets.flyingthingsplus.utils"] = ftp_utils
    util = types.ModuleType("mmpt.utils.util")
    util.tensor2img = lambda *a, **k: None
    sys.modules["mmpt.utils.util"] = util


@pytest.fixture(scope="module")
def ref():
    _stub_packages()
    pkg = types.ModuleType("mmpt.models.losses")
    pkg.__path__ = ["/root/reference/mmpt/models/losses"]
    sys.modules["mmpt.models.losses"] = pkg
    common = types.ModuleType("mmpt.models.common")
    common.__path__ = ["/root/reference/mmpt/models/common"]
    sys.modules["mmpt.models.common"] = common
    mods = {}
    for m in ("losses.nce_loss", "losses.gan_loss", "losses.losses",
              "common.corr_lookup"):
        mods[m.split(".")[-1]] = importlib.import_module(f"mmpt.models.{m}")
    return mods


def test_multi_nce_matches_reference(ref):
    from fgvc_tpu.models.losses import multi_nce_loss

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((6, 9)).astype(np.float32)
    target = rng.uniform(0, 1, (6, 9)).astype(np.float32)
    target *= rng.integers(0, 2, (6, 9))  # sparse positives
    target[:, 0] = 0.5  # keep every row non-empty

    loss_ref = ref["nce_loss"].Multi_Nce_Loss(mode="in_sum")(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    ours = float(multi_nce_loss(pred, target))
    np.testing.assert_allclose(ours, float(loss_ref), rtol=1e-5)

    per_row = np.asarray(multi_nce_loss(pred, target, reduction="none"))
    loss_sum = ref["nce_loss"].Multi_Nce_Loss(mode="in_sum",
                                              reduction="sum")(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    np.testing.assert_allclose(per_row.sum(), float(loss_sum), rtol=1e-5)


def test_kl_gaussian_matches_reference(ref):
    from fgvc_tpu.models.losses import kl_gaussian_loss

    rng = np.random.default_rng(1)
    shape = (4, 3, 5)
    mu1, mu2 = (rng.standard_normal(shape).astype(np.float32) for _ in "ab")
    lv1, lv2 = (
        rng.uniform(-1, 1, shape).astype(np.float32) for _ in "ab"
    )
    w = rng.integers(0, 2, shape).astype(np.float32)

    mod = ref["losses"].Kl_Loss_Gaussion()
    t = torch.from_numpy
    loss_ref = mod((t(mu1), t(lv1)), (t(mu2), t(lv2)))
    np.testing.assert_allclose(
        float(kl_gaussian_loss(mu1, lv1, mu2, lv2)), float(loss_ref),
        rtol=1e-5,
    )
    loss_ref_w = mod((t(mu1), t(lv1)), (t(mu2), t(lv2)), weight=t(w))
    np.testing.assert_allclose(
        float(kl_gaussian_loss(mu1, lv1, mu2, lv2, weight=w)),
        float(loss_ref_w), rtol=1e-5,
    )


def test_kl_laplace_matches_reference(ref):
    from fgvc_tpu.models.losses import kl_laplace_loss

    rng = np.random.default_rng(2)
    shape = (4, 3, 5)
    mu1, mu2 = (rng.standard_normal(shape).astype(np.float32) for _ in "ab")
    # the reference uses these directly as Laplace scales — keep positive
    b1, b2 = (rng.uniform(0.2, 2.0, shape).astype(np.float32) for _ in "ab")
    w = rng.integers(0, 2, shape).astype(np.float32)

    mod = ref["losses"].Kl_Loss_Laplace()
    t = torch.from_numpy
    loss_ref = mod((t(mu1), t(b1)), (t(mu2), t(b2)))
    np.testing.assert_allclose(
        float(kl_laplace_loss(mu1, b1, mu2, b2)), float(loss_ref), rtol=1e-5
    )
    loss_ref_w = mod((t(mu1), t(b1)), (t(mu2), t(b2)), weight=t(w))
    np.testing.assert_allclose(
        float(kl_laplace_loss(mu1, b1, mu2, b2, weight=w)),
        float(loss_ref_w), rtol=1e-5,
    )


def test_disc_shift_matches_reference(ref):
    from fgvc_tpu.models.losses import disc_shift_loss

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    loss_ref = ref["gan_loss"].DiscShiftLoss(loss_weight=0.1)(
        torch.from_numpy(x)
    )
    np.testing.assert_allclose(
        0.1 * float(disc_shift_loss(x)), float(loss_ref), rtol=1e-6
    )


def test_gradient_penalty_matches_reference(ref):
    """real == fake makes the interpolate alpha-independent, so the torch
    class (with its internal torch.rand alpha) and our jax function (with a
    jax PRNG alpha) are comparable exactly.  Discriminator: a fixed linear
    channel mix, expressed identically in both frameworks (torch NCHW
    dim=1 == our channels-last axis=-1)."""
    import jax

    from fgvc_tpu.models.losses import gradient_penalty_loss

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 5, 5)).astype(np.float32)  # NCHW
    wmix = rng.standard_normal((3,)).astype(np.float32)
    mask = rng.integers(0, 2, (2, 3, 5, 5)).astype(np.float32)

    def disc_torch(t):
        return (t * torch.from_numpy(wmix).view(1, 3, 1, 1)).sum(
            dim=(1, 2, 3), keepdim=False
        ).pow(2).unsqueeze(-1)

    loss_ref = ref["gan_loss"].GradientPenaltyLoss()(
        disc_torch, torch.from_numpy(x), torch.from_numpy(x.copy())
    )
    loss_ref_m = ref["gan_loss"].GradientPenaltyLoss()(
        disc_torch, torch.from_numpy(x), torch.from_numpy(x.copy()),
        mask=torch.from_numpy(mask),
    )

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    mask_nhwc = np.transpose(mask, (0, 2, 3, 1))

    def disc_jax(t):
        import jax.numpy as jnp

        return jnp.sum(t * wmix, axis=(1, 2, 3)) ** 2

    key = jax.random.PRNGKey(0)
    ours = float(gradient_penalty_loss(disc_jax, x_nhwc, x_nhwc, key))
    np.testing.assert_allclose(ours, float(loss_ref), rtol=1e-4)
    ours_m = float(
        gradient_penalty_loss(disc_jax, x_nhwc, x_nhwc, key, mask=mask_nhwc)
    )
    np.testing.assert_allclose(ours_m, float(loss_ref_m), rtol=1e-4)


def test_discrete_loss_torch_oracle():
    """DiscreteLoss (losses.py:448-483) cannot be executed directly on this
    host — its tobin() hard-casts through torch.cuda.LongTensor — so the
    oracle is the same quantize + F.cross_entropy math in CPU torch."""
    import torch.nn.functional as F

    from fgvc_tpu.models.losses import discrete_loss

    rng = np.random.default_rng(5)
    nbins, fmax = 5, 2.0
    pred = rng.standard_normal((2, 4, 4, 2 * nbins)).astype(np.float32)
    flow = rng.uniform(-3, 3, (2, 8, 8, 2)).astype(np.float32)

    # torch oracle in NCHW with align_corners=True upsampling
    p = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
    t = torch.from_numpy(np.transpose(flow, (0, 3, 1, 2)))
    p = F.interpolate(p, size=(8, 8), mode="bilinear", align_corners=True)
    step = 2 * fmax / nbins
    q = torch.floor(
        (torch.clamp(t, -fmax + 1e-3, fmax - 1e-3) + fmax) / step
    ).long()
    oracle = F.cross_entropy(p[:, :nbins], q[:, 0]) + F.cross_entropy(
        p[:, nbins:], q[:, 1]
    )
    ours = float(discrete_loss(pred, flow, nbins=nbins, fmax=fmax))
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_heat_lookup_matches_reference(ref):
    from fgvc_tpu.models.raft import lookup_heat

    rng = np.random.default_rng(6)
    T, P, H, W, r = 3, 4, 12, 10, 4
    heats = rng.standard_normal((T, P, H, W)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(-1, W, (T, P)), rng.uniform(-1, H, (T, P))], axis=-1
    ).astype(np.float32)

    op = ref["corr_lookup"].HeatLookup(radius=r)
    out_ref = op(
        torch.from_numpy(heats[None]), torch.from_numpy(coords[None])
    )[0].numpy()

    ours = np.asarray(lookup_heat(heats, coords, radius=r))
    assert ours.shape == (T, P, (2 * r + 1) ** 2) == out_ref.shape
    np.testing.assert_allclose(ours, out_ref, rtol=1e-4, atol=1e-5)
