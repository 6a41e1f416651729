"""Direct torch-execution golden for the VOS save_mem kernel family.

Executes the reference's own `masked_attention_efficient_correlation_v2`
(/root/reference/mmpt/models/common/local_attention.py:1120-1250 — the
einsum twin of the CUDA-Correlation kernel the save_mem VOS path calls at
vanilla_tracker.py:747) together with its REAL `part_unfold` /
`bilinear_sample` gather stack (part_unfold.py:13-53, corr_lookup.py:31),
drives it through a port of the `forward_test_backward_save_mem` window
loop (vanilla_tracker.py:716-770: growing precede window, optional first
frame, optional hard_prop one-hot re-encoding), and asserts our streaming
square-window propagation (`Tracker._scan_propagate_streaming`,
mask_shape='square') reproduces the per-frame seg logits.

Documented divergence (not exercised by these fixtures): the reference
zero-pads the NORMALIZED key map before the window gather, so
out-of-image window candidates enter top-k with affinity exactly 0 and
zero values — selectable only when fewer than `topk` in-bounds candidates
have positive cosine similarity (probability ~1e-25 per pixel for random
features; degenerate anti-correlated borders could differ).  Our kernels
exclude out-of-bounds candidates outright (-inf).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not __import__("os").path.isdir("/root/reference/mmpt"):
    pytest.skip("reference repo not mounted", allow_module_level=True)
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference/mmpt/models/common"


@pytest.fixture(scope="module")
def ref_la():
    """local_attention with the REAL part_unfold/corr_lookup chain (the
    point-tracking golden stubs part_unfold out; here it IS the kernel)."""
    for mod in ("mmpt", "mmpt.models", "mmpt.models.common"):
        sys.modules.setdefault(mod, types.ModuleType(mod))

    reg = types.ModuleType("mmpt.models.registry")

    class _NoopRegistry:
        def register_module(self, *a, **k):
            def deco(x):
                return x

            return deco

    reg.OPERATORS = _NoopRegistry()
    sys.modules["mmpt.models.registry"] = reg
    sys.modules["mmpt.models"].registry = reg

    def load(name):
        full = f"mmpt.models.common.{name}"
        spec = importlib.util.spec_from_file_location(full, f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        setattr(sys.modules["mmpt.models.common"], name, mod)
        spec.loader.exec_module(mod)
        return mod

    load("corr_lookup")
    load("part_unfold")
    return load("local_attention")


def _reference_vos_logits(
    video, onehot, *, radius, precede, temperature, topk,
    with_first, hard_prop, sstep, tstep, la,
):
    """forward_test_backward_save_mem's frame loop (vanilla_tracker.py:
    716-770) around the reference's real correlation_v2 kernel, with an
    identity feature extractor (encoder parity is covered by
    tests/test_resnet.py).  Returns (T-1, K, h, w) soft seg logits."""
    T, H, W, _ = video.shape
    K = onehot.shape[-1]
    imgs = torch.from_numpy(video).permute(3, 0, 1, 2)[None]  # (1,3,T,H,W)
    seg0 = torch.from_numpy(onehot).permute(2, 0, 1)[None]    # (1,K,h,w)

    def feat_extractor(x):
        return x

    seg_bank = [seg0]
    out = []
    for fi in range(1, T):
        ks = max(0, fi - precede)
        value = torch.stack(seg_bank[ks:fi], dim=2)  # (1,K,act,h,w)
        key_frames = imgs[:, :, ks:fi]
        if with_first:
            key_frames = torch.cat([imgs[:, :, 0:1], key_frames], dim=2)
            value = torch.cat([seg_bank[0].unsqueeze(2), value], dim=2)
        seg_logit = la.masked_attention_efficient_correlation_v2(
            imgs[:, :, fi],
            key_frames,
            value,
            radius,
            None,               # corr_infer — unused by the v2 einsum form
            feat_extractor,
            temperature=temperature,
            topk=topk,
            normalize=True,
            sstep=sstep,
            tstep=tstep,
        )
        out.append(seg_logit[0].numpy())
        if hard_prop:
            hard = F.one_hot(seg_logit.argmax(1), K).permute(0, 3, 1, 2)
            seg_bank.append(hard.float())
        else:
            seg_bank.append(seg_logit)
    return np.stack(out)


@pytest.mark.parametrize(
    "with_first,hard_prop",
    [(True, False), (False, False), (True, True)],
)
def test_streaming_square_propagation_matches_reference(
    ref_la, with_first, hard_prop
):
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(23)
    T, H, W, K = 6, 12, 12, 3
    radius, precede, topk = 3, 3, 4
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, K, (H, W))
    onehot = np.eye(K, dtype=np.float32)[labels]  # (h, w, K)

    ref = _reference_vos_logits(
        video, onehot, radius=radius, precede=precede, temperature=0.07,
        topk=topk, with_first=with_first, hard_prop=hard_prop,
        sstep=32, tstep=2, la=ref_la,
    )

    cfg = TestConfig(
        precede_frames=precede, topk=topk, temperature=0.07,
        neighbor_range=2 * radius, input_size=(H, W),
        attention_impl="tiled", tile=6, with_first=with_first,
        hard_prop=hard_prop,
    )
    # identity encoder: float video passes through preprocessing untouched
    tracker = Tracker(lambda v, x: x, {}, cfg)
    outs = tracker._scan_propagate_streaming(
        jnp.asarray(video), jnp.asarray(onehot), "square", lambda x: x
    )  # (T-1, h, w, K)

    np.testing.assert_allclose(
        np.transpose(np.asarray(outs), (0, 3, 1, 2)), ref,
        rtol=1e-4, atol=1e-5,
    )


def test_streaming_square_pallas_matches_reference(ref_la):
    """Same golden through the Pallas kernel (interpret mode on CPU)."""
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(29)
    T, H, W, K = 5, 16, 16, 2
    radius, precede, topk = 2, 2, 3
    video = rng.standard_normal((T, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, K, (H, W))
    onehot = np.eye(K, dtype=np.float32)[labels]

    ref = _reference_vos_logits(
        video, onehot, radius=radius, precede=precede, temperature=0.07,
        topk=topk, with_first=True, hard_prop=False,
        sstep=64, tstep=5, la=ref_la,
    )

    cfg = TestConfig(
        precede_frames=precede, topk=topk, temperature=0.07,
        neighbor_range=2 * radius, input_size=(H, W),
        attention_impl="pallas", tile=8,
    )
    tracker = Tracker(lambda v, x: x, {}, cfg)
    outs = tracker._scan_propagate_streaming(
        jnp.asarray(video), jnp.asarray(onehot), "square", lambda x: x
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(outs), (0, 3, 1, 2)), ref,
        rtol=1e-4, atol=1e-5,
    )
