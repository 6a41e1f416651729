"""Direct-execution golden for the coarse-to-fine two-stage kernel.

Runs the reference's ACTUAL `masked_attention_efficient_c2f`
(/root/reference/mmpt/models/common/local_attention.py:721-880) — pure
torch ops, so it executes on CPU — with its own `spatial_neighbor` circle
mask, and asserts `fgvc_tpu.ops.c2f.masked_attention_c2f` matches.  This is
the stronger companion to the numpy oracle in tests/test_c2f.py (the oracle
restates the computation; this executes the reference's).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not __import__("os").path.isdir("/root/reference/mmpt"):
    pytest.skip("reference repo not mounted", allow_module_level=True)

from test_torch_golden import _load_ref  # noqa: E402


@pytest.fixture(scope="module")
def ref_mods():
    return _load_ref("local_attention"), _load_ref("affinity_utils")


@pytest.mark.parametrize(
    "step,scale,rf,T,neighbor_range,topk",
    [
        (None, 2, 2, 3, 6, 5),     # base shape
        (13, 2, 2, 3, 6, 5),       # odd query chunking
        (None, 4, 1, 1, 8, 3),     # big scale, single key frame
        (None, 2, 3, 2, 4, 9),     # patch bigger than radius; topk ~ T*r²/2
    ],
)
def test_c2f_matches_reference_torch(
    ref_mods, step, scale, rf, T, neighbor_range, topk
):
    local_attention, affinity_utils = ref_mods
    rng = np.random.default_rng(3)
    hc = wc = 6
    hf = wf = hc * scale
    C, Cf, Cv = 8, 8, 3
    temp = 0.1

    query = rng.standard_normal((hc, wc, C)).astype(np.float32)
    key = rng.standard_normal((T, hc, wc, C)).astype(np.float32)
    qf = rng.standard_normal((hf, wf, Cf)).astype(np.float32)
    kf = rng.standard_normal((T, hf, wf, Cf)).astype(np.float32)
    value = rng.standard_normal((T, hf, wf, Cv)).astype(np.float32)

    # ---- the reference's own kernel, NCHW/NCTHW layout ----------------- #
    tq = torch.from_numpy(query).permute(2, 0, 1)[None]           # (1,C,h,w)
    tk = torch.from_numpy(key).permute(3, 0, 1, 2)[None]          # (1,C,T,h,w)
    tqf = torch.from_numpy(qf).permute(2, 0, 1)[None]
    tkf = torch.from_numpy(kf).permute(3, 0, 1, 2)[None]
    tv = torch.from_numpy(value).permute(3, 0, 1, 2)[None]
    mask = affinity_utils.spatial_neighbor(
        1, hc, wc, neighbor_range=neighbor_range, device="cpu",
        dtype=torch.float32, mode="circle",
    )
    with torch.no_grad():
        ref = local_attention.masked_attention_efficient_c2f(
            tq, tk, tqf, tkf, tv, mask,
            temperature=temp, topk=topk, normalize=True,
            step=step if step is not None else hc * wc,
            non_mask_len=0, radius_fine=rf,
        )
    ref = ref[0].permute(1, 2, 0).numpy()                         # (h,w,Cv)

    # ---- ours ---------------------------------------------------------- #
    import jax.numpy as jnp

    from fgvc_tpu.ops.c2f import masked_attention_c2f

    got = np.asarray(
        masked_attention_c2f(
            jnp.asarray(query), jnp.asarray(key), jnp.asarray(qf),
            jnp.asarray(kf), jnp.asarray(value),
            radius=neighbor_range / 2, radius_fine=rf,
            temperature=temp, topk=topk, step=step,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)
