"""End-to-end golden vs the REFERENCE'S OWN torch kernel and driver loop.

Unlike tests/oracles.py (numpy restatements), this test executes the
reference's actual `masked_attention_efficient` and `spatial_neighbor`
(/root/reference/mmpt/models/common/local_attention.py:267,
affinity_utils.py:84) loaded via importlib with stub packages (mmcv is not
installed), drives them through a ~30-line port of the forward_test_main
sliding-window loop (vanilla_tracker.py:305-412: gaussian query maps,
key = first frame + preceding window, bilinear upsample, top-5 soft-argmax,
query-frame grouping/remap), and asserts `Tracker.track_points` matches.
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

from oracles import img2coord_np  # noqa: E402

REF = "/root/reference/mmpt/models/common"


def _load_ref(name):
    """Import a reference module standalone, stubbing its package imports."""
    for mod in ("mmpt", "mmpt.models", "mmpt.models.common"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    # local_attention does `from mmpt.models.common import part_unfold`
    # but masked_attention_efficient never touches it — a stub satisfies it
    sys.modules["mmpt.models.common"].part_unfold = types.ModuleType(
        "part_unfold"
    )
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"{REF}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    return _load_ref("local_attention"), _load_ref("affinity_utils")


def _reference_track_points(
    feats, video_hw, query_points, *, precede, topk, temperature,
    neighbor_range, sigma, step, local_attention, affinity_utils,
    with_first=True, kernel="v1",
):
    """The forward_test_main loop (vanilla_tracker.py:305-412) in torch,
    around the reference's real masked_attention_efficient."""
    T, h, w, C = feats.shape
    H, W = video_hw
    stride = H // h
    P = query_points.shape[0]
    feats_t = torch.from_numpy(np.transpose(feats, (3, 0, 1, 2)))  # C,T,h,w

    mask = affinity_utils.spatial_neighbor(
        1, h, w, neighbor_range=neighbor_range,
        device="cpu", dtype=torch.float32, mode="circle",
    )

    gy, gx = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )

    traj = np.zeros((T, P, 2), np.float32)
    for t0 in np.unique(query_points[:, 0].astype(np.int64)):
        sel = np.nonzero(query_points[:, 0].astype(np.int64) == t0)[0]
        pts = torch.from_numpy(query_points[sel][:, 1:])  # (Pg, 2) x,y
        g = torch.exp(
            -(
                (gx[None] - pts[:, 0, None, None]) ** 2
                + (gy[None] - pts[:, 1, None, None]) ** 2
            )
            / (2 * sigma**2)
        )  # (Pg, H, W) — draw_gaussion_map_online
        resized_g = g[:, ::stride, ::stride]

        fg = feats_t[:, t0:]  # (C, L, h, w) features from the query frame
        L = fg.shape[1]
        seg_bank = [resized_g]
        seg_preds = [g]
        for fi in range(1, L):
            ks = max(0, fi - precede)
            if with_first:
                key = torch.cat([fg[:, 0:1], fg[:, ks:fi]], dim=1)[None]
                val = torch.stack(
                    [seg_bank[0]] + seg_bank[ks:fi], dim=1
                )[None]  # (1, Pg, K, h, w)
            else:  # key_start:frame_idx window only (vanilla_tracker.py:353)
                key = fg[:, ks:fi][None]
                val = torch.stack(seg_bank[ks:fi], dim=1)[None]
            if kernel == "v2":
                # v2 computes the circular mask on the fly per chunk
                seg_logit = local_attention.masked_attention_efficient_v2(
                    fg[:, fi][None],
                    key,
                    val,
                    neighbor_range // 2,
                    temperature=temperature,
                    topk=topk,
                    step=step,
                    normalize=True,
                    non_mask_len=0,
                )[0]
            else:
                seg_logit = local_attention.masked_attention_efficient(
                    fg[:, fi][None],
                    key,
                    val,
                    mask,
                    temperature=temperature,
                    topk=topk,
                    step=step,
                    normalize=True,
                    non_mask_len=0,
                )[0]  # (Pg, h, w)
            seg_bank.append(seg_logit)
            seg_preds.append(
                F.interpolate(
                    seg_logit[None], size=(H, W), mode="bilinear",
                    align_corners=False,
                )[0]
            )
        maps = torch.stack(seg_preds).numpy()  # (L, Pg, H, W)
        coords = img2coord_np(maps, topk=5)  # (2, Pg, L), reference layout
        traj[t0:, sel] = coords.transpose(2, 1, 0)
    return traj


@pytest.mark.parametrize("impl", ["tiled", "pallas"])
def test_track_points_matches_reference_torch(ref_mods, impl):
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    local_attention, affinity_utils = ref_mods
    rng = np.random.default_rng(11)
    T, h, w, C = 7, 12, 12, 8
    H, W = 24, 24
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)
    video = rng.integers(0, 255, (T, H, W, 3)).astype(np.float32)

    # two query groups (t=0 and t=2) exercise grouping + remap
    query_points = np.array(
        [[0, 6.0, 8.0], [2, 15.0, 5.0], [0, 18.0, 19.0]], np.float32
    )

    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(H, W), frame_bucket=4, point_bucket=4,
        attention_impl=impl, tile=6 if impl == "tiled" else 16,
    )
    tracker = Tracker(lambda v, x: x, {}, cfg)
    # feed the feature bank directly (backbone parity is covered by
    # tests/test_resnet.py's torch-oracle tests)
    t_pad = -(-T // cfg.frame_bucket) * cfg.frame_bucket + cfg.frame_bucket
    feats_padded = jnp.pad(
        jnp.asarray(feats), ((0, t_pad - T), (0, 0), (0, 0), (0, 0))
    )
    out = tracker.track_points(video, query_points, feats=feats_padded)

    ref = _reference_track_points(
        feats, (H, W), query_points,
        precede=cfg.precede_frames, topk=cfg.topk,
        temperature=cfg.temperature, neighbor_range=cfg.neighbor_range,
        sigma=cfg.sigma, step=cfg.step,
        local_attention=local_attention, affinity_utils=affinity_utils,
    )
    np.testing.assert_allclose(
        out["trajectories"], ref, rtol=1e-3, atol=5e-3
    )


@pytest.mark.parametrize(
    "with_first,kernel",
    [(False, "v1"), (True, "v2")],
)
def test_track_points_reference_variants(ref_mods, with_first, kernel):
    """Reference-kernel goldens for the with_first=False window and the
    test_mode='v2' on-the-fly-mask kernel (vanilla_tracker.py:353,380)."""
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    local_attention, affinity_utils = ref_mods
    rng = np.random.default_rng(13)
    T, h, w, C = 6, 12, 12, 8
    H, W = 24, 24
    feats = rng.standard_normal((T, h, w, C)).astype(np.float32)
    video = rng.integers(0, 255, (T, H, W, 3)).astype(np.float32)
    query_points = np.array([[0, 7.0, 9.0], [0, 16.0, 13.0]], np.float32)

    cfg = TestConfig(
        precede_frames=3, topk=4, temperature=0.07, neighbor_range=10,
        step=48, input_size=(H, W), frame_bucket=4, point_bucket=4,
        attention_impl="tiled", tile=6, with_first=with_first,
    )
    tracker = Tracker(lambda v, x: x, {}, cfg)
    t_pad = -(-T // cfg.frame_bucket) * cfg.frame_bucket + cfg.frame_bucket
    feats_padded = jnp.pad(
        jnp.asarray(feats), ((0, t_pad - T), (0, 0), (0, 0), (0, 0))
    )
    out = tracker.track_points(video, query_points, feats=feats_padded)

    ref = _reference_track_points(
        feats, (H, W), query_points,
        precede=cfg.precede_frames, topk=cfg.topk,
        temperature=cfg.temperature, neighbor_range=cfg.neighbor_range,
        sigma=cfg.sigma, step=cfg.step,
        local_attention=local_attention, affinity_utils=affinity_utils,
        with_first=with_first, kernel=kernel,
    )
    np.testing.assert_allclose(
        out["trajectories"], ref, rtol=1e-3, atol=5e-3
    )
