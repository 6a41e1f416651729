"""Components zoo: FPN neck, mixer heads, trajectory pyramid decoders."""

import numpy as np
import pytest


def test_fpn_shapes_and_extra_levels():
    import jax

    from fgvc_tpu.models.components.fpn import FPN

    rng = np.random.default_rng(0)
    ins = [
        rng.standard_normal((1, 32, 32, 8)).astype(np.float32),
        rng.standard_normal((1, 16, 16, 16)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 32)).astype(np.float32),
    ]
    fpn = FPN(in_channels=(8, 16, 32), out_channels=24, num_outs=5,
              add_extra_convs="on_output")
    vars_ = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(vars_, ins)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 24), (1, 16, 16, 24), (1, 8, 8, 24),
        (1, 4, 4, 24), (1, 2, 2, 24),
    ]
    # top-down fusion actually mixes levels: zeroing the coarsest input
    # changes the finest output
    ins2 = [ins[0], ins[1], np.zeros_like(ins[2])]
    outs2 = fpn.apply(vars_, ins2)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs2[0]))


def test_correlation_pyramid_per_point_values():
    import jax.numpy as jnp

    from fgvc_tpu.models.components.traj_decoder import (
        correlation_pyramid_per_point,
    )

    rng = np.random.default_rng(1)
    B, T, P, C, H, W = 1, 2, 3, 8, 8, 8
    qf = rng.standard_normal((B, T, P, C)).astype(np.float32)
    feats = rng.standard_normal((B, T, H, W, C)).astype(np.float32)
    pyr = correlation_pyramid_per_point(jnp.asarray(qf), jnp.asarray(feats), 3)
    assert pyr[0].shape == (B, T, P, 8, 8)
    assert pyr[1].shape == (B, T, P, 4, 4)
    expect = qf[0, 1, 2] @ feats[0, 1, 3, 5] / np.sqrt(C)
    np.testing.assert_allclose(float(pyr[0][0, 1, 2, 3, 5]), expect, rtol=1e-5)
    # avg-pool parity
    np.testing.assert_allclose(
        np.asarray(pyr[1][0, 0, 0]),
        np.asarray(pyr[0][0, 0, 0]).reshape(4, 2, 4, 2).mean(axis=(1, 3)),
        rtol=1e-5,
    )


@pytest.mark.parametrize("update_feat", [True, False])
def test_mlp_mixer_pips_shapes(update_feat):
    import jax

    from fgvc_tpu.models.components.traj_decoder import MLPMixerPIPS

    B, T, P, Cin = 1, 4, 5, 199
    head = MLPMixerPIPS(
        input_dim=16, dim=32, depth=2, T=T, update_feat=update_feat
    )
    x = np.random.default_rng(2).standard_normal((B, T, P, Cin)).astype(np.float32)
    vars_ = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(vars_, x)
    assert out.shape == (B, T, P, 18 if update_feat else 2)


def test_traj_pyramid_decoder_refines():
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.components.traj_decoder import (
        MLPMixerPIPS,
        TrajPyramidDecoder,
    )

    B, T, P, C, H, W = 1, 4, 3, 16, 12, 12
    radius, levels, time_dim = 2, 3, 64
    kitchen = levels * (2 * radius + 1) ** 2 + C + time_dim * 3 + 3
    head = MLPMixerPIPS(input_dim=C, dim=32, depth=1, T=T, update_feat=True)
    dec = TrajPyramidDecoder(
        traj_pred=head, radius=radius, iters=3, input_dim=C,
        time_dim=time_dim, stride=4, corr_levels=levels,
    )
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(2, 9, (B, T, P, 2)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((B, T, P, C)), jnp.float32)

    vars_ = dec.init(jax.random.PRNGKey(0), feats, coords, qf)
    preds, qf0, qf1 = dec.apply(vars_, feats, coords, qf)
    assert len(preds) == 3
    assert preds[-1].shape == (B, T, P, 2)
    assert np.all(np.isfinite(np.asarray(preds[-1])))
    # kitchen-dim sanity: the head consumed what the decoder concatenated
    assert vars_["params"]["traj_pred"]["pre"]["kernel"].shape[0] == kitchen
    # feature updater actually changed the query features
    assert not np.allclose(np.asarray(qf0), np.asarray(qf1))


def test_traj_pyramid_decoder_v2_and_v3_run():
    import jax
    import jax.numpy as jnp

    from fgvc_tpu.models.components.traj_decoder import (
        MLPMixerPIPS,
        TrajPyramidDecoderV2,
        TrajPyramidDecoderV3,
    )

    B, T, P, C, H, W = 1, 3, 2, 128, 8, 8
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(1, 6, (B, T, P, 2)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((B, T, P, C)), jnp.float32)

    # V2: kitchen = 2*64+2 + 4*49 + 128 + 2 = 456 = embed_dim
    head2 = MLPMixerPIPS(input_dim=C, dim=32, depth=1, T=T, update_feat=True)
    dec2 = TrajPyramidDecoderV2(
        traj_pred=head2, radius=3, iters=2, input_dim=C, stride=8,
    )
    vis = jnp.ones((B, T, P, 1), jnp.float32)
    tm = jnp.ones((B, T, P, 1), jnp.float32)
    v2 = dec2.init(jax.random.PRNGKey(0), feats, coords, qf, vis, tm)
    preds2, _, _ = dec2.apply(v2, feats, coords, qf, vis, tm)
    assert preds2[-1].shape == (B, T, P, 2)
    assert np.all(np.isfinite(np.asarray(preds2[-1])))

    # V3: extra half-res pyramid
    feats_pre = jnp.asarray(
        rng.standard_normal((B, T, H // 2, W // 2, C)), jnp.float32
    )
    head3 = MLPMixerPIPS(input_dim=C, dim=32, depth=1, T=T, update_feat=True)
    dec3 = TrajPyramidDecoderV3(
        traj_pred=head3, radius=2, iters=2, input_dim=C, time_dim=32,
        stride=8, corr_levels=2, use_corr_layer=True, context_hid_dim=64,
    )
    v3 = dec3.init(jax.random.PRNGKey(0), feats, coords, qf, feats_pre, qf)
    preds3, _, _ = dec3.apply(v3, feats, coords, qf, feats_pre, qf)
    assert preds3[-1].shape == (B, T, P, 2)
    assert np.all(np.isfinite(np.asarray(preds3[-1])))


def test_embeddings_match_reference_semantics():
    """PIPS interleaved sin/cos embedding matches the torch reference port."""
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import get_2d_embedding, get_3d_embedding

    rng = np.random.default_rng(5)
    xy = rng.uniform(0, 10, (2, 7, 2)).astype(np.float32)
    C = 8
    out = np.asarray(get_2d_embedding(jnp.asarray(xy), C))
    assert out.shape == (2, 7, 2 * C + 2)
    # coords prepended; sin at even slots with div_term = arange(0,C,2)*1000/C
    div = np.arange(0, C, 2) * (1000.0 / C)
    np.testing.assert_allclose(out[..., :2], xy, rtol=1e-6)
    np.testing.assert_allclose(
        out[..., 2], np.sin(xy[..., 0] * div[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        out[..., 3], np.cos(xy[..., 0] * div[0]), rtol=1e-5, atol=1e-6
    )

    xyz = rng.uniform(0, 5, (2, 4, 3)).astype(np.float32)
    out3 = np.asarray(get_3d_embedding(jnp.asarray(xyz), C))
    assert out3.shape == (2, 4, 3 * C + 3)
    # coords APPENDED for the 3-D variant (reference quirk)
    np.testing.assert_allclose(out3[..., -3:], xyz, rtol=1e-6)


def test_bilinear_resize_align_corners_matches_torch_semantics():
    import jax.numpy as jnp

    from fgvc_tpu.ops.misc import bilinear_resize_align_corners

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    out = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), (9, 13)))
    assert out.shape == (1, 9, 13, 3)
    # corners map exactly (the defining align_corners=True property)
    np.testing.assert_allclose(out[0, 0, 0], x[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, -1, -1], x[0, -1, -1], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, -1], x[0, 0, -1], rtol=1e-6)
    # midpoints interpolate linearly: out row 4 is exactly src row 2
    np.testing.assert_allclose(out[0, 4, 0], x[0, 2, 0], rtol=1e-5)

    try:
        import torch
        import torch.nn.functional as F

        ref = F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            size=(9, 13), mode="bilinear", align_corners=True,
        ).numpy()
        np.testing.assert_allclose(
            out, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-5, atol=1e-6
        )
    except ImportError:
        pass


def test_motion_decoders():
    import jax

    from fgvc_tpu.models.components.decoders import (
        MotionDecoderPlain,
        MotionDecoderSkipLayer,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 16, 16, 49)).astype(np.float32)
    dec = MotionDecoderPlain(output_dim=2, combo=(1, 2, 4))
    v = dec.init(jax.random.PRNGKey(0), x)
    out = dec.apply(v, x)
    assert out.shape == (1, 16, 16, 2)

    skips = {
        "2": rng.standard_normal((1, 8, 8, 64)).astype(np.float32),
        "4": rng.standard_normal((1, 4, 4, 128)).astype(np.float32),
        "8": rng.standard_normal((1, 2, 2, 256)).astype(np.float32),
    }
    dec2 = MotionDecoderSkipLayer(output_dim=2)
    v2 = dec2.init(jax.random.PRNGKey(0), x, skips)
    out2 = dec2.apply(v2, x, skips)
    assert out2.shape == (1, 16, 16, 2)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_corr_res_and_trans_decoders():
    import jax

    from fgvc_tpu.models.components.decoders import (
        CorrResDecoder,
        CorrTransDecoder,
    )

    rng = np.random.default_rng(8)
    # correlation volume: 7x7 window, 8x8=64 query grid flattened as channels
    x = rng.standard_normal((1, 7, 7, 64)).astype(np.float32)
    dec = CorrResDecoder(channels=(64, 49), sizes=((7, 7), (16, 16)))
    v = dec.init(jax.random.PRNGKey(0), x, (8, 8))
    out = dec.apply(v, x, (8, 8))
    assert out.shape == (1, 16, 16, 49)

    dec2 = CorrTransDecoder(
        d_models=(64, 49), n_heads=(8, 7), sizes=((7, 7), (16, 16)),
        pos_emb=False,
    )
    v2 = dec2.init(jax.random.PRNGKey(0), x, (8, 8))
    out2 = dec2.apply(v2, x, (8, 8))
    assert out2.shape == (1, 16, 16, 49)
    assert np.all(np.isfinite(np.asarray(out2)))
