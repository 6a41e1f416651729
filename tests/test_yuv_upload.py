"""YUV 4:2:0 upload codec (ops/color.py) — decode parity with cv2 and
end-to-end tracker equivalence.

The codec is a TPU-systems bandwidth lever (halve host→device bytes), not
a reference feature; correctness bar = the device decode matches cv2's
COLOR_YUV2RGB_I420 (studio-swing BT.601, nearest chroma upsampling) and
the tracker's outputs stay close to the RGB upload path.
"""

import dataclasses

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_device_decode_matches_cv2():
    from fgvc_tpu.ops.color import yuv420_to_rgb01

    rng = np.random.default_rng(0)
    H, W = 32, 48
    yuv = rng.integers(0, 256, (H * 3 // 2, W), dtype=np.uint8)
    want = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32) / 255.0
    got = np.asarray(yuv420_to_rgb01(yuv))
    # cv2 uses fixed-point arithmetic: <=0.6/255 per channel
    assert np.abs(got - want).max() < 1.0 / 255.0


def test_device_decode_batched():
    from fgvc_tpu.ops.color import yuv420_to_rgb01

    rng = np.random.default_rng(1)
    T, H, W = 3, 16, 16
    yuv = rng.integers(0, 256, (T, H * 3 // 2, W), dtype=np.uint8)
    got = np.asarray(yuv420_to_rgb01(yuv))
    assert got.shape == (T, H, W, 3)
    for t in range(T):
        want = (
            cv2.cvtColor(yuv[t], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
            / 255.0
        )
        assert np.abs(got[t] - want).max() < 1.0 / 255.0


def test_roundtrip_small_on_smooth_image():
    """Encode→decode error on smooth content is a few LSB (the codec is
    near-lossless for JPEG-sourced video, which is already 4:2:0)."""
    from fgvc_tpu.ops.color import rgb_to_yuv420_host, yuv420_to_rgb01

    H, W = 64, 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 17),
            127 + 100 * np.cos(yy / 13),
            127 + 60 * np.sin((xx + yy) / 23),
        ],
        axis=-1,
    ).astype(np.uint8)
    rec = np.asarray(yuv420_to_rgb01(rgb_to_yuv420_host(img))) * 255.0
    # studio-swing quantization + 2x2 chroma mean: small on smooth content
    assert np.abs(rec - img.astype(np.float32)).mean() < 2.5
    assert np.abs(rec - img.astype(np.float32)).max() < 14.0


def test_tracker_yuv_upload_close_to_rgb():
    """track_points with upload_format='yuv420' stays within ~1 feature
    pixel of the RGB-upload path on smooth synthetic video."""
    import jax.numpy as jnp

    from fgvc_tpu.config import TestConfig
    from fgvc_tpu.models.tracker import Tracker

    rng = np.random.default_rng(2)
    T, H, W = 5, 32, 32
    # smooth moving-gradient video
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    video = np.stack(
        [
            np.stack(
                [
                    127 + 90 * np.sin((xx + 3 * t) / 11),
                    127 + 90 * np.cos((yy - 2 * t) / 9),
                    127 + 50 * np.sin((xx + yy + t) / 15),
                ],
                axis=-1,
            )
            for t in range(T)
        ]
    ).astype(np.uint8)
    qp = np.array(
        [[0, 8.0, 9.0], [0, 20.0, 15.0], [1, 12.0, 22.0]], np.float32
    )

    def feat_fn(variables, imgs):
        # cheap deterministic "backbone": 2x2 average pool of the Lab input
        x = imgs.reshape(imgs.shape[0], H // 2, 2, W // 2, 2, 3)
        return x.mean(axis=(2, 4))

    base = dataclasses.replace(
        TestConfig(),
        attention_impl="tiled",
        input_size=(H, W),
        neighbor_range=8,
        tile=8,
        topk=4,
        precede_frames=2,
        frame_bucket=8,
        point_bucket=4,
    )
    out_rgb = Tracker(feat_fn, {}, base).track_points(video, qp)
    cfg_yuv = dataclasses.replace(base, upload_format="yuv420")
    out_yuv = Tracker(feat_fn, {}, cfg_yuv).track_points(video, qp)

    tr_rgb = out_rgb["trajectories"]
    tr_yuv = out_yuv["trajectories"]
    assert tr_rgb.shape == tr_yuv.shape
    assert np.all(np.isfinite(tr_yuv))
    # chroma subsampling perturbs features slightly; tracked coords stay
    # within ~2 full-res pixels on smooth content
    assert np.abs(tr_rgb - tr_yuv).max() < 2.0
