"""RGB→CIE-Lab conversion and normalization, matching OpenCV float semantics.

The reference preprocesses every frame with
``cv2.cvtColor(np.float32(img) / 255, cv2.COLOR_RGB2Lab)`` followed by
mean/std normalization (RGB2LAB + Normalize pipeline steps,
/root/reference/mmpt/datasets/pipelines/augmentation.py:1372).  OpenCV's
float32 path DOES apply sRGB gamma decoding (linearization) before the D65
XYZ matrix and the CIE f(t) curve — see _srgb_to_linear below and the
CLAUDE.md note.  We reproduce that exactly so features match the reference
bit-for-bit (verified against cv2 in tests).

Jittable; operates on channels-last float arrays scaled to [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# D65 reference white, OpenCV constants.
_XN = 0.950456
_ZN = 1.088754

# RGB -> XYZ (linear, D65), rows = X, Y, Z.  Kept as numpy so importing
# this module inside a jit trace can never capture a traced constant.
import numpy as _np

_RGB2XYZ = _np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=_np.float32,
)


def _f(t: jax.Array) -> jax.Array:
    """CIE Lab forward curve: cube root above the knee, linear below."""
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _srgb_to_linear(c: jax.Array) -> jax.Array:
    """sRGB companding inverse — cv2's float path applies this (verified
    empirically against cv2 5.0; tests/test_ops.py)."""
    return jnp.where(
        c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92
    )


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """Convert (..., 3) sRGB in [0, 1] to Lab (L in [0,100], a/b ~ [-127,127]).

    Matches cv2.cvtColor(float32, COLOR_RGB2Lab), including the sRGB
    linearization cv2 applies before the XYZ matrix.
    """
    rgb = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,dc->...d", rgb, jnp.asarray(_RGB2XYZ))
    x = _f(xyz[..., 0] / _XN)
    y = xyz[..., 1]
    fy = _f(y)
    z = _f(xyz[..., 2] / _ZN)
    big_l = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (x - fy)
    b = 200.0 * (fy - z)
    return jnp.stack([big_l, a, b], axis=-1)


def normalize(img: jax.Array, mean, std) -> jax.Array:
    """Per-channel (img - mean) / std on channels-last arrays."""
    mean = jnp.asarray(mean, dtype=img.dtype)
    std = jnp.asarray(std, dtype=img.dtype)
    return (img - mean) / std


# The Lab normalization used by every shipped eval config
# (/root/reference/configs/eval/base_data.py:1).
LAB_MEAN = (50.0, 0.0, 0.0)
LAB_STD = (50.0, 127.0, 127.0)


def preprocess_rgb_to_lab_normalized(rgb_uint8: jax.Array) -> jax.Array:
    """uint8 RGB frame(s) → normalized Lab float32, the full eval preprocessing."""
    rgb = rgb_uint8.astype(jnp.float32) / 255.0
    lab = rgb_to_lab(rgb)
    return normalize(lab, LAB_MEAN, LAB_STD)


# standard mmcv/ImageNet RGB normalization (img_norm_cfg mean/std on 0-255)
# — the preprocessing the reference's non-Lab backbone ablations (DINO/ViT
# zoo, mmpt/models/backbones/__init__.py) pair with; the shipped eval
# configs use Lab (configs/eval/base_data.py:3-13)
IMAGENET_MEAN = (123.675 / 255.0, 116.28 / 255.0, 103.53 / 255.0)
IMAGENET_STD = (58.395 / 255.0, 57.12 / 255.0, 57.375 / 255.0)


def preprocess_rgb_to_imagenet(rgb_uint8: jax.Array) -> jax.Array:
    """uint8 RGB frame(s) → ImageNet-normalized RGB float32."""
    rgb = rgb_uint8.astype(jnp.float32) / 255.0
    return normalize(rgb, IMAGENET_MEAN, IMAGENET_STD)


def preprocess_yuv420_to_imagenet(yuv: jax.Array) -> jax.Array:
    """I420 uint8 frame(s) → ImageNet-normalized RGB float32."""
    return normalize(yuv420_to_rgb01(yuv), IMAGENET_MEAN, IMAGENET_STD)


# --------------------------------------------------------------------- #
# YUV 4:2:0 upload codec — a TPU-SYSTEMS lever, not a reference feature.
#
# The eval harness is bound by the host→device link (uint8 RGB = 3 B/px
# through a ~30-60 MB/s tunnel here; see bench.py's tunnel probe).  I420
# chroma subsampling halves the wire format to 1.5 B/px.  TAP-Vid source
# videos are stored as JPEG, i.e. already 4:2:0 chroma-subsampled, so
# re-subsampling is near-lossless for the benchmark metrics (measured in
# docs/precision_study.md).  The host encodes with cv2 (RGB2YUV_I420,
# studio-swing BT.601); the device decode below matches cv2's
# COLOR_YUV2RGB_I420 — studio-swing matrix + NEAREST chroma upsampling —
# to ≤0.6/255 (cv2 uses fixed-point arithmetic; verified in tests).
# --------------------------------------------------------------------- #


def rgb_to_yuv420_host(video: "_np.ndarray") -> "_np.ndarray":
    """(T, H, W, 3) or (H, W, 3) uint8 RGB → I420 planes (…, H*3//2, W).

    Host-side; H and W must be even.  Prefers the native batch converter
    (csrc/fgpack.cpp fgpack_rgb_to_i420_batch — bit-exact vs cv2, one
    GIL-free call for the whole video); falls back to cv2 per frame.
    """
    try:
        from fgvc_tpu.data_io.fgpack import rgb_to_i420_batch

        return rgb_to_i420_batch(video)
    except Exception:
        import cv2

        if video.ndim == 3:
            return cv2.cvtColor(video, cv2.COLOR_RGB2YUV_I420)
        return _np.stack(
            [cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in video]
        )


def yuv420_to_rgb01(yuv: jax.Array) -> jax.Array:
    """I420 planes (..., H*3//2, W) uint8 → (..., H, W, 3) float RGB in [0,1].

    Jittable device-side decode matching cv2.COLOR_YUV2RGB_I420.
    """
    *lead, hp, w = yuv.shape
    h = hp * 2 // 3
    f = yuv.astype(jnp.float32)
    y = f[..., :h, :]
    u = f[..., h : h + h // 4, :].reshape(*lead, h // 2, w // 2)
    v = f[..., h + h // 4 :, :].reshape(*lead, h // 2, w // 2)
    u = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1) - 128.0
    # cv2 clamps the luma excursion at zero BEFORE scaling (fixed-point
    # max(0, Y-16)); without this, Y<16 pixels disagree by up to 19/255
    yy = 1.16438356 * jnp.maximum(y - 16.0, 0.0)
    r = yy + 1.59602679 * v
    g = yy - 0.39176229 * u - 0.81296765 * v
    b = yy + 2.01723214 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0) / 255.0


def preprocess_yuv420_to_lab_normalized(yuv: jax.Array) -> jax.Array:
    """I420 uint8 frame(s) → normalized Lab float32 (decode + eval pipeline)."""
    lab = rgb_to_lab(yuv420_to_rgb01(yuv))
    return normalize(lab, LAB_MEAN, LAB_STD)
