"""Native fgpack store: build, pack, mmap read-back, threaded batch reads."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pack_file(tmp_path_factory):
    from fgvc_tpu.data_io.fgpack import build_library, write_fgpack

    build_library()
    path = tmp_path_factory.mktemp("fgpack") / "test.fgpack"
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        for _ in range(10)
    ]
    n = write_fgpack(str(path), frames)
    assert n == 10
    return str(path), frames


def test_roundtrip_single(pack_file):
    from fgvc_tpu.data_io.fgpack import FgPack

    path, frames = pack_file
    pack = FgPack(path)
    assert len(pack) == 10
    assert pack.record_shape(0) == (24, 32, 3)
    for i in (0, 3, 9):
        np.testing.assert_array_equal(pack[i], frames[i])
    pack.close()


def test_threaded_batch_read(pack_file):
    from fgvc_tpu.data_io.fgpack import FgPack

    path, frames = pack_file
    pack = FgPack(path)
    pack.prefetch(0, 10)
    idx = [7, 0, 5, 5, 2, 9]
    out = pack.read_batch(idx, n_threads=4)
    for got, i in zip(out, idx):
        np.testing.assert_array_equal(got, frames[i])
    pack.close()


def test_bad_file(tmp_path):
    from fgvc_tpu.data_io.fgpack import FgPack

    bad = tmp_path / "bad.fgpack"
    bad.write_bytes(b"NOPE" + b"\0" * 32)
    with pytest.raises(IOError):
        FgPack(str(bad))


# --------------------------------------------------------------------- #
# v2: JPEG records, native decode, I420 wire-format output


@pytest.fixture(scope="module")
def jpeg_frames():
    # smooth gradients so the lossy roundtrip error stays tiny
    y = np.linspace(0, 200, 48)[:, None]
    x = np.linspace(0, 55, 64)[None, :]
    frames = [
        np.clip(
            np.stack(
                [
                    y + x + 10 * i,
                    0.5 * y + 0 * x + 20 + 4 * i,
                    255 - x - 0 * y - 8 * i,
                ],
                axis=-1,
            ),
            0,
            255,
        ).astype(np.uint8)
        for i in range(6)
    ]
    return frames  # (48, 64, 3) each


def test_jpeg_roundtrip(tmp_path, jpeg_frames):
    from fgvc_tpu.data_io.fgpack import CODEC_JPEG, FgPack, write_fgpack

    path = tmp_path / "v.fgpack"
    write_fgpack(str(path), jpeg_frames, codec="jpeg", quality=95)
    pack = FgPack(str(path))
    assert len(pack) == 6
    assert pack.record_shape(0) == (48, 64, 3)
    assert pack.record_codec(0) == CODEC_JPEG
    out = pack.read_batch(range(6), n_threads=4)
    for got, ref in zip(out, jpeg_frames):
        assert got.shape == ref.shape
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 8
    pack.close()


def test_i420_layout_bit_exact_vs_cv2(pack_file):
    cv2 = pytest.importorskip("cv2")
    from fgvc_tpu.data_io.fgpack import FgPack

    path, frames = pack_file
    pack = FgPack(path)
    got = pack.read_batch(range(10), layout="i420", n_threads=4)
    for g, f in zip(got, frames):
        ref = cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
        np.testing.assert_array_equal(g, ref)
    pack.close()


def test_rgb_to_i420_batch_bit_exact(pack_file):
    cv2 = pytest.importorskip("cv2")
    from fgvc_tpu.data_io.fgpack import rgb_to_i420_batch

    _, frames = pack_file
    video = np.stack(frames)
    got = rgb_to_i420_batch(video)
    ref = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in video])
    np.testing.assert_array_equal(got, ref)
    # single frame form
    np.testing.assert_array_equal(rgb_to_i420_batch(frames[0]), ref[0])


def test_decode_jpeg_batch_matches_cv2(jpeg_frames):
    cv2 = pytest.importorskip("cv2")
    from fgvc_tpu.data_io.fgpack import decode_jpeg_batch

    bufs = [
        cv2.imencode(
            ".jpg", f[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 92]
        )[1].tobytes()
        for f in jpeg_frames
    ]
    got = decode_jpeg_batch(bufs, n_threads=4)
    ref = np.stack(
        [
            cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)[
                ..., ::-1
            ]
            for b in bufs
        ]
    )
    # same libjpeg backend: expect identical output
    np.testing.assert_array_equal(got, ref)
    # i420 layout = decode then the bit-exact converter
    got420 = decode_jpeg_batch(bufs, layout="i420")
    ref420 = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in ref]
    )
    np.testing.assert_array_equal(got420, ref420)


def test_decode_jpeg_batch_corrupt_raises(jpeg_frames):
    cv2 = pytest.importorskip("cv2")
    from fgvc_tpu.data_io.fgpack import decode_jpeg_batch

    bufs = [
        cv2.imencode(".jpg", f[..., ::-1])[1].tobytes() for f in jpeg_frames
    ]
    bufs[3] = bufs[3][:40]  # truncate mid-batch
    with pytest.raises(IOError):
        decode_jpeg_batch(bufs, n_threads=4)


def test_tapvid_decode_frames_uses_native(jpeg_frames):
    cv2 = pytest.importorskip("cv2")
    from fgvc_tpu.datasets.tapvid import _decode_frames

    bufs = [
        cv2.imencode(".jpg", f[..., ::-1])[1].tobytes() for f in jpeg_frames
    ]
    got = _decode_frames(bufs)
    assert got.shape == (6, 48, 64, 3)
    # PIL and the native decoder share libjpeg: identical pixels
    import io

    from PIL import Image

    ref = np.stack([np.array(Image.open(io.BytesIO(b))) for b in bufs])
    np.testing.assert_array_equal(got, ref)


def test_v1_files_still_readable(tmp_path):
    """A version-1 file (round-2 format, no codec field) must keep reading."""
    import struct

    from fgvc_tpu.data_io.fgpack import FgPack

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (8, 10, 3), np.uint8) for _ in range(3)]
    rec_fmt = "<QQIIII"
    header = b"FGPK" + struct.pack("<I", 1) + struct.pack("<Q", 3)
    offset = len(header) + 3 * struct.calcsize(rec_fmt)
    index, blobs = b"", b""
    for f in frames:
        index += struct.pack(rec_fmt, offset, f.nbytes, 8, 10, 3, 0)
        blobs += f.tobytes()
        offset += f.nbytes
    path = tmp_path / "v1.fgpack"
    path.write_bytes(header + index + blobs)
    pack = FgPack(str(path))
    assert len(pack) == 3
    for i in range(3):
        np.testing.assert_array_equal(pack[i], frames[i])
    pack.close()
