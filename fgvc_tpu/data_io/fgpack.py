"""fgpack — python interface to the native packed frame store (csrc/fgpack.cpp).

Writer (pure python) + ctypes reader over the C++ mmap/pthread/libjpeg
library.  The shared library is built on demand with g++ (no pybind11
dependency); ctypes releases the GIL around calls, so batch decode overlaps
the host's JAX dispatch work.

Usage:
    write_fgpack("train.fgpack", frame_iterator)                # raw uint8
    write_fgpack("train.fgpack", frames, codec="jpeg")          # compressed
    pack = FgPack("train.fgpack")
    batch = pack.read_batch([3, 7, 11], n_threads=4)            # RGB HWC
    planes = pack.read_batch(range(8), layout="i420")           # upload wire
    video = decode_jpeg_batch(list_of_jpeg_bytes)               # TAP-Vid path
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterable, List, Sequence

import numpy as np

_MAGIC = b"FGPK"
_VERSION = 2
_REC_FMT = "<QQIIII"  # offset, nbytes, h, w, c, codec
_REC_SIZE = struct.calcsize(_REC_FMT)

CODEC_RAW = 0
CODEC_JPEG = 1
_LAYOUTS = {"hwc": 0, "i420": 1}

_LIB = None


def _src_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "fgpack.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(
            "csrc/fgpack.cpp not found — the native fgpack reader needs a "
            "source checkout (pip install -e .); wheel installs fall back "
            "to the pure-python readers"
        )
    return src


def _lib_path() -> str:
    src_dir = os.path.dirname(_src_path())
    if os.access(src_dir, os.W_OK):
        return os.path.join(src_dir, "libfgpack.so")
    # site-packages may be read-only; build into a per-user cache instead
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "fgvc_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libfgpack.so")


def build_library(force: bool = False) -> str:
    """Compile csrc/fgpack.cpp into libfgpack.so (cached)."""
    src = _src_path()
    lib = _lib_path()
    if force or not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src,
             "-lpthread", "-ljpeg"],
            check=True,
        )
    return lib


def _load():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_library())
        lib.fgpack_open.restype = ctypes.c_void_p
        lib.fgpack_open.argtypes = [ctypes.c_char_p]
        lib.fgpack_count.restype = ctypes.c_int64
        lib.fgpack_count.argtypes = [ctypes.c_void_p]
        lib.fgpack_record_info.restype = ctypes.c_int
        lib.fgpack_record_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fgpack_read_batch.restype = ctypes.c_int
        lib.fgpack_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fgpack_decode_jpeg_batch.restype = ctypes.c_int
        lib.fgpack_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fgpack_rgb_to_i420_batch.restype = ctypes.c_int
        lib.fgpack_rgb_to_i420_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fgpack_prefetch.restype = ctypes.c_int
        lib.fgpack_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fgpack_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _encode_jpeg(frame: np.ndarray, quality: int) -> bytes:
    import cv2

    ok, buf = cv2.imencode(
        ".jpg", frame[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), quality]
    )
    if not ok:
        raise ValueError("JPEG encode failed")
    return buf.tobytes()


def write_fgpack(
    path: str,
    frames: Iterable[np.ndarray],
    codec: str = "raw",
    quality: int = 95,
) -> int:
    """Pack (H, W, C) uint8 frames into `path`; returns the record count.

    codec='jpeg' stores JPEG blobs (RGB frames only) — ~13× smaller at
    q=95 for natural video; the native reader decodes them in its thread
    pool.  Index h/w/c always record the DECODED dims.
    """
    if codec not in ("raw", "jpeg"):
        raise ValueError(f"unknown codec {codec!r}")
    codec_id = CODEC_RAW if codec == "raw" else CODEC_JPEG
    frames = list(frames)
    n = len(frames)
    header = _MAGIC + struct.pack("<I", _VERSION) + struct.pack("<Q", n)
    index_size = n * _REC_SIZE
    offset = len(header) + index_size
    index = b""
    blobs = []
    for f in frames:
        f = np.ascontiguousarray(f, dtype=np.uint8)
        h, w = f.shape[:2]
        c = f.shape[2] if f.ndim == 3 else 1
        if codec_id == CODEC_JPEG:
            if c != 3:
                raise ValueError("codec='jpeg' requires (H, W, 3) RGB frames")
            blob = _encode_jpeg(f, quality)
        else:
            blob = f.tobytes()
        index += struct.pack(_REC_FMT, offset, len(blob), h, w, c, codec_id)
        blobs.append(blob)
        offset += len(blob)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(index)
        for b in blobs:
            fh.write(b)
    return n


def _out_shape(h: int, w: int, c: int, layout: int):
    if layout == 1:  # I420 planes
        if c != 3 or h % 2 or w % 2:
            raise ValueError(
                "i420 layout needs even-sized (H, W, 3) records"
            )
        return (h * 3 // 2, w)
    return (h, w, c)


def decode_jpeg_batch(
    bufs: Sequence[bytes],
    layout: str = "hwc",
    n_threads: int = 4,
) -> np.ndarray:
    """Decode same-sized in-memory JPEG frames to (N, H, W, 3) uint8 RGB —
    or (N, H*3//2, W) I420 planes — in the native thread pool (GIL-free).

    The TAP-Vid pickle path: shards store per-frame JPEG byte strings
    (reference tapvid.py:85-105 decodes them one-by-one in Python).
    """
    lib = _load()
    n = len(bufs)
    if n == 0:
        raise ValueError("empty batch")
    lay = _LAYOUTS[layout]
    # probe dims from the first frame via a 1-frame HWC decode? cheaper:
    # parse the SOF header in python (2 bytes markers) — but libjpeg does it
    # in ~µs; decode frame 0 alone to learn dims, then batch the rest.
    import io

    from PIL import Image

    with Image.open(io.BytesIO(bufs[0])) as im:
        w, h = im.size
    shape = _out_shape(h, w, 3, lay)
    dst = np.empty((n, *shape), np.uint8)
    stride = int(np.prod(shape))
    arr = (ctypes.c_char_p * n)(*bufs)
    sizes = (ctypes.c_int64 * n)(*[len(b) for b in bufs])
    rc = lib.fgpack_decode_jpeg_batch(
        ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)),
        sizes,
        n,
        h,
        w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        stride,
        n_threads,
        lay,
    )
    if rc != 0:
        raise IOError(
            "decode_jpeg_batch failed (corrupt JPEG or mismatched frame sizes)"
        )
    return dst


def rgb_to_i420_batch(video: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) or (H, W, 3) uint8 RGB → I420 planes, native C path.

    Bit-exact vs cv2.COLOR_RGB2YUV_I420 (tests/test_fgpack.py); the pure-C
    loop avoids cv2's per-frame python call overhead and releases the GIL.
    """
    lib = _load()
    single = video.ndim == 3
    v = np.ascontiguousarray(video[None] if single else video, np.uint8)
    n, h, w, c = v.shape
    if c != 3 or h % 2 or w % 2:
        raise ValueError("rgb_to_i420_batch needs even-sized RGB frames")
    dst = np.empty((n, h * 3 // 2, w), np.uint8)
    rc = lib.fgpack_rgb_to_i420_batch(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        h,
        w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError("rgb_to_i420_batch failed")
    return dst[0] if single else dst


class FgPack:
    """Reader over the native library."""

    def __init__(self, path: str):
        self._lib = _load()
        self._h = self._lib.fgpack_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open fgpack file {path}")

    def __len__(self) -> int:
        return int(self._lib.fgpack_count(self._h))

    def record_shape(self, i: int):
        """Decoded (h, w, c) of record i."""
        out = (ctypes.c_int64 * 5)()
        if self._lib.fgpack_record_info(self._h, i, out) != 0:
            raise IndexError(i)
        return int(out[0]), int(out[1]), int(out[2])

    def record_codec(self, i: int) -> int:
        out = (ctypes.c_int64 * 5)()
        if self._lib.fgpack_record_info(self._h, i, out) != 0:
            raise IndexError(i)
        return int(out[4])

    def prefetch(self, lo: int, hi: int) -> None:
        self._lib.fgpack_prefetch(self._h, lo, hi)

    def read_batch(
        self,
        indices: Sequence[int],
        n_threads: int = 4,
        layout: str = "hwc",
    ) -> List[np.ndarray]:
        """Threaded batch read+decode; records must share one decoded shape.

        layout='hwc' returns decoded uint8 HWC (RGB for JPEG records);
        layout='i420' returns YUV 4:2:0 planes (h*3//2, w) — the eval
        harness's host→TPU wire format (ops/color.py).
        """
        h, w, c = self.record_shape(int(indices[0]))
        lay = _LAYOUTS[layout]
        shape = _out_shape(h, w, c, lay)
        n = len(indices)
        stride = int(np.prod(shape))
        dst = np.empty((n, *shape), np.uint8)
        idx = (ctypes.c_int64 * n)(*[int(i) for i in indices])
        rc = self._lib.fgpack_read_batch(
            self._h,
            idx,
            n,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            stride,
            n_threads,
            lay,
        )
        if rc != 0:
            raise IOError(
                "fgpack_read_batch failed (invalid index, decode error, or "
                "a record not matching the batch shape)"
            )
        return list(dst)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.read_batch([i], n_threads=1)[0]

    def close(self):
        if self._h:
            self._lib.fgpack_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
