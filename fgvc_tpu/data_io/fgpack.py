"""fgpack — python interface to the native packed frame store (csrc/fgpack.cpp).

Writer (pure python) + ctypes reader over the C++ mmap/pthread library.
The shared library is built on demand with g++ (no pybind11 dependency).

Usage:
    write_fgpack("train.fgpack", frame_iterator)       # (H, W, 3) uint8
    pack = FgPack("train.fgpack")
    batch = pack.read_batch([3, 7, 11], n_threads=4)   # list of arrays
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterable, List, Sequence

import numpy as np

_MAGIC = b"FGPK"
_VERSION = 1
_REC_FMT = "<QQIIII"  # offset, nbytes, h, w, c, reserved
_REC_SIZE = struct.calcsize(_REC_FMT)

_LIB = None


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libfgpack.so")


def _src_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "fgpack.cpp")


def build_library(force: bool = False) -> str:
    """Compile csrc/fgpack.cpp into libfgpack.so (cached)."""
    lib = _lib_path()
    src = _src_path()
    if force or not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src, "-lpthread"],
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
        ]
        lib.fgpack_prefetch.restype = ctypes.c_int
        lib.fgpack_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fgpack_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def write_fgpack(path: str, frames: Iterable[np.ndarray]) -> int:
    """Pack (H, W, C) uint8 frames into `path`; returns the record count."""
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
        nbytes = f.nbytes
        index += struct.pack(_REC_FMT, offset, nbytes, h, w, c, 0)
        blobs.append(f.tobytes())
        offset += nbytes
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(index)
        for b in blobs:
            fh.write(b)
    return n


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
        out = (ctypes.c_int64 * 4)()
        if self._lib.fgpack_record_info(self._h, i, out) != 0:
            raise IndexError(i)
        return int(out[0]), int(out[1]), int(out[2])

    def prefetch(self, lo: int, hi: int) -> None:
        self._lib.fgpack_prefetch(self._h, lo, hi)

    def read_batch(
        self, indices: Sequence[int], n_threads: int = 4
    ) -> List[np.ndarray]:
        """Threaded batch read; records must share one shape."""
        h, w, c = self.record_shape(int(indices[0]))
        n = len(indices)
        stride = h * w * c
        dst = np.empty((n, h, w, c), np.uint8)
        idx = (ctypes.c_int64 * n)(*[int(i) for i in indices])
        rc = self._lib.fgpack_read_batch(
            self._h,
            idx,
            n,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            stride,
            n_threads,
        )
        if rc != 0:
            raise IOError(
                "fgpack_read_batch failed (invalid index or a record not "
                "matching the batch shape)"
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
