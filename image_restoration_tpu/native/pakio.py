"""ctypes binding for the native pak reader (libpakio.so).

Auto-builds the shared library with `make` on first use; callers
(utils/file_client._PakBackend) fall back to pure-Python IO if the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from os import path as osp

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libpakio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pak_open.restype = ctypes.c_void_p
    lib.pak_open.argtypes = [ctypes.c_char_p]
    lib.pak_size.restype = ctypes.c_int64
    lib.pak_size.argtypes = [ctypes.c_void_p]
    lib.pak_read.restype = ctypes.c_int64
    lib.pak_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                             ctypes.c_uint64, ctypes.c_void_p]
    lib.pak_read_batch.restype = ctypes.c_int
    lib.pak_read_batch.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int]
    lib.pak_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativePakReader:
    """mmap-backed reader with threaded batch reads."""

    def __init__(self, pak_path: str, workers: int = 4):
        self._lib = _load()
        self._handle = self._lib.pak_open(pak_path.encode())
        if not self._handle:
            raise IOError(f"pak_open failed for {pak_path}")
        self.workers = workers
        self.size = self._lib.pak_size(self._handle)

    def read(self, offset: int, length: int) -> bytes:
        buf = np.empty(length, np.uint8)
        got = self._lib.pak_read(self._handle, offset, length,
                                 buf.ctypes.data_as(ctypes.c_void_p))
        if got != length:
            raise IOError(f"pak_read failed at {offset}+{length}")
        return buf.tobytes()

    def read_batch(self, offsets, lengths) -> list:
        offsets = np.asarray(offsets, np.uint64)
        lengths = np.asarray(lengths, np.uint64)
        dst_offsets = np.zeros_like(lengths)
        np.cumsum(lengths[:-1], out=dst_offsets[1:])
        total = int(lengths.sum())
        buf = np.empty(total, np.uint8)
        rc = self._lib.pak_read_batch(
            self._handle, len(offsets),
            offsets.ctypes.data_as(ctypes.c_void_p),
            lengths.ctypes.data_as(ctypes.c_void_p),
            buf.ctypes.data_as(ctypes.c_void_p),
            dst_offsets.ctypes.data_as(ctypes.c_void_p), self.workers)
        if rc != 0:
            raise IOError("pak_read_batch failed")
        return [buf[int(o):int(o + l)].tobytes()
                for o, l in zip(dst_offsets, lengths)]

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.pak_close(self._handle)
        except Exception:
            pass
