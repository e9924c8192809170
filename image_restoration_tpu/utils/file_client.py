"""File IO backends — parity with basicsr/utils/file_client.py.

Backends:
  * 'disk' — plain files (ref DiskBackend)
  * 'lmdb' — real LMDB databases (ref LmdbBackend, file_client.py:74-131),
    read through the dependency-free mmap reader in utils/lmdb_util.py —
    reference-prepared `<name>.lmdb/data.mdb` datasets load as-is.
  * 'pak'  — this repo's packed-record store: one blob file + binary
    index, O(1) random reads. `make_pak_from_folder` is the preferred
    analog of utils/lmdb_util.make_lmdb_from_imgs. The native C++ reader
    (native/pakio) mmaps the blob and serves multi-threaded reads; this
    module falls back to pure-Python IO when the shared library is absent.
"""

from __future__ import annotations

import os
import struct
from os import path as osp
from typing import Dict, Optional, Tuple

_MAGIC = b"IRPK"


def write_pak(records, pak_path: str) -> None:
    """records: iterable of (key:str, data:bytes). Writes .pak + .pak.idx."""
    index = []
    with open(pak_path, "wb") as blob:
        offset = 0
        for key, data in records:
            blob.write(data)
            index.append((key, offset, len(data)))
            offset += len(data)
    with open(pak_path + ".idx", "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(index)))
        for key, off, length in index:
            kb = key.encode("utf-8")
            f.write(struct.pack("<I", len(kb)))
            f.write(kb)
            f.write(struct.pack("<QQ", off, length))


def read_pak_index(pak_path: str) -> Dict[str, Tuple[int, int]]:
    index = {}
    with open(pak_path + ".idx", "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"bad pak index magic in {pak_path}.idx")
        (count,) = struct.unpack("<Q", f.read(8))
        for _ in range(count):
            (klen,) = struct.unpack("<I", f.read(4))
            key = f.read(klen).decode("utf-8")
            off, length = struct.unpack("<QQ", f.read(16))
            index[key] = (off, length)
    return index


def make_pak_from_folder(folder: str, pak_path: str, suffix=("png", "jpg",
                                                             "jpeg", "bmp")):
    """Pack a folder of images (replaces make_lmdb_from_imgs,
    lmdb_util.py:9-153)."""
    from .misc import scandir
    paths = sorted(scandir(folder, suffix=suffix, recursive=True))

    def gen():
        for rel in paths:
            with open(osp.join(folder, rel), "rb") as f:
                yield rel, f.read()

    write_pak(gen(), pak_path)
    return len(paths)


class _PakBackend:
    def __init__(self, pak_path: str):
        self.pak_path = pak_path
        self.index = read_pak_index(pak_path)
        self._native = None
        try:
            from ..native.pakio import NativePakReader
            self._native = NativePakReader(pak_path)
        except Exception:
            self._fh = open(pak_path, "rb")

    def get(self, key: str) -> bytes:
        off, length = self.index[key]
        if self._native is not None:
            return self._native.read(off, length)
        self._fh.seek(off)
        return self._fh.read(length)

    def keys(self):
        return self.index.keys()


class _LmdbBackend:
    """Real-LMDB reads (ref LmdbBackend :74-131), one reader per db path.

    `client_key` selects among multiple databases the way the reference's
    (db_paths, client_keys) pairing does; keys default to 'default'.
    """

    def __init__(self, db_paths, client_keys="default"):
        from .lmdb_util import LmdbReader
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (str, bytes)):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths), (
            "client_keys and db_paths must have the same length")
        self._dbs = {k: LmdbReader(str(p))
                     for k, p in zip(client_keys, db_paths)}

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        value = self._dbs[client_key].get(str(filepath))
        if value is None:
            raise KeyError(f"key {filepath!r} not found in lmdb "
                           f"'{client_key}'")
        return value

    def keys(self, client_key: str = "default"):
        return [k.decode("ascii") for k in self._dbs[client_key].keys()]


class _MemcachedBackend:
    """Memcached read backend (ref file_client.py:19-55): gated on the
    proprietary `mc` client the reference also requires; configs that name
    it fail with the same actionable ImportError instead of a KeyError."""

    def __init__(self, server_list_cfg: str, client_cfg: str,
                 sys_path: Optional[str] = None):
        if sys_path is not None:
            import sys
            sys.path.append(sys_path)
        try:
            import mc
        except ImportError:
            raise ImportError(
                "Please install memcached to enable MemcachedBackend.")
        self._mc = mc
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg,
                                                      client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath: str) -> bytes:
        self._client.Get(str(filepath), self._mc_buffer)
        return self._mc.ConvertBuffer(self._mc_buffer)


class FileClient:
    """Unified client (ref file_client.py:132-167)."""

    def __init__(self, backend: str = "disk", **kwargs):
        self.backend = backend
        if backend == "disk":
            self._client = None
        elif backend == "memcached":
            self._client = _MemcachedBackend(
                kwargs["server_list_cfg"], kwargs["client_cfg"],
                kwargs.get("sys_path"))
        elif backend == "lmdb":
            path = kwargs.get("db_paths") or kwargs.get("pak_path")
            self._client = _LmdbBackend(
                path, kwargs.get("client_keys", "default"))
        elif backend == "pak":
            path = kwargs.get("db_paths") or kwargs.get("pak_path")
            if isinstance(path, (list, tuple)):
                path = path[0]
            self._client = _PakBackend(path)
        else:
            raise ValueError(f"unsupported file backend {backend}")

    def get(self, filepath: str, client_key: Optional[str] = None) -> bytes:
        if self.backend == "disk":
            with open(filepath, "rb") as f:
                return f.read()
        if self.backend == "lmdb" and client_key is not None:
            return self._client.get(filepath, client_key)
        return self._client.get(filepath)
