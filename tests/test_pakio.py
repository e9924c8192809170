"""pak store tests: python writer/reader + native C++ reader round trip."""

import numpy as np
from os import path as osp
import pytest

from image_restoration_tpu.utils.file_client import (FileClient, write_pak,
                                                     read_pak_index)


@pytest.fixture
def pak(tmp_path, rng):
    records = [(f"img_{i}.png", rng.integers(0, 256, rng.integers(10, 500))
                .astype(np.uint8).tobytes()) for i in range(20)]
    path = str(tmp_path / "data.pak")
    write_pak(records, path)
    return path, dict(records)


def test_pak_roundtrip_python(pak):
    path, records = pak
    index = read_pak_index(path)
    assert set(index) == set(records)
    client = FileClient("pak", pak_path=path)
    for key, data in records.items():
        assert client.get(key) == data


def test_pak_native_reader(pak):
    path, records = pak
    try:
        from image_restoration_tpu.native.pakio import NativePakReader
        reader = NativePakReader(path)
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    index = read_pak_index(path)
    for key, data in records.items():
        off, length = index[key]
        assert reader.read(off, length) == data
    # threaded batch read
    keys = list(records)[:8]
    offsets = [index[k][0] for k in keys]
    lengths = [index[k][1] for k in keys]
    out = reader.read_batch(offsets, lengths)
    for k, blob in zip(keys, out):
        assert blob == records[k]


# ----------------------------------------------------------------- lmdb

def test_lmdb_write_read_roundtrip(tmp_path):
    """Dependency-free LMDB: multi-level B-tree + overflow values."""
    from image_restoration_tpu.utils.lmdb_util import LmdbReader, LmdbWriter

    rng = np.random.default_rng(0)
    items = {}
    for i in range(300):  # enough leaves to force a branch level
        items[f"img_{i:05d}"] = rng.integers(
            0, 256, rng.integers(20, 200)).astype(np.uint8).tobytes()
    items["big_blob"] = rng.integers(0, 256, 30000).astype(
        np.uint8).tobytes()  # > pagesize → overflow pages

    db = tmp_path / "toy.lmdb"
    w = LmdbWriter(str(db))
    for k, v in items.items():
        w.put(k, v)
    w.commit()

    r = LmdbReader(str(db))
    assert r.entries == len(items)
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get("missing_key") is None
    assert [k.decode() for k in r.keys()] == sorted(items)
    r.close()


def test_lmdb_through_dataset_path(tmp_path):
    """make_lmdb_from_imgs → FFHQDegradationDataset(io_backend: lmdb)."""
    import cv2
    from image_restoration_tpu.utils.lmdb_util import make_lmdb_from_imgs
    from image_restoration_tpu.data.datasets import FFHQDegradationDataset

    rng = np.random.default_rng(1)
    src = tmp_path / "imgs"
    src.mkdir()
    names = []
    for i in range(4):
        img = rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
        cv2.imwrite(str(src / f"plate_{i}.png"), img)
        names.append(f"plate_{i}.png")
    db = tmp_path / "plates.lmdb"
    n = make_lmdb_from_imgs(str(src), str(db), names,
                            [osp.splitext(p)[0] for p in names])
    assert n == 4
    assert (db / "meta_info.txt").exists()

    ds = FFHQDegradationDataset({
        "dataroot_gt": str(db),
        "io_backend": {"type": "lmdb"},
        "input_width": 24, "input_height": 20,
    })
    assert len(ds) == 4
    item = ds[2]
    assert item["gt"].shape == (20, 24, 3)
    want = cv2.imread(str(src / "plate_2.png"))[..., ::-1] / 255.0
    np.testing.assert_allclose(item["gt"], want, atol=1e-6)


class _FakeMemcachedServer:
    """In-process memcached server speaking the standard text protocol
    (the subset the read backend uses: `get`). Serves a dict."""

    def __init__(self, store):
        import socket, threading
        self.store = store
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with conn, conn.makefile("rb") as rfile:
                while True:
                    line = rfile.readline()
                    if not line:
                        break
                    parts = line.split()
                    if parts[:1] != [b"get"]:
                        conn.sendall(b"ERROR\r\n")
                        continue
                    out = b""
                    for key in parts[1:]:
                        data = self.store.get(key.decode())
                        if data is not None:
                            out += (b"VALUE %s 0 %d\r\n%s\r\n"
                                    % (key, len(data), data))
                    conn.sendall(out + b"END\r\n")

    def close(self):
        self._stop = True
        self._srv.close()


def test_memcached_backend_text_protocol(tmp_path, rng):
    """FileClient('memcached') against a real socket server: the
    dependency-free text-protocol client (used when the reference's `mc`
    binding is absent) round-trips binary values, including ones
    containing \\r\\n, and raises KeyError on a miss."""
    store = {
        "img_001.png": rng.integers(0, 256, 4096).astype(np.uint8).tobytes(),
        "crlf": b"head\r\nEND\r\ntail" * 7,
        "empty": b"",
    }
    server = _FakeMemcachedServer(store)
    try:
        cfg = tmp_path / "server_list.conf"
        cfg.write_text(f"127.0.0.1:{server.port}\n")
        client = FileClient("memcached", server_list_cfg=str(cfg),
                            client_cfg=str(tmp_path / "client.conf"))
        for key, data in store.items():
            assert client.get(key) == data
        assert client.get("img_001.png") == store["img_001.png"]  # reuse conn
        with pytest.raises(KeyError):
            client.get("missing_key")
    finally:
        server.close()
