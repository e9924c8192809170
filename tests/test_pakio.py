"""pak store tests: python writer/reader + native C++ reader round trip."""

import numpy as np
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
