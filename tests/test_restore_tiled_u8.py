"""Device-IO tiled restore (Restorer.restore_tiled_u8)."""

import numpy as np
import pytest

from image_restoration_tpu.infer import Restorer

SMALL_SRVGG = dict(type="SRVGGNetCompact", num_feat=16, num_conv=2,
                   upscale=4)


@pytest.fixture(scope="module")
def srvgg_restorer():
    return Restorer(SMALL_SRVGG, mean=(0, 0, 0), std=(1, 1, 1),
                    out_min_max=(0, 1))


def test_restore_tiled_u8_matches_float(srvgg_restorer, rng):
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    want = srvgg_restorer.restore_tiled(
        img.astype(np.float32) / 255.0, tile=16, halo=4, scale=4,
        tile_batch=4)
    got = srvgg_restorer.restore_tiled_u8(img, tile=16, halo=4, scale=4,
                                          tile_batch=4)
    assert got.dtype == np.uint8 and got.shape == want.shape == (160, 224, 3)
    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1, f"max dev {d.max()}"


def test_restore_tiled_u8_rejects_float(srvgg_restorer, rng):
    with pytest.raises(TypeError):
        srvgg_restorer.restore_tiled_u8(
            rng.random((32, 32, 3)).astype(np.float32))


def test_restore_tiled_u8_data_parallel(rng):
    """Tile grid sharded over the CPU mesh must match single-device."""
    single = Restorer(SMALL_SRVGG, mean=(0, 0, 0), std=(1, 1, 1),
                      out_min_max=(0, 1))
    dp = Restorer(SMALL_SRVGG, mean=(0, 0, 0), std=(1, 1, 1),
                  out_min_max=(0, 1), data_parallel=4)
    # identical weights
    dp.variables = single.variables
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    a = single.restore_tiled_u8(img, tile=16, halo=4, scale=4, tile_batch=4)
    b = dp.restore_tiled_u8(img, tile=16, halo=4, scale=4, tile_batch=4)
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.max() <= 1, f"max dev {d.max()}"
