"""Data-parallel serving: Restorer(data_parallel=N) shards restore_batch
over an N-device mesh (params replicated, batch split) and must reproduce
the single-device outputs, including the pad-to-multiple path."""

import numpy as np
import pytest

from image_restoration_tpu.infer import Restorer

TINY_SRVGG = dict(type="SRVGGNetCompact", num_feat=8, num_conv=2, upscale=2)
KW = dict(mean=(0, 0, 0), std=(1, 1, 1), out_min_max=(0, 1))


def test_dp_matches_single_device(rng):
    base = Restorer(TINY_SRVGG, **KW)
    dp = Restorer(TINY_SRVGG, data_parallel=4, **KW)
    # both init from PRNGKey(0) → identical weights; dp's copy is the
    # device_put-replicated one, which must stay intact
    imgs = rng.random((6, 16, 16, 3)).astype(np.float32)  # 6 % 4 != 0
    want = base.restore_batch(imgs)
    got = dp.restore_batch(imgs)
    assert got.shape == want.shape == (6, 32, 32, 3)
    # identical math modulo reduction-order ulps; uint8 within 1 count
    assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1


def test_dp_tiled_matches_single_device(rng):
    base = Restorer(TINY_SRVGG, **KW)
    dp = Restorer(TINY_SRVGG, data_parallel=4, **KW)
    img = rng.random((40, 56, 3)).astype(np.float32)  # non-square, odd grid
    want = base.restore_tiled(img, tile=16, halo=4, scale=2, tile_batch=3)
    got = dp.restore_tiled(img, tile=16, halo=4, scale=2, tile_batch=3)
    assert got.shape == want.shape == (80, 112, 3)
    assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1


def test_dp_rejects_oversubscription():
    import jax
    with pytest.raises(ValueError, match="local devices"):
        Restorer(TINY_SRVGG, data_parallel=jax.local_device_count() + 1,
                 **KW)
