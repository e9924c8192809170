"""Batching + prefetching data loader.

Replaces the reference's torch DataLoader + EnlargedSampler + prefetchers
(basicsr/data/__init__.py:40-96, data_sampler.py:6-48,
prefetch_dataloader.py:7-125):
  * EnlargedSampler semantics — epoch-seeded shuffle over
    len(dataset)·enlarge_ratio, strided by process index so each host reads
    a disjoint shard (multi-host DP),
  * a background thread pool decodes/augments samples and assembles
    pinned numpy batches (the reference's worker processes),
  * device transfer overlaps with compute (the CUDAPrefetcher analog —
    jax dispatch is async, so handing the next batch to jit while the
    previous step runs gives the same pipelining).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class EnlargedSampler:
    """Index stream: rank-strided, epoch-seeded shuffle, enlarge ratio.

    Ref data_sampler.py:6-48.
    """

    def __init__(self, num_samples: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 1):
        self.num_samples_total = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.per_rank = int(np.ceil(num_samples * ratio / num_replicas))
        self.total_size = self.per_rank * num_replicas
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        g = np.random.default_rng(self.epoch)
        indices = g.permutation(self.total_size)
        indices = indices % self.num_samples_total
        return indices[self.rank:self.total_size:self.num_replicas]


class DataLoader:
    """Thread-prefetching batch loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, sampler=None,
                 shuffle: bool = False, num_workers: int = 2,
                 drop_last: bool = True, prefetch: int = 3,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = (self.sampler.per_rank if self.sampler is not None
             else len(self.dataset))
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _index_stream(self):
        if self.sampler is not None:
            idx = self.sampler.indices()
        elif self.shuffle:
            g = np.random.default_rng(self.seed + self.epoch)
            idx = g.permutation(len(self.dataset))
        else:
            idx = np.arange(len(self.dataset))
        n = len(idx)
        stop = n - n % self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            yield idx[start:start + self.batch_size]

    @staticmethod
    def _collate(samples) -> Dict:
        batch = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[key] = np.stack(vals)
            else:
                batch[key] = vals
        return batch

    def __iter__(self) -> Iterator[Dict]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_stream())
        stop = object()

        def worker():
            try:
                for batch_idx in batches:
                    samples = [self.dataset[int(i)] for i in batch_idx]
                    out_q.put(self._collate(samples))
                out_q.put(stop)
            except BaseException as e:  # propagate instead of hanging
                out_q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataloader(dataset, dataset_opt: dict, num_replicas: int = 1,
                     rank: int = 0, seed: int = 0,
                     sampler: Optional[EnlargedSampler] = None):
    """Mirror of ref data/__init__.py:40-96 policies."""
    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        if sampler is None:
            sampler = EnlargedSampler(
                len(dataset), num_replicas, rank,
                dataset_opt.get("dataset_enlarge_ratio", 1))
        return DataLoader(dataset,
                          batch_size=dataset_opt["batch_size_per_gpu"],
                          sampler=sampler,
                          num_workers=dataset_opt.get("num_worker_per_gpu",
                                                      2),
                          drop_last=True, seed=seed)
    return DataLoader(dataset, batch_size=dataset_opt.get("batch_size", 1),
                      shuffle=False, drop_last=False, num_workers=1)
