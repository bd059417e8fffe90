"""Batch-aligned random sampling with a shared per-batch feature index.

Behavioral contract: /root/reference/dust3r/datasets/base/batched_sampler.py
(every sample in a batch shares one aspect-ratio index - the key to
shape-stable XLA batches; epoch-seeded; rank slices aligned to batch
boundaries for data-parallel sharding, SURVEY.md §2.9).
"""
from __future__ import annotations

import numpy as np


def round_by(total, multiple, up=False):
    if up:
        total = total + multiple - 1
    return (total // multiple) * multiple


class BatchedRandomSampler:
    """Yields (sample_idx, feat_idx) tuples; each consecutive run of
    `batch_size` indices shares one feat_idx (e.g. the AR bucket)."""

    def __init__(self, dataset, batch_size, pool_size, world_size=1, rank=0,
                 drop_last=True):
        self.batch_size = batch_size
        self.pool_size = pool_size
        self.len_dataset = N = len(dataset)
        self.total_size = round_by(N, batch_size * world_size) \
            if drop_last else N
        assert world_size == 1 or drop_last, \
            "must drop the last batch in distributed mode"
        self.world_size = world_size
        self.rank = rank
        self.epoch = None

    def __len__(self):
        return self.total_size // self.world_size

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        if self.epoch is None:
            assert self.world_size == 1 and self.rank == 0, \
                "use set_epoch() in distributed mode"
            seed = int(np.random.SeedSequence().entropy % (2 ** 63))
        else:
            seed = self.epoch + 777
        rng = np.random.default_rng(seed=seed)

        sample_idxs = np.arange(self.total_size)
        rng.shuffle(sample_idxs)

        n_batches = (self.total_size + self.batch_size - 1) // self.batch_size
        feat_idxs = rng.integers(self.pool_size, size=n_batches)
        feat_idxs = np.broadcast_to(feat_idxs[:, None],
                                    (n_batches, self.batch_size))
        feat_idxs = feat_idxs.ravel()[:self.total_size]

        idxs = np.c_[sample_idxs, feat_idxs]

        # rank slice aligned to batch boundaries
        size_per_proc = self.batch_size * (
            (self.total_size + self.world_size * self.batch_size - 1)
            // (self.world_size * self.batch_size))
        idxs = idxs[self.rank * size_per_proc:(self.rank + 1) * size_per_proc]
        yield from (tuple(idx) for idx in idxs)
