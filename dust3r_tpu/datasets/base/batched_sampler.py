"""Batch-aligned random sampling with a shared per-batch feature index.

Behavioral contract: /root/reference/dust3r/datasets/base/batched_sampler.py
(every sample in a batch shares one feature index - here the AR bucket,
which is what keeps XLA batches shape-stable; epoch-seeded determinism so
all ranks derive the same global plan; rank slices aligned to batch
boundaries for data-parallel sharding, SURVEY.md §2.9).

Design: an epoch is materialized as a batch MATRIX - a permutation of the
usable sample ids reshaped to (n_batches, batch_size) plus one bucket draw
per batch row - and each rank walks its contiguous row range. This makes
the two invariants (uniform bucket within a batch, batch-aligned rank
shards) structural instead of index arithmetic.
"""
from __future__ import annotations

import numpy as np

# epoch seeds must be identical on every rank; any fixed offset works, but
# it must match what ranks expect from each other forever (checkpointed
# runs resume mid-schedule) - keep the reference's epoch offset
_EPOCH_SEED_OFFSET = 777


class BatchedRandomSampler:
    """Yields (sample_idx, feat_idx) tuples; each consecutive run of
    `batch_size` indices shares one feat_idx (e.g. the AR bucket)."""

    def __init__(self, dataset, batch_size, pool_size, world_size=1, rank=0,
                 drop_last=True):
        assert world_size == 1 or drop_last, \
            "must drop the last batch in distributed mode"
        self.batch_size = batch_size
        self.pool_size = pool_size
        self.len_dataset = len(dataset)
        self.world_size = world_size
        self.rank = rank
        self.drop_last = drop_last
        self.epoch = None

        # usable samples per epoch: whole batches divisible across ranks
        # (drop_last), or everything incl. a ragged tail batch (single rank)
        full = self.len_dataset // (batch_size * world_size)
        if drop_last:
            self.total_size = full * batch_size * world_size
        else:
            self.total_size = self.len_dataset
        self.n_batches = -(-self.total_size // batch_size)
        self.batches_per_rank = -(-self.n_batches // world_size)

    def __len__(self):
        return self.total_size // self.world_size

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _epoch_rng(self):
        if self.epoch is None:
            assert self.world_size == 1 and self.rank == 0, \
                "use set_epoch() in distributed mode"
            return np.random.default_rng()
        return np.random.default_rng(seed=self.epoch + _EPOCH_SEED_OFFSET)

    def _epoch_plan(self, rng):
        """The global epoch plan, identical on every rank: a permuted list
        of sample ids (conceptually reshaped (n_batches, batch_size); the
        tail row may be ragged when not drop_last) and one feature/bucket
        draw per batch row."""
        samples = rng.permutation(self.total_size)
        buckets = rng.integers(self.pool_size, size=self.n_batches)
        return samples, buckets

    def __iter__(self):
        samples, buckets = self._epoch_plan(self._epoch_rng())
        first = self.rank * self.batches_per_rank
        for b in range(first, min(first + self.batches_per_rank,
                                  self.n_batches)):
            row = samples[b * self.batch_size:(b + 1) * self.batch_size]
            feat = int(buckets[b])
            for s in row:
                yield int(s), feat
