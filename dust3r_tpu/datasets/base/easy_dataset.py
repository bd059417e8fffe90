"""Dataset algebra: `2 * ds`, `1000 @ ds`, `ds1 + ds2`.

Semantics per reference dust3r/datasets/base/easy_dataset.py (epoch-seeded
shuffles with rotary extension, shared resolution pools), but organized
around a single index-mapping wrapper: every combinator only has to say how
a flat index routes to (child, child_index).
"""
from __future__ import annotations

import numpy as np

from .batched_sampler import BatchedRandomSampler


class EasyDataset:
    """Mixin giving datasets combinator operators and a sampler factory."""

    def __add__(self, other):
        return CatDataset([self, other])

    def __rmul__(self, factor):
        return MulDataset(factor, self)

    def __rmatmul__(self, new_size):
        return ResizedDataset(new_size, self)

    def set_epoch(self, epoch):
        pass  # stateless datasets have nothing to reseed

    def make_sampler(self, batch_size, shuffle=True, world_size=1, rank=0,
                     drop_last=True):
        if not shuffle:
            raise NotImplementedError("sequential sampling not supported")
        return BatchedRandomSampler(
            self, batch_size, len(self._resolutions),
            world_size=world_size, rank=rank, drop_last=drop_last)


class _IndexMapped(EasyDataset):
    """Base for combinators that route a flat index into one child."""

    def _route(self, idx):
        """-> (child_dataset, child_index)"""
        raise NotImplementedError

    def __getitem__(self, idx):
        ar = None
        if isinstance(idx, tuple):
            idx, ar = idx
        child, cidx = self._route(int(idx))
        return child[cidx if ar is None else (cidx, ar)]

    @property
    def _resolutions(self):
        # direct child access (not _route): ResizedDataset can't route
        # before set_epoch, but make_sampler needs the pool at build time
        return self.dataset._resolutions


class MulDataset(_IndexMapped):
    """Each element repeated `multiplicator` times."""

    def __init__(self, multiplicator, dataset):
        assert isinstance(multiplicator, int) and multiplicator > 0
        self.multiplicator = multiplicator
        self.dataset = dataset

    def __len__(self):
        return self.multiplicator * len(self.dataset)

    def __repr__(self):
        return f"{self.multiplicator}*{self.dataset!r}"

    def _route(self, idx):
        return self.dataset, idx // self.multiplicator


class ResizedDataset(_IndexMapped):
    """Length forced to `new_size`: epoch-seeded shuffle, repeated
    ("rotary") until the target size is covered."""

    def __init__(self, new_size, dataset):
        assert isinstance(new_size, int) and new_size > 0
        self.new_size = new_size
        self.dataset = dataset

    def __len__(self):
        return self.new_size

    def __repr__(self):
        # underscore-group large sizes: 1_000_000 @ ...
        size = str(self.new_size)
        for i in range((len(size) - 1) // 3):
            sep = -4 * i - 3
            size = size[:sep] + "_" + size[sep:]
        return f"{size} @ {self.dataset!r}"

    def set_epoch(self, epoch):
        rng = np.random.default_rng(seed=epoch + 777)
        perm = rng.permutation(len(self.dataset))
        reps = 1 + (self.new_size - 1) // len(self.dataset)
        self._mapping = np.tile(perm, reps)[:self.new_size]
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _route(self, idx):
        assert hasattr(self, "_mapping"), \
            "call set_epoch() before indexing a ResizedDataset"
        return self.dataset, int(self._mapping[idx])


class CatDataset(_IndexMapped):
    """Concatenation (resolution pools must agree)."""

    def __init__(self, datasets):
        assert all(isinstance(d, EasyDataset) for d in datasets)
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __repr__(self):
        return " + ".join(repr(d) for d in self.datasets)

    def set_epoch(self, epoch):
        for d in self.datasets:
            d.set_epoch(epoch)

    def _route(self, idx):
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        k = int(np.searchsorted(self._offsets, idx, "right")) - 1
        return self.datasets[k], idx - int(self._offsets[k])

    @property
    def _resolutions(self):
        res = self.datasets[0]._resolutions
        assert all(tuple(d._resolutions) == tuple(res)
                   for d in self.datasets[1:])
        return res
