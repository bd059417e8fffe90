"""Dataset algebra: `2 * ds`, `1000 @ ds`, `ds1 + ds2`.

Behavioral contract: /root/reference/dust3r/datasets/base/easy_dataset.py
(epoch-seeded shuffles with rotary extension, shared resolution pools).
Pure numpy / host-side - this drives the CLI dataset DSL.
"""
from __future__ import annotations

import numpy as np

from .batched_sampler import BatchedRandomSampler


class EasyDataset:
    def __add__(self, other):
        return CatDataset([self, other])

    def __rmul__(self, factor):
        return MulDataset(factor, self)

    def __rmatmul__(self, factor):
        return ResizedDataset(factor, self)

    def set_epoch(self, epoch):
        pass

    def make_sampler(self, batch_size, shuffle=True, world_size=1, rank=0,
                     drop_last=True):
        if not shuffle:
            raise NotImplementedError("sequential sampling not supported")
        return BatchedRandomSampler(
            self, batch_size, len(self._resolutions),
            world_size=world_size, rank=rank, drop_last=drop_last)


class MulDataset(EasyDataset):
    """Duplicate each element `multiplicator` times."""

    def __init__(self, multiplicator, dataset):
        assert isinstance(multiplicator, int) and multiplicator > 0
        self.multiplicator = multiplicator
        self.dataset = dataset

    def __len__(self):
        return self.multiplicator * len(self.dataset)

    def __repr__(self):
        return f"{self.multiplicator}*{self.dataset!r}"

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            idx, other = idx
            return self.dataset[idx // self.multiplicator, other]
        return self.dataset[idx // self.multiplicator]

    @property
    def _resolutions(self):
        return self.dataset._resolutions


class ResizedDataset(EasyDataset):
    """Set dataset length to `new_size` via epoch-seeded random mapping."""

    def __init__(self, new_size, dataset):
        assert isinstance(new_size, int) and new_size > 0
        self.new_size = new_size
        self.dataset = dataset

    def __len__(self):
        return self.new_size

    def __repr__(self):
        size_str = str(self.new_size)
        for i in range((len(size_str) - 1) // 3):
            sep = -4 * i - 3
            size_str = size_str[:sep] + "_" + size_str[sep:]
        return f"{size_str} @ {self.dataset!r}"

    def set_epoch(self, epoch):
        rng = np.random.default_rng(seed=epoch + 777)
        perm = rng.permutation(len(self.dataset))
        # rotary extension until target size is met
        reps = 1 + (len(self) - 1) // len(self.dataset)
        self._idxs_mapping = np.concatenate([perm] * reps)[:self.new_size]

    def __getitem__(self, idx):
        assert hasattr(self, "_idxs_mapping"), \
            "call dataset.set_epoch() before indexing a ResizedDataset"
        if isinstance(idx, tuple):
            idx, other = idx
            return self.dataset[self._idxs_mapping[idx], other]
        return self.dataset[self._idxs_mapping[idx]]

    @property
    def _resolutions(self):
        return self.dataset._resolutions


class CatDataset(EasyDataset):
    """Concatenation of datasets (with identical resolution pools)."""

    def __init__(self, datasets):
        for dataset in datasets:
            assert isinstance(dataset, EasyDataset)
        self.datasets = datasets
        self._cum_sizes = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self._cum_sizes[-1])

    def __repr__(self):
        return " + ".join(repr(d) for d in self.datasets)

    def set_epoch(self, epoch):
        for d in self.datasets:
            d.set_epoch(epoch)

    def __getitem__(self, idx):
        other = None
        if isinstance(idx, tuple):
            idx, other = idx
        if not (0 <= idx < len(self)):
            raise IndexError()
        db_idx = int(np.searchsorted(self._cum_sizes, idx, "right"))
        dataset = self.datasets[db_idx]
        new_idx = idx - (self._cum_sizes[db_idx - 1] if db_idx > 0 else 0)
        if other is not None:
            return dataset[new_idx, other]
        return dataset[new_idx]

    @property
    def _resolutions(self):
        res = self.datasets[0]._resolutions
        for d in self.datasets[1:]:
            assert tuple(d._resolutions) == tuple(res)
        return res
