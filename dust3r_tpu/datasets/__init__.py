"""Dataset construction + torch-free data loader.

Behavioral contract: /root/reference/dust3r/datasets/__init__.py:16-50.
The dataset DSL string ("1000 @ Co3d(...) + 100 @ ARKitScenes(...)") is
evaluated in a restricted namespace (dataset classes + numbers only - no
builtins), then wrapped in a threaded prefetching loader that collates
numpy batches ready for jnp.asarray.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from .base.base_stereo_view_dataset import BaseStereoViewDataset  # noqa: F401
from .base.batched_sampler import BatchedRandomSampler
from .co3d import Co3d, WildRGBD
from .arkitscenes import ARKitScenes, ScanNetpp
from .blendedmvs import BlendedMVS
from .megadepth import MegaDepth
from .staticthings3d import StaticThings3D
from .waymo import Waymo
from .habitat import Habitat

DATASET_CLASSES = dict(Co3d=Co3d, WildRGBD=WildRGBD, ARKitScenes=ARKitScenes,
                       BlendedMVS=BlendedMVS, MegaDepth=MegaDepth,
                       ScanNetpp=ScanNetpp, StaticThings3D=StaticThings3D,
                       Waymo=Waymo, Habitat=Habitat)


def build_dataset(dataset_str):
    """Evaluate the dataset DSL in a restricted namespace.

    Besides the dataset classes, the namespace carries the transform
    names the reference configs use bare (`transform=ColorJitter`,
    reference datasets/__init__.py:3 star-imports them)."""
    from .utils.transforms import TRANSFORM_DSL_NAMES

    namespace = {"__builtins__": {}}
    namespace.update(DATASET_CLASSES)
    namespace.update(TRANSFORM_DSL_NAMES)
    return eval(dataset_str, namespace)  # noqa: S307 - restricted namespace


def collate_views(samples):
    """[(view1, view2), ...] -> (view1_batch, view2_batch) numpy dicts."""
    n_views = len(samples[0])
    out = []
    for v in range(n_views):
        batch = {}
        keys = samples[0][v].keys()
        for k in keys:
            vals = [s[v][k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[k] = np.stack(vals)
            elif isinstance(vals[0], (int, float, np.integer, np.floating)):
                batch[k] = np.asarray(vals)
            else:
                batch[k] = list(vals)
        out.append(batch)
    return tuple(out)


class DataLoader:
    """Minimal threaded data loader over a BatchedRandomSampler.

    Replaces torch.utils.data.DataLoader: index batches come from the
    sampler (batch-aligned AR buckets); `num_workers` fetch threads fill a
    bounded prefetch queue (IO-bound PIL/cv2 work releases the GIL).
    """

    def __init__(self, dataset, batch_size, sampler=None, num_workers=4,
                 prefetch=4, collate_fn=collate_views, drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.epoch = None

    def __len__(self):
        if self.sampler is not None:
            return len(self.sampler) // self.batch_size
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self.epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _index_batches(self):
        if self.sampler is not None:
            idxs = list(self.sampler)
        else:
            idxs = list(range(len(self.dataset)))
        for i in range(0, len(idxs), self.batch_size):
            chunk = idxs[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def __iter__(self):
        batches = list(self._index_batches())
        if self.num_workers <= 0 or not batches:
            for chunk in batches:
                yield self.collate_fn([self.dataset[i] for i in chunk])
            return

        # num_workers threads pull index batches from a shared queue; a
        # reorder buffer preserves batch order; a semaphore bounds how far
        # workers run ahead of the consumer (prefetch depth).
        n_workers = min(self.num_workers, len(batches))
        tasks = queue.Queue()
        for seq, chunk in enumerate(batches):
            tasks.put((seq, chunk))
        results = {}
        errors = []
        cond = threading.Condition()
        stop = threading.Event()
        budget = threading.Semaphore(max(self.prefetch, n_workers))

        def worker():
            while not stop.is_set():
                try:
                    seq, chunk = tasks.get_nowait()
                except queue.Empty:
                    return
                budget.acquire()
                if stop.is_set():
                    budget.release()
                    return
                try:
                    out = self.collate_fn([self.dataset[i] for i in chunk])
                except BaseException as e:  # propagate to consumer
                    with cond:
                        errors.append(e)
                        cond.notify_all()
                    return
                with cond:
                    results[seq] = out
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for seq in range(len(batches)):
                with cond:
                    while seq not in results and not errors:
                        cond.wait()
                    if errors:
                        raise errors[0]
                    item = results.pop(seq)
                budget.release()
                yield item
        finally:
            stop.set()
            for _ in threads:  # unblock workers parked on the semaphore
                budget.release()


def get_data_loader(dataset, batch_size, num_workers=4, shuffle=True,
                    drop_last=True, pin_mem=True, world_size=1, rank=0):
    """Reference-compatible entry (datasets/__init__.py:16-50)."""
    if isinstance(dataset, str):
        dataset = build_dataset(dataset)
    try:
        sampler = dataset.make_sampler(batch_size, shuffle=shuffle,
                                       world_size=world_size, rank=rank,
                                       drop_last=drop_last)
    except (AttributeError, NotImplementedError):
        sampler = None
    return DataLoader(dataset, batch_size, sampler=sampler,
                      num_workers=num_workers, drop_last=drop_last)
