"""Threaded prefetching loader: host IO/augmentation overlapped with device
compute.

Replaces the reference's multi-worker torch DataLoader + CPU C++ collation
(datasets/dataloader.py:459-472, num_workers=10).  Because the pyramid now
builds ON DEVICE, host work is only file IO + augmentation + padding, so a
small thread pool keeps the TPU fed; batches are assembled into PairBatch
pytrees and handed to jit.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from pcrcg_tpu.data.pair import PairBatch, make_pair_batch


class PairLoader:
    """Iterates PairBatch over a dataset of sample dicts.

    epoch order is shuffled with ``rng`` when shuffle=True; incomplete
    trailing batches are dropped (static shapes)."""

    def __init__(
        self,
        dataset,
        budget: int,
        batch_size: int = 1,
        shuffle: bool = False,
        num_threads: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        image_keys: Sequence[str] = ("colors", "depths", "world2cam", "valid_maps", "intrinsics"),
    ):
        self.dataset = dataset
        self.budget = budget
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.image_keys = image_keys

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _make_batch(self, indices) -> tuple[PairBatch, Optional[dict]]:
        samples = [self.dataset[int(i)] for i in indices]
        batch = make_pair_batch(samples, self.budget, rng=self.rng)
        images = None
        if all(k in samples[0] for k in self.image_keys):
            images = {
                k: np.stack([s[k] for s in samples]) for k in self.image_keys
            }
        return batch, images

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)
        ]
        if self.num_threads <= 1:
            for b in batches:
                yield self._make_batch(b)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    out_q.put(self._make_batch(b))
            except Exception as e:  # surface loader errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
