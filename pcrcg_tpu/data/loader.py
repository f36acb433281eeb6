"""Threaded prefetching loader: host IO/augmentation overlapped with device
compute.

Replaces the reference's multi-worker torch DataLoader + CPU C++ collation
(datasets/dataloader.py:459-472, num_workers=10).  Because the pyramid now
builds ON DEVICE, host work is file IO + augmentation + padding — plus PNG
decodes and SuperGlue npz parsing on the image path, which is why
``num_threads`` workers build batches CONCURRENTLY (ordered output, bounded
prefetch).  Randomness is drawn from per-batch spawned generators, so the
epoch's data is deterministic for a given seed regardless of num_threads.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

from pcrcg_tpu.data.pair import PairBatch, make_pair_batch


class PairLoader:
    """Iterates PairBatch over a dataset of sample dicts.

    epoch order is shuffled with ``rng`` when shuffle=True; incomplete
    trailing batches are dropped (static shapes).  Evaluation protocols
    must score EVERY pair (reference lib/benchmark.py:271-337 walks the
    full split) — construct eval loaders with ``drop_last=False``, which
    refuses ragged splits instead of silently dropping the tail."""

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
        drop_last: bool = True,
    ):
        if not drop_last and len(dataset) % batch_size != 0:
            raise ValueError(
                f"drop_last=False but len(dataset)={len(dataset)} is not a "
                f"multiple of batch_size={batch_size}: the trailing "
                f"{len(dataset) % batch_size} pair(s) would be silently "
                "dropped.  Use batch_size=1 (or a divisor of the split) "
                "for evaluation."
            )
        self.dataset = dataset
        self.budget = budget
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self.rng = np.random.default_rng(seed)  # epoch shuffles only (main thread)
        self.image_keys = image_keys
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _get_sample(self, index: int, rng: np.random.Generator):
        # Datasets whose __getitem__ draws randomness (augmentation, point
        # caps) expose ``get(item, rng)`` so concurrent workers never share a
        # generator; plain map-style datasets fall back to __getitem__.
        get = getattr(self.dataset, "get", None)
        if get is not None:
            return get(index, rng)
        return self.dataset[index]

    def _make_batch(self, indices, rng: np.random.Generator) -> tuple[PairBatch, Optional[dict]]:
        samples = [self._get_sample(int(i), rng) for i in indices]
        batch = make_pair_batch(samples, self.budget, rng=rng)
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
        # One independent generator per batch: deterministic in (seed, epoch,
        # batch index) and safe to use from any worker thread.
        ss = np.random.SeedSequence(entropy=(self.seed, self._epoch))
        rngs = [np.random.default_rng(child) for child in ss.spawn(n_batches)]
        self._epoch += 1
        if self.num_threads <= 1 or n_batches <= 1:
            for b, r in zip(batches, rngs):
                yield self._make_batch(b, r)
            return

        # Ordered concurrent prefetch: up to num_threads batches build in
        # parallel, at most num_threads+prefetch results/futures outstanding.
        executor = ThreadPoolExecutor(
            max_workers=self.num_threads, thread_name_prefix="pairloader"
        )
        try:
            from collections import deque

            window = self.num_threads + self.prefetch
            futures: deque = deque()
            next_submit = 0
            while next_submit < n_batches and len(futures) < window:
                futures.append(
                    executor.submit(self._make_batch, batches[next_submit], rngs[next_submit])
                )
                next_submit += 1
            while futures:
                item = futures.popleft().result()  # re-raises worker errors
                if next_submit < n_batches:
                    futures.append(
                        executor.submit(
                            self._make_batch, batches[next_submit], rngs[next_submit]
                        )
                    )
                    next_submit += 1
                yield item
        finally:
            executor.shutdown(wait=False, cancel_futures=True)
