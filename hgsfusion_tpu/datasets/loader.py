"""Threaded prefetching batch loader.

Equivalent of the reference's torch DataLoader(num_workers, pin_memory)
(tools/train.py:117-124 build_dataloader): sample construction (numpy
augmentation, padding, collate) runs in a worker pool while the previous
batch trains on device. The index schedule and batch assembly order are
deterministic for a fixed seed (futures are consumed in schedule order);
augmentation randomness interleaves across threads, the same property the
reference's multi-worker DataLoader has.

numpy releases the GIL for array ops, so threads (not processes) capture
most of the win without pickling overhead.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


class _ProducerError:
    """Sentinel carrying a worker exception from producer to consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchLoader:
    """Iterate collated batches with background workers + prefetch queue.

    Args:
      dataset: indexable with `collate_batch(list_of_samples)`.
      batch_size: global batch size.
      shuffle: reshuffle each epoch (np.random, caller seeds).
      num_workers: sample-building threads (0 = synchronous).
      prefetch: max batches buffered ahead of the consumer.
      drop_last: drop the trailing partial batch (static shapes require it).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, prefetch: int = 2,
                 drop_last: bool = True):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.drop_last = drop_last
        # own RNG, seeded from the global stream at construction: the index
        # schedule is then deterministic for a fixed caller seed AND immune
        # to other threads (e.g. an abandoned loader's producer) racing the
        # global legacy np.random state
        self._rng = np.random.default_rng(np.random.randint(0, 2**31))

    def _epoch_order(self):
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        if self.batch_size > n:
            # global batch exceeds the dataset: top up with replacement so
            # each epoch yields at least one batch
            extra = self._rng.integers(0, n, self.batch_size - n)
            order = np.concatenate([order, extra])
        return order

    def __len__(self):
        return max(len(self.dataset), self.batch_size) // self.batch_size

    def batches(self) -> Iterator:
        """Endless batch stream (epochs concatenated), prefetched."""
        if self.num_workers <= 0:
            while True:
                order = self._epoch_order()
                for i in range(0, len(order) - self.batch_size + 1,
                               self.batch_size):
                    samples = [self.dataset[j]
                               for j in order[i:i + self.batch_size]]
                    yield self.dataset.collate_batch(samples)
            return

        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    out.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    while not stop.is_set():
                        order = self._epoch_order()
                        for i in range(0, len(order) - self.batch_size + 1,
                                       self.batch_size):
                            futs = [pool.submit(self.dataset.__getitem__, j)
                                    for j in order[i:i + self.batch_size]]
                            batch = self.dataset.collate_batch(
                                [f.result() for f in futs]
                            )
                            if not put(batch):
                                return
            except BaseException as exc:  # surface in the consumer, don't hang
                put(_ProducerError(exc))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out.get()
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "PrefetchLoader worker failed while building a batch"
                    ) from item.exc
                yield item
        finally:
            stop.set()
