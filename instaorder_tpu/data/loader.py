"""Batched, prefetching data loader (host side).

Replaces the reference's torch DataLoader + worker subprocesses
(trainer.py:112-127): a thread pool maps `dataset.sample(idx, rng)` over
the deterministic sampler stream (cv2/numpy release the GIL for the heavy
work), collates fixed-shape numpy batches, and keeps `prefetch` batches
in flight so the device never waits on the host.

Per-sample RNG: seeded as hash(seed, global_sample_position) so the
stream is reproducible and independent of worker scheduling — stronger
determinism than the reference's unseeded per-worker np.random
(SURVEY.md §5 determinism note).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .datasets import collate


class DataLoader:
    def __init__(self, dataset, sampler, batch_size, num_workers=4,
                 prefetch=4, seed=0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed

    def __iter__(self):
        indices = list(self.sampler)
        n_batches = len(indices) // self.batch_size
        pool = ThreadPoolExecutor(self.num_workers)
        q: queue.Queue = queue.Queue(self.prefetch)
        stop = threading.Event()

        def sample_one(pos_idx):
            pos, idx = pos_idx
            rng = np.random.RandomState(
                (self.seed * 1_000_003 + pos) % (2 ** 31 - 1))
            return self.dataset.sample(int(idx), rng)

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        break
                    chunk = indices[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                    positions = range(b * self.batch_size,
                                      (b + 1) * self.batch_size)
                    samples = list(pool.map(sample_one,
                                            zip(positions, chunk)))
                    q.put(collate(samples))
                q.put(None)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)

    def __len__(self):
        return len(self.sampler) // self.batch_size
