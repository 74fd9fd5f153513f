"""Batched, prefetching data loader (host side).

Replaces the reference's torch DataLoader + worker subprocesses
(trainer.py:112-127). Three worker modes:

  * mode='thread' — a thread pool maps `dataset.sample(idx, rng)` over
    the deterministic sampler stream (cv2/numpy/PIL release the GIL for
    the heavy work);
  * mode='process' — spawn-based worker processes (the reference's
    num_workers model) for hosts where the GIL-bound share of the
    sample cost limits thread scaling. 'spawn' (not fork) so workers
    never inherit the parent's TPU client;
  * mode='grain' — grain.python.DataLoader (the multi-host-ready input
    stack: per-process sharding, checkpointable iterators) at batch
    granularity, bit-identical batches to the other modes.

Per-sample RNG: seeded as hash(seed, global_sample_position) so the
stream is bit-identical across worker counts, scheduling orders, AND
modes — stronger determinism than the reference's unseeded per-worker
np.random (SURVEY.md §5 determinism note).

Throughput (measured, PERFORMANCE.md "Host input pipeline"): one
sample of the InstaOrderNet_o recipe costs ~17 ms on one core (PNG
decode dominates), so the 42 ms/step device bound (766 samples/s at
batch 32) needs ~13 cores; this sandbox exposes a single core, real
v5e hosts have dozens per chip.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from .datasets import collate

# process-mode worker state (one dataset per worker process)
_WORKER = {}


def _worker_init(dataset):
    _WORKER['ds'] = dataset


def _worker_sample(args):
    seed, pos, idx = args
    rng = np.random.RandomState((seed * 1_000_003 + pos) % (2 ** 31 - 1))
    return _WORKER['ds'].sample(int(idx), rng)


try:                                   # optional third worker mode
    import grain.python as _gp
except ImportError:                    # pragma: no cover - grain is baked
    _gp = None

if _gp is not None:
    class _GrainBatchTransform(_gp.MapTransform):
        """grain transform: batch number -> collated batch, each sample
        drawn with the SAME position-seeded RNG as the thread/process
        modes (bit-identical batches across all three). One grain
        record == one whole batch: grain shards *records* across its
        worker processes and batches within each shard, which would
        change the batch composition — at batch granularity the shard
        interleaving only pipelines whole batches, and grain's
        deterministic output order preserves the batch order. The
        RangeDataSource element IS the batch number (no shuffle/shard).
        Module-level so grain's worker processes can pickle it."""

        def __init__(self, dataset, indices, seed, batch_size):
            self._ds = dataset
            self._idx = indices
            self._seed = seed
            self._bs = batch_size

        def map(self, b):
            samples = []
            for pos in range(int(b) * self._bs, (int(b) + 1) * self._bs):
                rng = np.random.RandomState(
                    (self._seed * 1_000_003 + pos) % (2 ** 31 - 1))
                samples.append(self._ds.sample(int(self._idx[pos]), rng))
            return collate(samples)


class DataLoader:
    def __init__(self, dataset, sampler, batch_size, num_workers=4,
                 prefetch=4, seed=0, mode='thread'):
        assert mode in ('thread', 'process', 'grain'), mode
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.mode = mode

    def _make_pool(self):
        if self.mode == 'process':
            import multiprocessing as mp
            return ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context('spawn'),
                initializer=_worker_init, initargs=(self.dataset,))
        return ThreadPoolExecutor(self.num_workers)

    def _iter_grain(self):
        """grain-backed pipeline (multi-host-ready input stack): same
        sampler stream, position-seeded RNG, and stacked-dict batches as
        the thread/process modes — bit-identical by construction
        (tests/test_data_layer.py::test_loader_grain_mode_matches_
        thread_mode)."""
        if _gp is None:
            raise RuntimeError("mode='grain' requires the grain package")
        indices = np.asarray(list(self.sampler), np.int64)
        nb = len(indices) // self.batch_size
        if nb == 0:
            return
        loader = _gp.DataLoader(
            data_source=_gp.RangeDataSource(0, nb, 1),
            sampler=_gp.IndexSampler(
                num_records=nb, shard_options=_gp.NoSharding(),
                shuffle=False, num_epochs=1),
            operations=[_GrainBatchTransform(
                self.dataset, indices[:nb * self.batch_size], self.seed,
                self.batch_size)],
            worker_count=self.num_workers,
            read_options=_gp.ReadOptions(
                prefetch_buffer_size=max(self.prefetch,
                                         self.num_workers)),
        )
        yield from loader

    def __iter__(self):
        if self.mode == 'grain':
            yield from self._iter_grain()
            return
        indices = list(self.sampler)
        n_batches = len(indices) // self.batch_size
        pool = self._make_pool()
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
                    if self.mode == 'process':
                        samples = list(pool.map(
                            _worker_sample,
                            [(self.seed, p, i) for p, i in
                             zip(positions, chunk)]))
                    else:
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
