"""Host-side data feeding: shuffled batching with background prefetch.

Replaces the reference's ``MultithreadIterator`` (``train.py:360-365``):
a thread prefetches transformed, stacked batches while the device computes;
``num_workers > 0`` fans the per-batch npz-load + augmentation work out to
forked worker processes (the GIL caps a single thread at one core — on a
TPU-VM host with ~100 cores this is the difference between the device
waiting on data and full step throughput). Fixed shapes throughout
(256^2 crops, 32^3 grids) keep XLA recompile-free.
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from .trainer import stack_examples

# fork-inherited handle so worker processes never pickle the dataset
# (set immediately before the pool forks; workers only receive indices)
_WORKER_LOADER = None


def _worker_make_batch(batch_idx):
    return _WORKER_LOADER._make_batch(batch_idx)


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        transform: Optional[Callable] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        indices: Optional[np.ndarray] = None,
        num_workers: int = 0,
    ):
        self._dataset = dataset
        self._batch_size = batch_size
        self._transform = transform
        self._shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self._drop_last = drop_last
        self._prefetch = prefetch
        self._num_workers = int(num_workers)
        self._indices = (
            np.arange(len(dataset)) if indices is None else np.asarray(indices)
        )

    def __len__(self):
        n = len(self._indices)
        if self._drop_last:
            return n // self._batch_size
        return -(-n // self._batch_size)

    def _epoch_indices(self):
        idx = self._indices.copy()
        if self._shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batch(self, batch_idx):
        if hasattr(self._dataset, "load_batch"):
            # packed fast path: one fancy-indexed memmap read + vectorized
            # transform — no per-example npz decode (see datasets/packed.py)
            try:
                batch = self._dataset.load_batch(batch_idx)
            except AttributeError:
                batch = None  # wrapper whose child lacks the fast path
            if batch is not None:
                if self._transform is None:
                    return batch
                if hasattr(self._transform, "batch"):
                    return self._transform.batch(batch)
                examples = [
                    self._transform({k: v[i] for k, v in batch.items()})
                    for i in range(len(batch_idx))
                ]
                return stack_examples(examples)
        examples = []
        for i in batch_idx:
            ex = self._dataset[int(i)]
            if self._transform is not None:
                ex = self._transform(ex)
            examples.append(ex)
        return stack_examples(examples)

    def _batch_index_list(self, idx):
        out = []
        for b in range(len(self)):
            lo = b * self._batch_size
            batch_idx = idx[lo : lo + self._batch_size]
            if self._drop_last and len(batch_idx) < self._batch_size:
                break
            out.append(batch_idx)
        return out

    def __iter__(self) -> Iterator[dict]:
        if self._num_workers > 0:
            yield from self._iter_multiprocess()
            return
        idx = self._epoch_indices()
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def worker():
            for b in range(n_batches):
                if stop.is_set():
                    return
                lo = b * self._batch_size
                batch_idx = idx[lo : lo + self._batch_size]
                if self._drop_last and len(batch_idx) < self._batch_size:
                    break
                try:
                    q.put(self._make_batch(batch_idx))
                except Exception as e:  # surface loader errors to the consumer
                    q.put(e)
                    return
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_multiprocess(self) -> Iterator[dict]:
        """Fan per-batch loading out to forked worker processes.

        Workers receive only index arrays (the dataset rides the fork
        image, never pickled); ``imap`` keeps epoch order, so results are
        bit-identical to the serial path for a given seed. Deterministic
        per-example augmentation RNG must be derived from the example
        index (the ReIndexed datasets do this) — fork duplicates any
        global RNG state into every worker.
        """
        global _WORKER_LOADER
        batches = self._batch_index_list(self._epoch_indices())
        ctx = multiprocessing.get_context("fork")
        _WORKER_LOADER = self
        pool = ctx.Pool(self._num_workers)
        try:
            yield from pool.imap(
                _worker_make_batch, batches, chunksize=1
            )
        finally:
            pool.terminate()
            pool.join()
            _WORKER_LOADER = None
