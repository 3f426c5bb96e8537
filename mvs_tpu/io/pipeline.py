"""Host-side data pipeline: shuffling, multi-host sharding, thread prefetch.

Replaces torch DataLoader worker processes + DistributedSampler
(reference CasMVSNet/train.py:365-372, SURVEY.md §2.4 P4): samples are
sharded across hosts by jax.process_index(), decoded in background threads,
and batches are handed to jax as stacked numpy arrays (device transfer and
mesh placement happen in parallel.shard_batch).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 2,
        prefetch: int = 2,
        shard_by_process: bool = True,
        max_sample_retries: int = 3,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.shard_by_process = shard_by_process
        self.max_sample_retries = max_sample_retries
        self.epoch = 0

    def _get_sample(self, idx: int, rng: np.random.Generator):
        """Fetch one sample, substituting a random index on decode failure
        (the reference's unreadable-image retry loop,
        PointMVSNet/pointmvsnet/dataset.py:106-113)."""
        for attempt in range(self.max_sample_retries + 1):
            try:
                return self.dataset[int(idx)]
            except Exception:
                if attempt == self.max_sample_retries:
                    raise
                idx = rng.integers(0, len(self.dataset))

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        if self.shard_by_process:
            import jax

            pc = jax.process_count()
            if pc > 1:
                # Equal shards, ragged tail dropped — every host sees the
                # same number of steps (the DDP DistributedSampler contract).
                per = n // pc
                idx = idx[jax.process_index() * per:(jax.process_index() + 1) * per]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        self.epoch += 1
        nb = len(indices) // self.batch_size if self.drop_last else -(
            -len(indices) // self.batch_size
        )
        batches = [
            indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        in_q: queue.Queue = queue.Queue()
        for bi, b in enumerate(batches):
            in_q.put((bi, b))
        results: dict[int, dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that still honors `stop`: a consumer that breaks
            out of the iterator early (e.g. BN recalibration taking only a
            few batches) must not leave workers blocked in out_q.put()
            forever, holding a collated batch of host RAM each."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            rng = np.random.default_rng(self.seed + self.epoch * 7919)
            while not stop.is_set():
                try:
                    bi, b = in_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = self.collate_fn([self._get_sample(i, rng) for i in b])
                    if not put_or_stop((bi, batch)):
                        return
                except Exception as e:  # surface errors to the consumer
                    if not put_or_stop((bi, e)):
                        return

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        try:
            next_bi = 0
            received = 0
            while received < nb:
                bi, batch = out_q.get()
                received += 1
                if isinstance(batch, Exception):
                    raise batch
                with lock:
                    results[bi] = batch
                while next_bi in results:
                    yield results.pop(next_bi)
                    next_bi += 1
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=2.0)
