"""Deterministic host loader with background prefetch.

Replaces torch DataLoader worker processes: a thread pool builds batches ahead of
the training loop (the heavy lifting — augmentation — is numpy/scipy/cv2, which
release the GIL), with per-(seed, epoch, index) RNG so runs are reproducible
regardless of worker scheduling (cf. reference ``worker_init_fn``,
``main_synapse.py:167-168``). Double-buffered: the next device batch transfers
while the current step computes.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import numpy as np


def seeded_epoch_order(n: int, seed: int, epoch: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    return rng.permutation(n)


class Loader:
    """Iterates shuffled, batched, augmented samples for one epoch.

    ``get_sample(idx, rng)`` → dict of numpy arrays. Batches are stacked and
    (optionally) device_put by ``put_fn`` on the loader thread so transfers overlap
    compute.
    """

    def __init__(
        self,
        n_samples: int,
        get_sample: Callable[[int, np.random.Generator], Dict[str, np.ndarray]],
        batch_size: int,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 4,
        prefetch: int = 2,
        put_fn: Optional[Callable] = None,
    ):
        self.n = n_samples
        self.get_sample = get_sample
        self.bs = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.put_fn = put_fn

    def __len__(self):
        return self.n // self.bs if self.drop_last else -(-self.n // self.bs)

    def epoch(self, epoch: int) -> Iterator[Dict]:
        order = seeded_epoch_order(self.n, self.seed, epoch)
        n_batches = len(self)

        def sample_rng(idx):
            return np.random.default_rng(np.random.SeedSequence([self.seed, epoch, int(idx)]))

        def build_batch(b):
            idxs = order[b * self.bs : (b + 1) * self.bs]
            samples = [self.get_sample(int(i), sample_rng(i)) for i in idxs]
            batch = {}
            for k in samples[0]:
                v0 = samples[0][k]
                if isinstance(v0, np.ndarray):
                    batch[k] = np.stack([s[k] for s in samples])
                else:
                    batch[k] = [s[k] for s in samples]
            if self.put_fn is not None:
                batch = self.put_fn(batch)
            return batch

        # Real worker pool (the reference uses 11 DataLoader workers,
        # main_synapse.py:170-178): each batch is one pool task; the scipy/cv2
        # augmentation kernels release the GIL, so threads overlap. Determinism is
        # index-keyed RNG, so completion order can't change the data. Batches are
        # yielded strictly in order; at most ``prefetch`` finished batches plus the
        # in-flight tasks are buffered ahead of the consumer.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(self.num_threads, 1)) as pool:
            window = max(self.num_threads, 1) + self.prefetch
            futures = {b: pool.submit(build_batch, b) for b in range(min(window, n_batches))}
            next_submit = len(futures)
            try:
                for b in range(n_batches):
                    batch = futures.pop(b).result()
                    if next_submit < n_batches:
                        futures[next_submit] = pool.submit(build_batch, next_submit)
                        next_submit += 1
                    yield batch
            finally:
                for f in futures.values():
                    f.cancel()
