"""Minimal batching loader with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(reference train_network.py:40-133): stacks numpy example dicts into
batches; sharding across hosts is a slice of the global index space
(``shard_id``/``num_shards``), the TPU-native analog of
DistributedSampler.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 drop_last: bool = True, prefetch: int = 2,
                 num_workers: int = 4, collate_hook=None):
        # collate_hook(examples) -> examples runs before stacking (e.g.
        # Mix3d, reference point_collate_fn pointcept/datasets/utils.py:61)
        self.collate_hook = collate_hook
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self._pool = None

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        # pad so every shard sees the same number of batches
        per_shard = -(-n // self.num_shards)
        idx = np.resize(idx, per_shard * self.num_shards)
        return idx[self.shard_id::self.num_shards]

    def _stack(self, examples) -> Dict[str, np.ndarray]:
        out = {}
        for k in examples[0]:
            if isinstance(examples[0][k], dict):
                out[k] = self._stack([e[k] for e in examples])
            else:
                out[k] = np.stack([e[k] for e in examples])
        return out

    def _fetch(self, sel) -> Dict[str, np.ndarray]:
        if self.num_workers > 1 and len(sel) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.num_workers)
            examples = list(self._pool.map(
                lambda i: self.dataset[int(i)], sel))
        else:
            examples = [self.dataset[int(i)] for i in sel]
        if self.collate_hook is not None:
            examples = self.collate_hook(examples)
        return self._stack(examples)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else \
            -(-len(idx) // self.batch_size)
        for b in range(nb):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(sel) == 0:
                break
            yield self._fetch(sel)

    def __iter__(self):
        """Infinite iterator over epochs with background prefetch."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            epoch = 0
            while not stop.is_set():
                for batch in self.epoch(epoch):
                    if stop.is_set():
                        return
                    q.put(batch)
                epoch += 1

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
