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
                 num_workers: int = 4, collate_hook=None,
                 pad_shards: bool = True):
        # collate_hook(examples) -> examples runs before stacking (e.g.
        # Mix3d, reference point_collate_fn pointcept/datasets/utils.py:61)
        # pad_shards=True (training/SPMD val): every shard is resized to
        # the same length so all hosts enter the same number of global
        # steps. pad_shards=False (standalone eval): shards are the raw
        # (possibly uneven) index slices — no example is evaluated twice;
        # combine per-host means with parallel.all_reduce_mean(weight=n).
        self.collate_hook = collate_hook
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.pad_shards = pad_shards
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self._pool = None

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        if not self.pad_shards:
            return idx[self.shard_id::self.num_shards]
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

    def _epoch_sels(self, epoch: int):
        idx = self._epoch_indices(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else \
            -(-len(idx) // self.batch_size)
        for b in range(nb):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(sel) == 0:
                break
            yield sel

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        for sel in self._epoch_sels(epoch):
            yield self._fetch(sel)

    def batches_per_epoch(self) -> int:
        per_shard = -(-len(self.dataset) // self.num_shards)
        return per_shard // self.batch_size if self.drop_last else \
            -(-per_shard // self.batch_size)

    def iter_from(self, global_step: int = 0):
        """Infinite prefetching iterator positioned at batch
        ``global_step`` of the deterministic (seeded per-epoch) stream —
        a resumed run replays exactly the batches an uninterrupted run
        would have seen (the reference's epoch-seeded DistributedSampler
        semantics; needed for bit-exact resume)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        bpe = max(1, self.batches_per_epoch())
        epoch0, offset = divmod(max(0, int(global_step)), bpe)

        def worker():
            epoch = epoch0
            skip = offset
            while not stop.is_set():
                for sel in self._epoch_sels(epoch):
                    if skip > 0:        # index-only skip, no fetch cost
                        skip -= 1
                        continue
                    if stop.is_set():
                        return
                    q.put(self._fetch(sel))
                epoch += 1

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()

    def __iter__(self):
        """Infinite iterator over epochs with background prefetch."""
        return self.iter_from(0)
