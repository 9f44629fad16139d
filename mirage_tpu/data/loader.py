"""Batched data loading with threaded prefetch.

Replaces torch DataLoader (run_pretraining.py:478-487: 10 workers, pinned
memory, persistent workers). TPU-native design: the loader produces fixed-
shape numpy batches on a background thread pool (PIL/numpy release the GIL
for decode/BLAS work); device transfer happens at the jit boundary via
``jax.device_put`` with a NamedSharding, so each host feeds only its
addressable shard on multi-host meshes.

Determinism: one ``np.random.Generator`` per (epoch, sample) derived from a
base seed — shuffle order and augmentation draws are reproducible and
independent of worker scheduling.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import numpy as np


def default_collate(items):
    """Stack a list of samples. Supports (dict, target, id) tuples and
    (array, target, id) tuples."""
    first = items[0]
    if isinstance(first, dict):
        return {k: np.stack([it[k] for it in items]) for k in first}
    if isinstance(first, tuple):
        return tuple(default_collate([it[i] for it in items])
                     for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if first is None:
        return None
    return np.asarray(items)


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 8,
                 seed: int = 0, collate_fn: Callable = default_collate,
                 prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1):
        """shard_index/num_shards: per-host dataset sharding for multi-host
        training (each host loads a disjoint stripe of every epoch's
        permutation)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            idx = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            idx = np.arange(n)
        if self.num_shards > 1:
            # even stripes; pad by wrapping so every shard sees equal counts
            per = -(-n // self.num_shards)
            pad = per * self.num_shards - n
            idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Any]:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch_one(i: int):
            rng_base = (self.seed, self.epoch, 1)

            def load(j):
                rng = np.random.default_rng(rng_base + (int(j),))
                return self.dataset[(int(j), rng)]

            return self.collate_fn([load(j) for j in batches[i]])

        def safe_put(item) -> bool:
            """Bounded put that wakes up when the consumer abandons the
            iterator (stop set mid-epoch) instead of blocking forever."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer(pool):
            # sliding window of in-flight batches bounds host RAM
            window = self.num_workers + self.prefetch
            try:
                futures = {}
                next_submit = 0
                for i in range(nb):
                    while next_submit < nb and next_submit < i + window:
                        futures[next_submit] = pool.submit(fetch_one, next_submit)
                        next_submit += 1
                    if not safe_put(("ok", futures.pop(i).result())):
                        return
            except BaseException as e:  # propagate to consumer
                safe_put(("err", e))
            finally:
                safe_put(("end", None))

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            t = threading.Thread(target=producer, args=(pool,), daemon=True)
            t.start()
            try:
                while True:
                    kind, item = out_q.get()
                    if kind == "end":
                        break
                    if kind == "err":
                        raise item
                    yield item
            finally:
                stop.set()
