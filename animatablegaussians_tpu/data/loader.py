"""Threaded prefetching data loader.

Replaces torch DataLoader worker processes (ref: main_avatar.py:335-339,
num_workers=8) with a thread pool decoding images + a device prefetch queue:
decode happens on host threads while the TPU runs the previous step, and
arrays are already on device (or sharded over the mesh) when the step needs
them — host-to-device transfer overlaps compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


def stack_items(items: Sequence[dict]) -> dict:
    keys = items[0].keys()
    out = {}
    for k in keys:
        vals = [np.asarray(it[k]) for it in items]
        out[k] = np.stack(vals) if vals[0].shape != () else np.asarray(vals)
    return out


class PrefetchLoader:
    """Iterates (shuffled) dataset indices, decodes batches with a thread
    pool, and keeps up to ``prefetch`` batches ready (optionally already
    transferred via ``device_put_fn``, e.g. ``parallel.shard_batch``)."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 drop_last: bool = True, num_threads: int = 8,
                 prefetch: int = 2, seed: int = 0,
                 device_put_fn: Optional[Callable] = None,
                 select_keys: Optional[Sequence[str]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self.device_put_fn = device_put_fn
        self.select_keys = select_keys
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            yield order[b * self.batch_size:(b + 1) * self.batch_size]

    def _load_batch(self, idxs) -> dict:
        items = [self.dataset[int(i)] for i in idxs]
        if self.select_keys is not None:
            items = [{k: it[k] for k in self.select_keys} for it in items]
        else:
            # drop non-array bookkeeping fields
            items = [{k: v for k, v in it.items()
                      if isinstance(v, (np.ndarray, np.floating, np.integer,
                                        float, int))} for it in items]
        batch = stack_items(items)
        if self.device_put_fn is not None:
            batch = self.device_put_fn(batch)
        return batch

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_threads) as pool:
                futures = []
                for idxs in self._index_batches():
                    if stop.is_set():
                        break
                    futures.append(pool.submit(self._load_batch, idxs))
                    # keep a bounded window of in-flight decodes
                    while len(futures) > self.num_threads:
                        q.put(futures.pop(0).result())
                        if stop.is_set():
                            return
                for f in futures:
                    if stop.is_set():
                        return
                    q.put(f.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
