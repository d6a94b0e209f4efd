"""Host-side batch prefetching (the TPU-native replacement for the
reference's DataLoader worker processes, `train.py:145`, `--n_cpu`).

A producer thread (with a decode thread pool) keeps a small queue of
ready uint8 batches so PNG decode overlaps device compute — the device
step never waits on PIL.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Tuple

import numpy as np

__all__ = ["prefetch_batches", "device_prefetch"]

_STOP = object()


def prefetch_batches(dataset, batch_size: int, epoch: int,
                     num_workers: int = 2, depth: int = 4,
                     shard: Tuple[int, int] = (0, 1)
                     ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields stacked (A_u8 (B,H,W), B_u8 (B,H,W)) batches for one epoch,
    decoded by `num_workers` threads, `depth` batches ahead.

    `shard=(process_index, process_count)` is the multi-host data path
    (SURVEY §5: data loading rides DCN, per host): `batch_size` is the
    GLOBAL batch; every host derives the same epoch-stable permutation
    (seeded by epoch only, so no cross-host coordination is needed) and
    loads only its contiguous `batch_size/process_count` rows of each
    global batch.  The union of all hosts' rows is exactly the global
    batch, in order, every epoch, deterministically.
    """
    index, count = shard
    if not 0 <= index < count:
        raise ValueError(f"shard index {index} outside [0, {count})")
    if batch_size % count:
        raise ValueError(
            f"global batch {batch_size} not divisible by {count} hosts")
    per_host = batch_size // count
    order = dataset.shuffled_indices(epoch)
    n_batches = (len(order)) // batch_size
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def produce():
        try:
            with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
                for b in range(n_batches):
                    lo = b * batch_size + index * per_host
                    idx = order[lo:lo + per_host]
                    items = list(pool.map(
                        lambda j: dataset[int(j)], idx))
                    a = np.stack([it[0] for it in items])
                    bb = np.stack([it[1] for it in items])
                    q.put((a, bb))
        except Exception as e:  # surface loader errors on the consumer
            q.put(e)
        finally:
            q.put(_STOP)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _STOP:
            break
        if isinstance(item, Exception):
            raise item
        yield item
    t.join()


def device_prefetch(host_iter: Iterable, put: Callable, depth: int = 2
                    ) -> Iterator:
    """Double-buffered device staging: dispatch `put` (H2D transfer +
    on-device preprocessing) for the next `depth` host batches *before*
    the consumer asks for them, so batch N+1's transfer/preprocess is
    already queued behind the device step on batch N.

    JAX dispatch is async, so `put` returns immediately; holding `depth`
    in-flight results keeps the transfer DMA and the preprocess program
    overlapped with step compute instead of starting them only after the
    step has been *dispatched* (host-side serialization).  `put` is
    called strictly in batch order — RNG-consuming callers keep their
    key sequence.
    """
    buf: collections.deque = collections.deque()
    it = iter(host_iter)

    def fill():
        while len(buf) < depth:
            try:
                item = next(it)
            except StopIteration:
                return
            buf.append(put(item))

    fill()
    while buf:
        out = buf.popleft()
        fill()
        yield out
