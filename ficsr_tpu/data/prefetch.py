"""Host-side batch prefetching (the TPU-native replacement for the
reference's DataLoader worker processes, `train.py:145`, `--n_cpu`).

A producer thread (with a decode thread pool) keeps a small queue of
ready uint8 batches so PNG decode overlaps device compute — the device
step never waits on PIL.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np

__all__ = ["prefetch_batches"]

_STOP = object()


def prefetch_batches(dataset, batch_size: int, epoch: int,
                     num_workers: int = 2, depth: int = 4
                     ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yields stacked (A_u8 (B,H,W), B_u8 (B,H,W)) batches for one epoch,
    decoded by `num_workers` threads, `depth` batches ahead."""
    order = dataset.shuffled_indices(epoch)
    n_batches = (len(order)) // batch_size
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def produce():
        try:
            with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
                for b in range(n_batches):
                    idx = order[b * batch_size:(b + 1) * batch_size]
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
