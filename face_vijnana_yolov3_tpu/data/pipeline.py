"""Host→device input pipeline: threaded prefetch with device-transfer overlap.

Replaces the reference's keras `fit_generator(workers=N, use_multiprocessing=True,
max_queue_size=...)` (reference src/space/face_detection.py:612-627) with a
thread-pool prefetcher: batches are assembled on the host (imread + letterbox +
GT build are IO/numpy-bound and release the GIL) and moved to device ahead of the
consumer, so the accelerator never waits on the host between steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax


def prefetch_batches(
    make_batch: Callable[[int], tuple],
    num_batches: int,
    *,
    prefetch: int = 2,
    device_put: bool = True,
) -> Iterator[tuple]:
    """Yield `make_batch(i)` for i in range(num_batches), produced ahead of time.

    A single worker thread keeps up to `prefetch` batches queued (with a 1-core
    host, more workers only add contention; the win is overlapping host assembly
    with device compute).
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        # Forward worker exceptions to the consumer: swallowing them would end
        # the iteration early and make a failed run (corrupt image, bad CSV row)
        # look like a successful short one — truncated solution CSVs, silently
        # shortened epochs.
        try:
            for i in range(num_batches):
                batch = make_batch(i)
                if device_put:
                    batch = jax.device_put(batch)
                q.put(batch)
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            t.join()
            raise item
        yield item
    t.join()
