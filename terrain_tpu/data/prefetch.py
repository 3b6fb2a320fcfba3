"""Background host->device prefetch for host-side iterators.

Double-buffers batches on a worker thread so h5 reads / numpy work overlap
device compute (the reference read h5 synchronously inside the hot loop,
pix2pix.py:204 -> util.py:21-41).  The device-cache path (device_cache.py)
makes this unnecessary for RAM-sized datasets; this exists for datasets too
large to pin in HBM.
"""

import queue
import threading

import jax


class Prefetcher:
    """Wraps an iterator of host array tuples; yields device-put tuples."""

    def __init__(self, it, size=2, devices=None):
        self._it = it
        self._q = queue.Queue(maxsize=size)
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._it:
                if self._stop.is_set():
                    return
                self._q.put(tuple(jax.device_put(x) for x in item))
        except Exception as e:  # surface iterator errors on the consumer side
            self._err = e
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise self._err if self._err else StopIteration
        return item

    next = __next__

    def close(self):
        self._stop.set()
