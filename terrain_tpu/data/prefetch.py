"""Background host->device prefetch for host-side iterators.

Double-buffers batches on a worker thread so h5 reads / C++ crops / numpy
work overlap device compute (the reference read h5 synchronously inside the
hot loop, pix2pix.py:204 -> util.py:21-41).  The device-cache path
(device_cache.py) makes this unnecessary for RAM-sized datasets; the
trainer wraps every *host* iterator path (parity h5, RasterCropIterator)
in a Prefetcher by default (TERRAIN_PREFETCH=0 opts out).
"""

import queue
import threading

import jax


class Prefetcher:
    """Wraps an iterator of host array tuples; yields device-put tuples.

    * `devices` may be a Device or a Sharding — batches are placed there on
      the worker thread (e.g. the trainer's DP batch sharding), so the
      consumer's device_put is a no-op.
    * Finite iterators terminate cleanly: exhaustion enqueues a sentinel and
      `__next__` raises StopIteration.
    * `close()` always terminates the worker, even if it is blocked on a
      full queue (puts poll the stop event), and joins it.

    Exposes the wrapped iterator's `.N` (dataset length) when present, so it
    is a drop-in for Hdf5Iterator/RasterCropIterator in the trainer.
    """

    def __init__(self, it, size=2, devices=None):
        self._it = it
        self._devices = devices
        # multi-host: the wrapped iterator yields this process's LOCAL
        # shard (HostShardIterator), so placement must assemble the global
        # array from per-process data, not device_put the shard with the
        # global sharding (which would demand global divisibility of the
        # local size — caught by the 2-process trajectory test)
        self._multi = (devices is not None
                       and isinstance(devices, jax.sharding.Sharding)
                       and jax.process_count() > 1)
        N = getattr(it, "N", None)
        if N is not None:
            self.N = N
        self._q = queue.Queue(maxsize=size)
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item):
        """Bounded put that observes close(); returns False if closed."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        try:
            for item in self._it:
                if self._stop.is_set():
                    return
                if self._multi:
                    import numpy as np

                    out = tuple(jax.make_array_from_process_local_data(
                        self._devices, np.asarray(x)) for x in item)
                else:
                    out = tuple(jax.device_put(x, self._devices)
                                for x in item)
                if not self._put(out):
                    return
            self._put(None)  # clean exhaustion -> StopIteration downstream
        except Exception as e:  # surface iterator errors on the consumer side
            self._err = e
            self._put(None)

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is None:
            self._q.put(None)  # keep raising on further next() calls
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    next = __next__

    def close(self):
        self._stop.set()
        # drain so a worker blocked on put can observe the stop event
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
