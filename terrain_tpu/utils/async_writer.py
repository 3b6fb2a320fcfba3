"""Asynchronous artifact writer.

The reference writes ~25 PNGs + a matplotlib grid per epoch synchronously
inside the train loop (pix2pix.py:265-273), and that host time is part of
its ~100 s epochs.  Here image encoding/IO runs on a worker thread so the
TPU keeps stepping; `flush()` joins before checkpointing or exit.
"""

import queue
import threading


class AsyncWriter:
    def __init__(self, maxsize=256):
        self._q = queue.Queue(maxsize=maxsize)
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as e:  # surfaced on flush/close
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn, *args, **kwargs):
        self._q.put((fn, args, kwargs))

    def flush(self):
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self):
        self.flush()
        self._q.put(None)
        self._thread.join()
