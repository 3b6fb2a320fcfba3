"""Tracing / profiling (SURVEY.md §5: the reference only logged per-epoch
wall-clock, pix2pix.py:246,260 — here we add real traces).

  * `trace(dir)` — context manager around jax.profiler.trace; view with
    xprof/tensorboard.  Enabled in the trainer via TERRAIN_PROFILE=<dir>
    (traces the first profiled epoch).
  * `StepTimer` — cheap host-side steps/sec with device fencing.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock over N steps with a block_until_ready fence."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n=1):
        self.steps += n

    def stop(self, fence=None):
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")
