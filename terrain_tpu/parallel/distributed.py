"""Multi-host initialization + per-host data sharding (SURVEY.md §5: the
reference has no distributed communication backend; the TPU equivalent is
jax.distributed over DCN with XLA collectives over ICI).

On Cloud TPU pods `initialize()` with no args auto-discovers the coordinator;
elsewhere pass coordinator_address/num_processes/process_id explicitly.
After init, build the global mesh with `parallel.make_mesh` over
jax.devices() (all hosts' devices).  Per-host data loading:

  * wrap each host iterator in `HostShardIterator` — every process yields
    its own disjoint slice of each global batch (the trainer/experiments do
    this automatically when jax.process_count() > 1);
  * the trainer assembles the global sharded batch from the local slices
    with `jax.make_array_from_process_local_data` (see
    trainer._put_batch), which is a plain device_put in single-process.
"""

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed init; returns (process_id, num_processes).

    With explicit arguments, failures propagate (a misconfigured coordinator
    must not silently degrade to single-process).  With no arguments we try
    pod auto-discovery and fall back to single-process ONLY for the
    recognized "no coordinator configured" error; anything else — an actual
    failed initialization — is re-raised.
    """
    if num_processes is not None or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except ValueError as e:
            # "coordinator_address should be defined." — auto-discovery found
            # no cluster env: legitimate single-process operation
            if "coordinator" not in str(e).lower():
                raise
        except RuntimeError as e:
            msg = str(e).lower()
            if "already initialized" in msg:
                pass  # idempotent re-init
            elif "must be called before" in msg:
                # the XLA backend already ran computations; auto-init is
                # impossible now — continue single-process, but loudly
                # (unlike a silent bare-except, a real pod misconfig with
                # explicit args still raises above)
                import warnings

                warnings.warn(f"jax.distributed auto-init skipped: {e}",
                              RuntimeWarning, stacklevel=2)
            else:
                raise
    return jax.process_index(), jax.process_count()


def host_batch_slice(global_batch, *, process_index=None, process_count=None):
    """The slice of a global batch this host should load."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per_host = global_batch // pc
    return slice(pi * per_host, (pi + 1) * per_host)


class HostShardIterator:
    """Per-host view of a global-batch host iterator.

    Wraps an iterator of array tuples (e.g. Hdf5Iterator's (X, Y) batches)
    and yields only this process's `host_batch_slice` of every batch, so
    each host reads a disjoint shard of the global batch.  Requires all
    hosts to construct identically-seeded iterators so the global batch
    order agrees everywhere (Hdf5Iterator's slice-shuffle uses a fixed
    RandomState(0), util.py:21-26, so this holds by construction).

    Exposes the wrapped iterator's `.N` (global dataset size): step counts
    derived from it stay consistent across hosts.
    """

    def __init__(self, it, *, process_index=None, process_count=None):
        self._it = it
        self._pi = jax.process_index() if process_index is None else process_index
        self._pc = jax.process_count() if process_count is None else process_count
        N = getattr(it, "N", None)
        if N is not None:
            self.N = N

    def __iter__(self):
        return self

    def __next__(self):
        item = next(self._it)
        return tuple(
            x[host_batch_slice(x.shape[0], process_index=self._pi,
                               process_count=self._pc)]
            for x in item)

    next = __next__
