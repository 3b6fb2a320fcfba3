"""Multi-host initialization (SURVEY.md §5: the reference has no distributed
communication backend; the TPU equivalent is jax.distributed over DCN with
XLA collectives over ICI).

On Cloud TPU pods `initialize()` with no args auto-discovers the coordinator;
elsewhere pass coordinator_address/num_processes/process_id explicitly.
After init, build the global mesh with `parallel.make_mesh` over
jax.devices() (all hosts' devices) — per-host data loading should shard by
`jax.process_index()`.
"""

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed init; returns (process_id, num_processes)."""
    if num_processes is not None or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process (no coordinator available)
    return jax.process_index(), jax.process_count()


def host_batch_slice(global_batch, *, process_index=None, process_count=None):
    """The slice of a global batch this host should load."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per_host = global_batch // pc
    return slice(pi * per_host, (pi + 1) * per_host)
