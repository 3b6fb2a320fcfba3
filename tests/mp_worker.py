"""Worker for the 2-process jax.distributed CPU test (test_multiprocess.py).

Run as: python mp_worker.py <process_id> <port>
Prints one line per passed stage; "WORKER <i> OK" at the end.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terrain_tpu.parallel import HostShardIterator, initialize  # noqa: E402

i, n = initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
assert (i, n) == (pid, 2), (i, n)
print(f"stage init ok: process {i}/{n}", flush=True)

# per-host disjoint shard of a deterministic global batch stream
def gen():
    while True:
        yield (np.arange(8).reshape(8, 1).astype(np.float32),
               np.arange(8).reshape(8, 1).astype(np.float32) + 100)


it = HostShardIterator(iter(gen()))
x, y = next(it)
expected = np.arange(4 * pid, 4 * pid + 4, dtype=np.float32)
assert x.shape == (4, 1) and (x[:, 0] == expected).all(), x
assert (y[:, 0] == expected + 100).all()
print("stage shard ok", flush=True)

# global batch assembly + a cross-process collective (the trainer's
# _put_batch path: make_array_from_process_local_data over a global mesh)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

devs = jax.devices()
assert len(devs) == 4, devs  # 2 local x 2 processes
mesh = Mesh(np.array(devs), ("data",))
local = x  # this host's (4, 1) slice of the global (8, 1) batch
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape=(8, 1))
assert arr.shape == (8, 1)
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == float(np.arange(8).sum()), float(total)
print("stage collective ok", flush=True)

print(f"WORKER {pid} OK", flush=True)
