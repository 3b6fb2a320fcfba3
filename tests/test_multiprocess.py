"""Real 2-process jax.distributed CPU test (SURVEY.md §5 distributed row).

Launches two Python processes that initialize jax.distributed against a
local coordinator, each load a disjoint `HostShardIterator` slice of a
global batch, assemble the global array via
`jax.make_array_from_process_local_data` over a 2-process mesh, and run a
cross-process collective (Gloo) — the full multi-host data path the
trainer uses, exercised for real rather than mocked.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed_data_path():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=280)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    for i, out in enumerate(outs):
        assert f"WORKER {i} OK" in out, out[-2000:]
        assert "stage collective ok" in out, out[-2000:]
