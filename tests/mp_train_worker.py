"""Worker for the 2-process 2-epoch training trajectory test.

Run as: python mp_train_worker.py <process_id> <port> <out_dir> [n_model]

Initializes jax.distributed (2 processes x 2 local CPU devices = 4
devices), then runs TwoStageGAN.train for 2 epochs through the REAL
multi-host path: HostShardIterator local shards assembled into global
sharded batches via jax.make_array_from_process_local_data
(trainer._put_batch), with the prior drawn per-host (trainer._sample_z).

n_model=1 (default): a 4-way 'data' mesh (pure DP across processes).
n_model=2: a 2x2 ('data','model') mesh — DP across processes, TP across
each process's two local devices (tp_min_features lowered so the tiny
nets' conv kernels genuinely shard on 'model'; asserted below).  This is
the DP+TP combination under the distributed runtime that single-process
virtual-mesh tests cannot cover (VERDICT r4 item 7).

The resulting results.txt trajectory must equal the single-process run at
the same global batch (asserted by test_multiprocess.py).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]
n_model = int(sys.argv[4]) if len(sys.argv) > 4 else 1

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["TERRAIN_ARTIFACT_EVERY"] = "999"  # no image dumps in the test

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from terrain_tpu.parallel import HostShardIterator, initialize, make_mesh  # noqa: E402
from tiny_cfg import GlobalStream, build_model, det_sampler  # noqa: E402

i, n = initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
assert (i, n) == (pid, 2), (i, n)
assert len(jax.devices()) == 4, jax.devices()
print(f"stage init ok: process {i}/{n}", flush=True)

if n_model == 1:
    mesh = make_mesh()  # 4-way 'data'
    model = build_model(mesh, det_sampler(pid))
else:
    # 2x2: 'data' spans the two processes (device order is process-major),
    # 'model' spans each process's two local devices — TP under the
    # distributed runtime.  mf=8 so the tiny conv kernels actually shard.
    mesh = make_mesh(n_data=2, n_model=n_model)
    model = build_model(mesh, det_sampler(pid), tp_min_features=8)
    from jax.sharding import NamedSharding  # noqa: E402

    def _on_model(p):
        if not isinstance(p.sharding, NamedSharding):
            return False
        return any(e == "model" or (isinstance(e, tuple) and "model" in e)
                   for e in p.sharding.spec)

    tp_leaves = [p for p in jax.tree.leaves(model.params) if _on_model(p)]
    assert tp_leaves, "no parameter actually TP-sharded on 'model'"
    print(f"stage tp ok: {len(tp_leaves)} leaves sharded on 'model'",
          flush=True)
it_train = HostShardIterator(GlobalStream())
it_val = HostShardIterator(GlobalStream())

model.train(it_train, it_val, batch_size=4, num_epochs=2,
            out_dir=out_dir, model_dir=None, save_every=999)
print("stage train ok", flush=True)

print(f"WORKER {pid} OK", flush=True)
