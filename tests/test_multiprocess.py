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


_TRAIN_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "mp_train_worker.py")


@pytest.mark.timeout(600)
def test_two_process_training_matches_single_process(tmp_path, monkeypatch):
    """The FULL multi-host train loop for 2 epochs (VERDICT r3 item 8):
    2 processes x 2 CPU devices each run TwoStageGAN.train over
    HostShardIterator shards + make_array_from_process_local_data, and the
    per-epoch loss trajectory must match the single-process run at the
    same global batch (the prior shards tile the same global draw,
    tiny_cfg.det_sampler).  Caught for real: _sample_z being passed the
    LOCAL batch size in the host-iterator path (double division by
    process_count -> Z desynced from X)."""
    import numpy as np

    from tiny_cfg import GlobalStream, build_model, csv_rows, det_sampler

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    dirs = [str(tmp_path / f"w{i}") for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, _TRAIN_WORKER, str(i), str(port),
                          dirs[i]],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=560)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER {i} OK" in out, out[-2000:]

    # single-process reference at the same GLOBAL batch, same init/seeds.
    # Artifact dumps must be off exactly like the workers': generate_gz
    # draws from the sampler, so a dumping reference desyncs the
    # deterministic prior stream after epoch 1.
    monkeypatch.setenv("TERRAIN_ARTIFACT_EVERY", "999")
    sdir = str(tmp_path / "single")
    model = build_model(mesh=None, sampler=det_sampler(0))
    model.train(GlobalStream(), GlobalStream(), batch_size=4, num_epochs=2,
                out_dir=sdir, model_dir=None, save_every=999)

    ref = csv_rows(os.path.join(sdir, "results.txt"))
    loss_keys = [k for k in ref[0]
                 if k.startswith(("train_", "valid_")) or k == "lr"]
    assert len(ref) == 2 and len(loss_keys) == 11
    for d in dirs:
        got = csv_rows(os.path.join(d, "results.txt"))
        assert len(got) == 2, got
        for row_ref, row_got in zip(ref, got):
            for k in loss_keys:
                # measured agreement is ~1e-6 rel (same XLA CPU topology
                # math either side); the Z-desync bug this test caught
                # showed as O(1) differences
                np.testing.assert_allclose(
                    float(row_got[k]), float(row_ref[k]),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"epoch {row_ref['epoch']} col {k} ({d})")


@pytest.mark.timeout(600)
def test_two_process_tp_training_matches_single_process(tmp_path,
                                                        monkeypatch):
    """DP+TP under the distributed runtime (VERDICT r4 item 7): the same
    2-process 2-epoch trajectory test over a 2x2 ('data','model') mesh
    with the tiny nets' conv kernels genuinely sharded on 'model'
    (tp_min_features=8; the worker asserts real TP leaves).  The
    trajectory must match the UNSHARDED single-process run — TP is a
    layout, not a math change."""
    import numpy as np

    from tiny_cfg import GlobalStream, build_model, csv_rows, det_sampler

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    dirs = [str(tmp_path / f"w{i}") for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, _TRAIN_WORKER, str(i), str(port),
                          dirs[i], "2"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=560)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER {i} OK" in out, out[-2000:]
        assert "stage tp ok" in out, out[-2000:]

    monkeypatch.setenv("TERRAIN_ARTIFACT_EVERY", "999")
    sdir = str(tmp_path / "single")
    model = build_model(mesh=None, sampler=det_sampler(0))
    model.train(GlobalStream(), GlobalStream(), batch_size=4, num_epochs=2,
                out_dir=sdir, model_dir=None, save_every=999)

    ref = csv_rows(os.path.join(sdir, "results.txt"))
    loss_keys = [k for k in ref[0]
                 if k.startswith(("train_", "valid_")) or k == "lr"]
    assert len(ref) == 2 and len(loss_keys) == 11
    for d in dirs:
        got = csv_rows(os.path.join(d, "results.txt"))
        assert len(got) == 2, got
        for row_ref, row_got in zip(ref, got):
            for k in loss_keys:
                np.testing.assert_allclose(
                    float(row_got[k]), float(row_ref[k]),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"epoch {row_ref['epoch']} col {k} ({d})")
