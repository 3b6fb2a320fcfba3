"""Shared tiny two-stage config for the multi-process trajectory test.

Used by both mp_train_worker.py (inside the 2-process jax.distributed
workers) and test_multiprocess.py (the single-process reference run), so
the two trajectories are built from literally the same code.
"""

import numpy as np

IN = 16
LAT = 8
GLOBAL_BS = 4
N_IMGS = 8  # 2 steps/epoch at GLOBAL_BS


def build_model(mesh, sampler, tp_min_features=256):
    from terrain_tpu.models import dcgan, p2p
    from terrain_tpu.train.trainer import TwoStageGAN

    return TwoStageGAN(
        tp_min_features=tp_min_features,
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 8, "h": 3, "initial_size": 4,
                          "final_size": IN, "div": [2, 2]},
        disc_params_dcgan={"nch": IN, "h": 3, "div": [4, 2], "bn": False,
                           "nonlinearity": "linear"},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 4, "act": "tanh"},
        disc_params_p2p={"nf": 4, "bn": False, "act": "linear"},
        in_shp=IN, latent_dim=LAT, is_a_grayscale=True, is_b_grayscale=False,
        lsgan=True, opt="rmsprop", opt_args={"learning_rate": 1e-4},
        train_mode="both", verbose=False, seed=0, mesh=mesh, da=False,
        sampler=sampler)


def det_sampler(process_index):
    """Deterministic prior sampler whose multi-host shards tile the exact
    single-process global draw: _sample_z gives each host n_local rows and
    assembles them in process order (trainer._put_batch), so host `pi`
    generates global rows [pi*n, pi*n + n).  A per-sampler call counter
    keeps successive steps distinct; both paths call the sampler exactly
    once per train/eval step, so the counters stay aligned."""
    state = {"c": 0}

    def sampler(n, d):
        c = state["c"]
        state["c"] += 1
        g = process_index * n + np.arange(n)[:, None]
        dd = np.arange(d)[None, :]
        v = np.sin(g * 12.9898 + dd * 78.233 + c * 37.719) * 43758.5453
        return (v % 1.0).astype(np.float32)

    return sampler


class GlobalStream:
    """Deterministic infinite stream of GLOBAL normalized float batches
    (the Hdf5Iterator contract: .N + next() -> (X, Y)); every process
    constructs an identical one, per HostShardIterator's requirement."""

    N = N_IMGS

    def __init__(self, seed=7):
        self._seed = seed
        self._c = 0

    def __iter__(self):
        return self

    def __next__(self):
        r = np.random.RandomState(self._seed + self._c)
        self._c += 1
        X = r.rand(GLOBAL_BS, IN, IN, 1).astype(np.float32)
        Y = (r.rand(GLOBAL_BS, IN, IN, 3) * 2 - 1).astype(np.float32)
        return X, Y

    next = __next__


def csv_rows(path):
    """Parse results.txt -> list of dict rows (floats), keyed by header."""
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    header = lines[0].split(",")
    rows = []
    for ln in lines[1:]:
        if not ln[:1].isdigit():
            continue
        vals = ln.split(",")
        rows.append({k: v for k, v in zip(header, vals)})
    return rows
