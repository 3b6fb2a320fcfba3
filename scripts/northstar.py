"""North-star accounting: measured 600-epoch-equivalent wall-clock.

BASELINE.md's driver-set target: 600-epoch-equivalent 512px DCGAN+pix2pix
training in <1 hr on TPU v5e-8.  The reference equivalent is 600 x ~100 s
~= 16.7 h (output/test1_repeatnod_fixp2p_nobn/results.txt time column).
This script does the arithmetic from MEASURED single-chip numbers under
stated knobs, with the 8-way-DP number explicitly labeled a projection
(multi-chip hardware is not reachable from this host; the DP train step is
validated on the virtual mesh, tests/test_parallel.py).

Epoch model (the reference's own loop, pix2pix.py:243-264): one epoch =
N/bs train steps + N/bs eval steps (the reference always runs the eval
pass — and its "valid" set IS the train set for brown500, SURVEY §2), with
N=240.  Artifact dumping is relay-I/O-bound on this host and is therefore
reported separately per cadence, not folded into the compute number.

Usage: python scripts/northstar.py [--bs 4] [--scan-k 15] [--steps 20]
Prints one JSON line; scripts/northstar.sh runs it with the shipped recipe.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

N_IMGS = 240      # brown500 train-set size (SURVEY §6 derived-throughput)
EPOCHS = 600


def timed(fn_fetch, n_steps):
    for t in range(3):
        fn_fetch(t)
    t0 = time.perf_counter()
    last = None
    for t in range(n_steps):
        last = fn_fetch(100 + t, fence=False)
    float(last)  # value fetch = the only true fence on this relay (CLAUDE.md)
    return (time.perf_counter() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--scan-k", type=int, default=15)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs
    from terrain_tpu.experiments import _build_test1

    model = _build_test1(train_mode="both", p2p_bilinear=True, verbose=False)
    x, y = make_pairs(N_IMGS, 512, seed=0)
    ds = DeviceDataset(x, y)
    bs, k = args.bs, args.scan_k
    rnd = np.random.RandomState(0)

    # train: the shipped TERRAIN_SCAN=k superstep path
    tr_scan, _ = model._get_scan_steps(ds, k)

    def run_train(t, fence=True):
        zs = np.stack([np.asarray(model.sampler(bs, model.latent_dim),
                                  np.float32) for _ in range(k)])
        idxs = rnd.randint(0, ds.N, size=(k, bs)).astype(np.int32)
        rngs = model._fold_keys(
            model._base_key, np.arange(t * k + 1, (t + 1) * k + 1))
        model.params, model.states, model.opt_states, losses = tr_scan(
            model.params, model.states, model.opt_states,
            (jnp.asarray(zs), jnp.asarray(idxs)), rngs, jnp.float32(1e-4))
        o = losses["p2p_recon"][-1]
        return float(o) if fence else o

    t_train = timed(run_train, max(args.steps // k, 4)) / k

    # eval: the fixed eval step (forward + losses, no updates)
    _, ev_step = model._get_cache_steps(ds)

    def run_eval(t, fence=True):
        Z = model._sample_z(bs)
        idx = jnp.asarray(rnd.randint(0, ds.N, size=bs).astype(np.int32))
        losses = ev_step(model.params, model.states,
                         ds.batch_args(Z, idx),
                         jax.random.fold_in(jax.random.PRNGKey(7), t))
        o = losses["p2p_recon"]
        return float(o) if fence else o

    t_eval = timed(run_eval, args.steps)

    steps_per_epoch = N_IMGS // bs
    epoch_s = steps_per_epoch * (t_train + t_eval)
    total_1chip_s = EPOCHS * epoch_s
    # projection: 8-way DP at the same per-chip batch (global batch 8*bs,
    # 1/8 the steps; BN stats become global-batch — the documented
    # training-dynamics caveat, docs/DESIGN.md).  Collective overhead for
    # these ~20M-param nets is a few % at most on ICI; not measurable here.
    total_dp8_s = total_1chip_s / 8

    print(json.dumps({
        "metric": "northstar_600ep_equivalent",
        "recipe": {"bs": bs, "scan_k": k, "dtype": "bf16",
                   "eval": "full pass (TERRAIN_EVAL_STEPS unset)",
                   "artifacts": "excluded (relay-I/O-bound; see note)",
                   "n_imgs": N_IMGS, "epochs": EPOCHS},
        "train_step_ms": round(t_train * 1e3, 2),
        "eval_step_ms": round(t_eval * 1e3, 2),
        "epoch_s": round(epoch_s, 3),
        "total_1chip_min": round(total_1chip_s / 60, 1),
        "total_dp8_min_PROJECTION": round(total_dp8_s / 60, 1),
        "target_min": 60.0,
        "reference_min": 1000.0,
        "met_single_chip": bool(total_1chip_s < 3600),
    }))


if __name__ == "__main__":
    main()
