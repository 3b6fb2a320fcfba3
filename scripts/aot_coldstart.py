"""Cold-start benchmark: time-to-first-train-step on a cleared XLA cache.

Without AOT, a fresh environment pays the full remote compile of the 512px
four-network step (5-8 min on this relay) before step 1.  With
TERRAIN_AOT=<dir> the trainer loads the serialized executable instead
(utils/aot.py) — this script measures exactly that difference.

Usage (each invocation is ONE fresh process = one honest cold start):
  # 1. populate the AOT store (pays the compile once)
  python scripts/aot_coldstart.py --aot aot_store --xla-cache /tmp/empty1
  # 2. cold start WITH aot (fresh process, still-empty XLA cache)
  python scripts/aot_coldstart.py --aot aot_store --xla-cache /tmp/empty2
  # 3. baseline cold start, no aot, empty XLA cache
  python scripts/aot_coldstart.py --xla-cache /tmp/empty3

Prints one JSON line with phase timings (build, first_step, total).
"""

import argparse
import json
import os
import sys
import time

t_proc = time.perf_counter()

import numpy as np

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot", default=None)
    ap.add_argument("--xla-cache", default=None,
                    help="override the XLA compilation cache dir "
                         "(point at an empty dir to simulate a fresh machine)")
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--rows", type=int, default=240,
                    help="dataset row count.  XLA cache keys (and the relay's "
                         "server-side compile cache) include array shapes, so "
                         "a row count no prior process used makes the program "
                         "GENUINELY novel — the only way to measure a true "
                         "cold compile on a relay whose cache we can't clear "
                         "(round-3 caveat, docs/RESULTS_r3.md §3)")
    args = ap.parse_args()
    if args.xla_cache:
        os.makedirs(args.xla_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.xla_cache)
    if args.aot:
        os.environ["TERRAIN_AOT"] = args.aot

    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs
    from terrain_tpu.experiments import _build_test1

    t0 = time.perf_counter()
    model = _build_test1(train_mode="both", p2p_bilinear=True, verbose=False)
    x, y = make_pairs(args.rows, 512, seed=0)
    ds = DeviceDataset(x, y)
    tr_step, _ = model._get_cache_steps(ds)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    Z = model._sample_z(args.bs)
    idx = jnp.zeros((args.bs,), np.int32)
    out = tr_step(model.params, model.states, model.opt_states,
                  ds.batch_args(Z, idx), jax.random.PRNGKey(0),
                  jnp.float32(1e-4))
    float(out[3]["p2p_recon"])  # value fetch = the only true fence here
    t_first = time.perf_counter() - t0

    print(json.dumps({
        "aot": bool(args.aot),
        "rows": args.rows,
        "build_s": round(t_build, 1),
        "first_step_s": round(t_first, 1),
        "total_s": round(time.perf_counter() - t_proc, 1),
    }))


if __name__ == "__main__":
    main()
