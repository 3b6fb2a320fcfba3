"""Benchmark: flagship `both`-mode train step, 512px, on the real chip.

Measures steady-state training throughput of the test1_nobn_bilin_both
configuration (the reference's flagship, experiments.py:98-125): one jitted
step simultaneously updating DCGAN G/D and pix2pix U-Net/PatchGAN at 512px,
device-resident data with in-graph gather/normalize/augment, bf16 compute.

Baseline: the reference trains ~2.4 imgs/s in `both` mode (240 imgs / ~100 s
epoch incl. eval pass; BASELINE.md).  vs_baseline = imgs_per_sec / 2.4.

Prints ONE JSON line.

Env: BENCH_BS (default 4, the reference batch size), BENCH_STEPS (default 20),
BENCH_DTYPE (default bf16).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("TERRAIN_DTYPE", os.environ.get("BENCH_DTYPE", "bf16"))

import jax
import jax.numpy as jnp

# persistent XLA compilation cache: the 4-network 512px step compiles in
# minutes cold, seconds warm.  jax is already imported by the image's
# sitecustomize, so configure through jax.config, not env.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
    bs = int(os.environ.get("BENCH_BS", "4"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs
    from terrain_tpu.experiments import _build_test1

    model = _build_test1(train_mode="both", p2p_bilinear=True, verbose=False)
    # device-resident 240-crop dataset, like textures_v2_brown500
    x, y = make_pairs(240, 512, seed=0)
    ds = DeviceDataset(x, y)
    tr_step, _ = model._get_cache_steps(ds)

    rnd = np.random.RandomState(0)

    def one_step(t):
        Z = model._sample_z(bs)
        idx = jnp.asarray(rnd.randint(0, ds.N, size=bs).astype(np.int32))
        rng = jax.random.fold_in(jax.random.PRNGKey(7), t)
        return tr_step(model.params, model.states, model.opt_states,
                       ds.batch_args(Z, idx), rng, jnp.float32(1e-4))

    # warmup/compile.  IMPORTANT: on the axon remote runtime
    # jax.block_until_ready returns before execution (and even before the
    # lazy remote compile) — only a value fetch truly synchronizes, so the
    # fences here are scalar float() reads.
    for t in range(3):
        model.params, model.states, model.opt_states, losses = one_step(t)
    float(losses["p2p_recon"])

    t0 = time.perf_counter()
    for t in range(n_steps):
        model.params, model.states, model.opt_states, losses = one_step(100 + t)
    float(losses["p2p_recon"])
    dt = time.perf_counter() - t0

    imgs_per_sec = bs * n_steps / dt
    print(json.dumps({
        "metric": "train_imgs_per_sec_512px_both",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / 2.4, 2),
    }))


if __name__ == "__main__":
    main()
