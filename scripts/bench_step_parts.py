"""Decompose the flagship train step's wall time, fetch-fenced per part.

xprof isn't viewable in this container, so attribution is done by timing
jitted sub-graphs independently: each network's forward, each loss's
gradient, and the assembled step.  Parts overlap/fuse differently inside
the full step (see round-1's im2col lesson: in-context cost != isolated
cost), so treat these as upper bounds on what removing a part could save.

Usage: python scripts/bench_step_parts.py [--bs 4] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

import jax
import jax.numpy as jnp

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))


def _fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0]).ravel()[0])


def _time(fn, *args, steps=20):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    bs = args.bs

    from terrain_tpu.experiments import _build_test1

    model = _build_test1(train_mode="both", p2p_bilinear=True, verbose=False)
    nets, params, states = model.nets, model.params, model.states
    rng = jax.random.PRNGKey(0)
    z = jnp.asarray(np.random.RandomState(0).rand(bs, 1000).astype(np.float32))
    X = jnp.asarray(np.random.RandomState(1).rand(bs, 512, 512, 1).astype(np.float32))
    Y = jnp.asarray(np.random.RandomState(2).rand(bs, 512, 512, 3).astype(np.float32) * 2 - 1)

    res = {}

    def fwd(name, *inp):
        net = nets[name]
        f = jax.jit(lambda p, s, *a: net.apply(p, s, *a, train=True, rng=rng)[0])
        return _time(f, params[name], states[name], *inp, steps=args.steps)

    res["fwd_dcgan_gen_ms"] = round(fwd("dcgan_gen", z), 2)
    res["fwd_dcgan_disc_ms"] = round(fwd("dcgan_disc", X), 2)
    res["fwd_p2p_gen_ms"] = round(fwd("p2p_gen", X), 2)
    res["fwd_p2p_disc_ms"] = round(fwd("p2p_disc", X, Y), 2)

    # per-network loss gradients (fwd+bwd), mirroring the step's partition
    def grad_of(name, loss_fn):
        g = jax.jit(jax.grad(loss_fn))
        return _time(g, params[name], steps=args.steps)

    res["grad_dcgan_gen_ms"] = round(grad_of(
        "dcgan_gen",
        lambda p: jnp.mean(nets["dcgan_gen"].apply(
            p, states["dcgan_gen"], z, train=True, rng=rng)[0]
            .astype(jnp.float32) ** 2)), 2)
    res["grad_dcgan_disc_ms"] = round(grad_of(
        "dcgan_disc",
        lambda p: jnp.mean(nets["dcgan_disc"].apply(
            p, states["dcgan_disc"], X, train=True, rng=rng)[0]
            .astype(jnp.float32) ** 2)), 2)
    res["grad_p2p_gen_ms"] = round(grad_of(
        "p2p_gen",
        lambda p: jnp.mean(jnp.abs(nets["p2p_gen"].apply(
            p, states["p2p_gen"], X, train=True, rng=rng)[0]
            .astype(jnp.float32) - Y.astype(jnp.float32)))), 2)
    res["grad_p2p_disc_ms"] = round(grad_of(
        "p2p_disc",
        lambda p: jnp.mean(nets["p2p_disc"].apply(
            p, states["p2p_disc"], X, Y, train=True, rng=rng)[0]
            .astype(jnp.float32) ** 2)), 2)

    # the assembled full step, for reference
    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs

    x, y = make_pairs(240, 512, seed=0)
    ds = DeviceDataset(x, y)
    tr_step, _ = model._get_cache_steps(ds)
    idx = jnp.arange(bs, dtype=jnp.int32)

    def full(t):
        return tr_step(model.params, model.states, model.opt_states,
                       ds.batch_args(model._sample_z(bs), idx),
                       jax.random.fold_in(rng, t), jnp.float32(1e-4))

    out = full(0)
    model.params, model.states, model.opt_states, losses = out
    _fence(losses)
    t0 = time.perf_counter()
    for t in range(args.steps):
        model.params, model.states, model.opt_states, losses = full(t + 1)
    _fence(losses)
    res["full_step_ms"] = round((time.perf_counter() - t0) / args.steps * 1e3, 2)
    res["bs"] = bs

    print(json.dumps(res))
    with open("/tmp/bench_step_parts.json", "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
