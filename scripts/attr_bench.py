"""In-context cost attribution for the flagship 512px train step.

Round-2 left ~60 ms of the 107 ms step unattributed (docs/RESULTS_r2.md
"Step decomposition"): the sum of *isolated* per-net grads is a wrong model
for the simultaneous-update step, which runs each discriminator forward on
3n rows (fake g-path + real/fake concat) and shares one backward.  This
script measures the REAL step with components subtracted one at a time, so
each component's in-context cost is a difference of two full-step
measurements (the only attribution that respects XLA fusion).

Variants (CLI arg):
  full    the flagship step exactly as bench.py runs it (da on, updates on)
  noaug   in-graph augmentation off (gather/normalize only)
  noopt   grads computed, optimizer updates skipped (returns grad-norm so
          the backward cannot be dead-code-eliminated)
  fwd     eval step: forward + losses only, no backward, no updates
  gather  the data prepare alone (gather/normalize/augment)
  dcgan   train_mode='dcgan' in context (U-Net/PatchGAN absent)
  p2p     train_mode='p2p' in context (DCGAN absent)
  profile attempt jax.profiler trace capture around warm steps
  flops   compiled-HLO cost analysis (flops, bytes) for the full step

All timings fetch-fenced (CLAUDE.md: block_until_ready does not fence on
the axon relay).  Each variant is its own XLA program: first run pays the
remote cold compile (minutes); keep JAX_COMPILATION_CACHE_DIR warm.

Usage: python scripts/attr_bench.py <variant> [--steps 20] [--bs 4]
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


def build(train_mode="both"):
    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs
    from terrain_tpu.experiments import _build_test1

    model = _build_test1(train_mode=train_mode, p2p_bilinear=True,
                         verbose=False)
    x, y = make_pairs(240, 512, seed=0)
    ds = DeviceDataset(x, y)
    return model, ds


def timed(fn_fetch, n_steps):
    """fn_fetch(t) must END with a value fetch for step t's output."""
    for t in range(3):
        fn_fetch(t)
    # single trailing fence: dispatch all, fetch last
    t0 = time.perf_counter()
    last = None
    for t in range(n_steps):
        last = fn_fetch(100 + t, fence=False)
    float(last)
    return (time.perf_counter() - t0) / n_steps


def step_driver(model, ds, tr_step, with_updates=True):
    rnd = np.random.RandomState(0)

    def run(t, fence=True):
        bs = run.bs
        Z = model._sample_z(bs)
        idx = jnp.asarray(rnd.randint(0, ds.N, size=bs).astype(np.int32))
        rng = jax.random.fold_in(jax.random.PRNGKey(7), t)
        if with_updates:
            model.params, model.states, model.opt_states, losses = tr_step(
                model.params, model.states, model.opt_states,
                ds.batch_args(Z, idx), rng, jnp.float32(1e-4))
        else:
            losses = tr_step(model.params, model.states,
                             ds.batch_args(Z, idx), rng)
        out = losses["p2p_recon"] if "p2p_recon" in losses else losses["dcgan_gen"]
        if fence:
            return float(out)
        return out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=[
        "full", "noaug", "noopt", "fwd", "gather", "dcgan", "p2p",
        "profile", "flops", "scan"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--scan-k", type=int, default=15,
                    help="inner steps per dispatch for the scan variant")
    args = ap.parse_args()
    v = args.variant
    out = {"variant": v, "bs": args.bs, "steps": args.steps,
           "augment": os.environ.get("TERRAIN_AUGMENT", "shear")}

    if v in ("full", "noaug", "profile", "flops"):
        model, ds = build()
        if v == "noaug":
            model.da = False
        tr_step, _ = model._get_cache_steps(ds)
        xla_opts = os.environ.get("TERRAIN_XLA_OPTS")
        if xla_opts:
            # Per-program XLA compiler options ("k=v,k=v").  Shell-level
            # XLA_FLAGS cannot carry xla_tpu_* flags here: the LOCAL
            # process has no TPU compiler and parse_flags_from_env aborts
            # on unknown flags; lower().compile(compiler_options=...) ships
            # them to the REMOTE TPU compiler (verified: bogus values fail
            # remotely).  The XLA compile cache does NOT key on these —
            # callers must point JAX_COMPILATION_CACHE_DIR at a fresh dir
            # per option set or the cached unoptioned executable is reused.
            kv = dict(s.split("=", 1) for s in xla_opts.split(",") if s)
            Zl = model._sample_z(args.bs)
            idxl = jnp.zeros((args.bs,), np.int32)
            tr_step = tr_step.lower(
                model.params, model.states, model.opt_states,
                ds.batch_args(Zl, idxl), jax.random.PRNGKey(0),
                jnp.float32(1e-4)).compile(compiler_options=kv)
            out["xla_opts"] = kv
        run = step_driver(model, ds, tr_step)
        run.bs = args.bs
        if v == "profile":
            for t in range(3):
                run(t)
            logdir = os.environ.get("TERRAIN_PROFILE", "/tmp/terrain_trace")
            jax.profiler.start_trace(logdir)
            for t in range(args.steps):
                run(200 + t, fence=(t == args.steps - 1))
            jax.profiler.stop_trace()
            files = []
            for root, _, names in os.walk(logdir):
                files += [(os.path.join(root, n), os.path.getsize(
                    os.path.join(root, n))) for n in names]
            out["trace_files"] = sorted(files, key=lambda p: -p[1])[:8]
        elif v == "flops":
            Z = model._sample_z(args.bs)
            idx = jnp.zeros((args.bs,), np.int32)
            lowered = tr_step.lower(
                model.params, model.states, model.opt_states,
                ds.batch_args(Z, idx), jax.random.PRNGKey(0),
                jnp.float32(1e-4))
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            out["cost"] = {k: float(cost[k]) for k in sorted(cost)
                           if isinstance(cost[k], (int, float))
                           and abs(cost[k]) > 1e-9}
            mm = compiled.memory_analysis()
            if mm is not None:
                for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                          "output_size_in_bytes", "generated_code_size_in_bytes"):
                    out[k] = getattr(mm, k, None)
        else:
            out["step_ms"] = round(timed(run, args.steps) * 1e3, 2)
    elif v == "scan":
        # the TERRAIN_SCAN product path: k steps per dispatch (lax.scan)
        model, ds = build()
        k = args.scan_k
        tr_scan, _ = model._get_scan_steps(ds, k)
        rnd = np.random.RandomState(0)
        bs = args.bs

        def run(t, fence=True):
            zs = np.stack([np.asarray(model.sampler(bs, model.latent_dim),
                                      np.float32) for _ in range(k)])
            idxs = rnd.randint(0, ds.N, size=(k, bs)).astype(np.int32)
            rngs = model._fold_keys(
                model._base_key, np.arange(t * k + 1, (t + 1) * k + 1))
            model.params, model.states, model.opt_states, losses = tr_scan(
                model.params, model.states, model.opt_states,
                (jnp.asarray(zs), jnp.asarray(idxs)), rngs,
                jnp.float32(1e-4))
            o = losses["p2p_recon"][-1]
            return float(o) if fence else o

        out["scan_k"] = k
        out["chunk_ms"] = round(timed(run, max(args.steps // k, 4)) * 1e3, 2)
        out["step_ms"] = round(out["chunk_ms"] / k, 2)
    elif v in ("dcgan", "p2p"):
        model, ds = build(train_mode=v)
        tr_step, _ = model._get_cache_steps(ds)
        run = step_driver(model, ds, tr_step)
        run.bs = args.bs
        out["step_ms"] = round(timed(run, args.steps) * 1e3, 2)
    elif v == "noopt":
        from terrain_tpu.train.step import ACTIVE, forward_losses

        model, ds = build()
        prepare = ds.make_prepare(augment=True)
        active = ACTIVE["both"]
        nets = model.nets

        def loss_fn(diff_params, all_params, states, Z, X, Y, rng):
            merged = {**all_params, **diff_params}
            losses, new_states = forward_losses(
                nets, merged, states, Z, X, Y, rng, alpha=model.alpha,
                lsgan=model.lsgan, reconstruction=model.reconstruction,
                train=True)
            total = sum(losses[k] for k in losses) + 100.0 * losses["p2p_recon"]
            return total, (losses, new_states)

        gfn = jax.grad(loss_fn, has_aux=True)

        def raw_step(params, states, batch, rng):
            Z, X, Y = prepare(batch, rng)
            diff = {n: params[n] for n in active}
            grads, (losses, _) = gfn(diff, params, states, Z, X, Y, rng)
            # keep the backward live without applying updates
            gnorm = sum(jnp.sum(jnp.square(l)) for n in grads
                        for l in jax.tree.leaves(grads[n]))
            losses = dict(losses, p2p_recon=losses["p2p_recon"] + 0.0 * gnorm)
            return losses

        jstep = jax.jit(raw_step)
        run = step_driver(model, ds, jstep, with_updates=False)
        run.bs = args.bs
        out["step_ms"] = round(timed(run, args.steps) * 1e3, 2)
    elif v == "fwd":
        model, ds = build()
        _, ev_step = model._get_cache_steps(ds)
        run = step_driver(model, ds, ev_step, with_updates=False)
        run.bs = args.bs
        out["step_ms"] = round(timed(run, args.steps) * 1e3, 2)
    elif v == "gather":
        model, ds = build()
        prepare = ds.make_prepare(augment=True)
        jprep = jax.jit(lambda Z, idx, rng: prepare((Z, idx), rng))
        rnd = np.random.RandomState(0)

        def run(t, fence=True):
            Z = model._sample_z(args.bs)
            idx = jnp.asarray(rnd.randint(0, ds.N, size=args.bs).astype(np.int32))
            _, X, _ = jprep(Z, idx, jax.random.fold_in(jax.random.PRNGKey(7), t))
            o = X[0, 0, 0, 0]
            return float(o) if fence else o

        out["step_ms"] = round(timed(run, args.steps) * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
