"""The simultaneous four-network GAN step, built once and jit-compiled.

The single most important behavioral fact of the reference (pix2pix.py:131-147):
one train_fn call updates DCGAN G, DCGAN D, p2p G and p2p D *simultaneously*,
with all losses computed from one shared forward — not alternating G/D steps.

TPU-first realization: the four per-loss gradients are obtained from ONE
jax.grad over a stop-gradient-partitioned total

    L = L_gen_dcgan(Gd, sg(Dd)) + L_disc_dcgan(sg(Gd(z)), Dd)
      + L_gen_p2p(Gp, sg(Dp)) + alpha*L_recon(Gp) + L_disc_p2p(sg(Gp(X)), Dp)

stop_gradient is the identity in the primal, so XLA CSEs the duplicated
discriminator forwards and the compiled step computes each network's forward
exactly once — while the cotangents are partitioned exactly like the
reference's four independent `opt(loss_i, params_i)` update dicts.

`train_mode` in {'both','dcgan','p2p'} selects which networks are
differentiated and updated; all five losses are always computed and returned
(the reference's train_fn returns them all with on_unused_input='warn',
pix2pix.py:142).

BatchNorm running statistics follow Lasagne's default-update semantics: a
generator's stats come from its (single) train-mode forward; a
discriminator's stats come from its *fake-batch* pass, which is the last
get_output call in the reference graph and therefore the default_update that
wins (pix2pix.py:92-101).
"""

from functools import partial

import jax
import jax.numpy as jnp

from terrain_tpu.train.losses import TRAIN_KEYS, adv_loss, reconstruction_loss

NET_NAMES = ("dcgan_gen", "dcgan_disc", "p2p_gen", "p2p_disc")

ACTIVE = {
    "both": NET_NAMES,
    "dcgan": ("dcgan_gen", "dcgan_disc"),
    "p2p": ("p2p_gen", "p2p_disc"),
}

_sg = jax.lax.stop_gradient


def _tree_has_bn(params):
    """True if any node in the param tree is a BatchNorm block."""
    found = []

    def visit(path, leaf):
        if any(getattr(k, "key", None) == "bn" for k in path):
            found.append(True)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return bool(found)


def forward_losses(nets, params, states, Z, X, Y, rng, *, alpha, lsgan,
                   reconstruction, train):
    """Shared forward for all four networks; returns (losses, new_states).

    losses is a dict over TRAIN_KEYS; new_states mirrors `states`.
    Gradient partitioning (the sg() calls) reproduces the reference's four
    independent optimizer update dicts (pix2pix.py:131-141).

    When a discriminator is BatchNorm-free (every shipped experiment,
    experiments.py:29,33: bn=False) its real and fake-d-path forwards are
    *batched into one call* on the concatenated batch — per-sample ops make
    this bit-identical to two separate calls, while halving the kernel
    count, which matters in the occupancy-bound small-batch regime.  With
    BN the batch statistics would couple the passes, so batching is skipped.
    """
    r = {n: jax.random.fold_in(rng, i) for i, n in enumerate(NET_NAMES)}
    adv = partial(adv_loss, lsgan=lsgan)
    n = X.shape[0]

    # --- stage 1: DCGAN (z -> A) ---------------------------------------
    a_fake, ns_gd = nets["dcgan_gen"].apply(
        params["dcgan_gen"], states["dcgan_gen"], Z, train=train, rng=r["dcgan_gen"])
    # generator loss: grads flow through D's *activations* but not D's params
    d_fake_gpath, _ = nets["dcgan_disc"].apply(
        _sg(params["dcgan_disc"]), states["dcgan_disc"], a_fake,
        train=train, rng=r["dcgan_disc"])
    if _tree_has_bn(params["dcgan_disc"]):
        # discriminator loss: fake batch is a constant
        d_real, _ = nets["dcgan_disc"].apply(
            params["dcgan_disc"], states["dcgan_disc"], X,
            train=train, rng=r["dcgan_disc"])
        d_fake_dpath, ns_dd = nets["dcgan_disc"].apply(
            params["dcgan_disc"], states["dcgan_disc"], _sg(a_fake),
            train=train, rng=r["dcgan_disc"])
    else:
        d_both, ns_dd = nets["dcgan_disc"].apply(
            params["dcgan_disc"], states["dcgan_disc"],
            jnp.concatenate([X, _sg(a_fake)], axis=0),
            train=train, rng=r["dcgan_disc"])
        d_real, d_fake_dpath = d_both[:n], d_both[n:]
    gen_loss_dcgan = adv(d_fake_gpath, 1.0)
    disc_loss_dcgan = adv(d_real, 1.0) + adv(d_fake_dpath, 0.0)

    # --- stage 2: pix2pix (A -> B) --------------------------------------
    b_fake, ns_gp = nets["p2p_gen"].apply(
        params["p2p_gen"], states["p2p_gen"], X, train=train, rng=r["p2p_gen"])
    p_fake_gpath, _ = nets["p2p_disc"].apply(
        _sg(params["p2p_disc"]), states["p2p_disc"], X, b_fake,
        train=train, rng=r["p2p_disc"])
    if _tree_has_bn(params["p2p_disc"]):
        p_real, _ = nets["p2p_disc"].apply(
            params["p2p_disc"], states["p2p_disc"], X, Y,
            train=train, rng=r["p2p_disc"])
        p_fake_dpath, ns_dp = nets["p2p_disc"].apply(
            params["p2p_disc"], states["p2p_disc"], X, _sg(b_fake),
            train=train, rng=r["p2p_disc"])
    else:
        p_both, ns_dp = nets["p2p_disc"].apply(
            params["p2p_disc"], states["p2p_disc"],
            jnp.concatenate([X, X], axis=0),
            jnp.concatenate([Y, _sg(b_fake)], axis=0),
            train=train, rng=r["p2p_disc"])
        p_real, p_fake_dpath = p_both[:n], p_both[n:]
    gen_loss_p2p = adv(p_fake_gpath, 1.0)
    recon = reconstruction_loss(b_fake, Y, kind=reconstruction)
    disc_loss_p2p = adv(p_real, 1.0) + adv(p_fake_dpath, 0.0)

    losses = {
        "dcgan_gen": gen_loss_dcgan,
        "dcgan_disc": disc_loss_dcgan,
        "p2p_gen": gen_loss_p2p,
        "p2p_recon": recon,
        "p2p_disc": disc_loss_p2p,
    }
    new_states = {
        "dcgan_gen": ns_gd,
        "dcgan_disc": ns_dd,
        "p2p_gen": ns_gp,
        "p2p_disc": ns_dp,
    }
    return losses, new_states


def _total(losses, active, alpha):
    total = jnp.float32(0)
    if "dcgan_gen" in active:
        total = total + losses["dcgan_gen"]
    if "dcgan_disc" in active:
        total = total + losses["dcgan_disc"]
    if "p2p_gen" in active:
        total = total + losses["p2p_gen"] + alpha * losses["p2p_recon"]
    if "p2p_disc" in active:
        total = total + losses["p2p_disc"]
    return total


def build_train_step(nets, optimizer, *, alpha=100.0, lsgan=False,
                     reconstruction="l1", train_mode="both", prepare=None,
                     lr_mults=None):
    """Returns train_step(params, states, opt_states, batch, rng, lr).

    `batch` is whatever `prepare(batch, rng)` maps to an (Z, X, Y) tuple on
    device — identity by default; the device-cache pipeline passes indices
    and gathers/normalizes/augments in-graph so the whole step is one XLA
    program.

    `lr_mults` (optional dict net_name -> float) scales the runtime lr per
    network — a TTUR knob (Heusel et al. 2017): e.g. {"dcgan_disc": 4.0}
    trains that discriminator 4x faster than its generator.  Multipliers are
    static (baked into the compiled graph) so lr stays the single runtime
    scalar and LR schedules scale every network together.  The reference has
    one shared lr (pix2pix.py:124-127); default None reproduces that.

    Returned pytrees reuse the input structure so the caller can donate
    buffers.  Losses come back as a dict over TRAIN_KEYS.
    """
    active = ACTIVE[train_mode]
    lr_mults = dict(lr_mults or {})
    unknown = set(lr_mults) - set(NET_NAMES)
    if unknown:
        raise ValueError(f"lr_mults for unknown networks: {sorted(unknown)}")

    def loss_fn(diff_params, all_params, states, Z, X, Y, rng):
        merged = {**all_params, **diff_params}
        losses, new_states = forward_losses(
            nets, merged, states, Z, X, Y, rng,
            alpha=alpha, lsgan=lsgan, reconstruction=reconstruction, train=True)
        return _total(losses, active, alpha), (losses, new_states)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(params, states, opt_states, batch, rng, lr):
        Z, X, Y = prepare(batch, rng) if prepare is not None else batch
        diff_params = {n: params[n] for n in active}
        grads, (losses, new_states) = grad_fn(
            diff_params, params, states, Z, X, Y, rng)
        new_params = dict(params)
        new_opt_states = dict(opt_states)
        for n in active:
            new_params[n], new_opt_states[n] = optimizer.update(
                grads[n], opt_states[n], params[n],
                lr * lr_mults.get(n, 1.0))
        return new_params, new_states, new_opt_states, losses

    return train_step


def build_scan_step(train_step):
    """Run k sequential train steps in ONE compiled program via lax.scan.

    On the relay runtime each dispatch pays a fixed per-call overhead that
    is of the same order as the 512px step's compute (docs/RESULTS_r3.md
    "Step attribution"), so the per-step dispatch model leaves the MXU idle
    roughly half of every step.  Scanning k steps amortizes that overhead
    k-fold; it is also the idiomatic TPU training loop (host touches the
    device once per k steps, XLA keeps params resident in HBM across
    iterations).  Semantics are identical to k back-to-back train_step
    calls with the same per-step (batch, rng) inputs — asserted by
    tests/test_scan_step.py.

    scan_step(params, states, opt_states, batches, rngs, lr, *extra) where
    `batches` is the per-step batch pytree stacked on a new leading k axis
    and `rngs` stacks the k per-step keys.  `extra` are scan-INVARIANT
    step args appended to every inner step's batch tuple (the "arg"-mode
    dataset arrays, DeviceDataset.scan_extra — stacking those into the
    scanned xs would replicate the dataset k times).  Losses come back as
    a dict of (k,) arrays (one value per inner step).
    """

    def scan_step(params, states, opt_states, batches, rngs, lr, *extra):
        def body(carry, xs):
            p, s, o = carry
            batch, rng = xs
            p, s, o, losses = train_step(p, s, o, tuple(batch) + extra,
                                         rng, lr)
            return (p, s, o), losses

        (params, states, opt_states), losses = jax.lax.scan(
            body, (params, states, opt_states), (batches, rngs))
        return params, states, opt_states, losses

    return scan_step


def build_scan_eval(eval_step):
    """Scan analog of build_scan_step for the (stateless) eval pass."""

    def scan_eval(params, states, batches, rngs, *extra):
        def body(carry, xs):
            batch, rng = xs
            return carry, eval_step(params, states, tuple(batch) + extra,
                                    rng)

        _, losses = jax.lax.scan(body, (), (batches, rngs))
        return losses

    return scan_eval


def build_eval_step(nets, *, alpha=100.0, lsgan=False, reconstruction="l1",
                    prepare=None):
    """Returns eval_step(params, states, batch, rng) -> losses.

    Matches the reference's loss_fn (pix2pix.py:143): *train-mode* forwards
    (batch-stat BN, live dropout), no parameter updates.  Unlike Lasagne's
    default-update quirk, it does not touch BN running stats (documented
    deviation; see SURVEY.md §2 quirks).
    """

    def eval_step(params, states, batch, rng):
        Z, X, Y = prepare(batch, rng) if prepare is not None else batch
        losses, _ = forward_losses(
            nets, params, states, Z, X, Y, rng,
            alpha=alpha, lsgan=lsgan, reconstruction=reconstruction, train=True)
        return losses

    return eval_step
