"""Train-step semantics tests: the gradient partitioning must reproduce the
reference's four independent per-loss optimizer updates (pix2pix.py:131-141),
and the Lasagne-exact optimizer math must match a direct NumPy iteration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terrain_tpu.models import dcgan, unet
from terrain_tpu.train import (
    TRAIN_KEYS,
    adv_loss,
    build_eval_step,
    build_train_step,
    forward_losses,
    get_optimizer,
    reconstruction_loss,
    rmsprop,
)

KEY = jax.random.PRNGKey(0)
IN_SHP = 16
LATENT = 8


def _tiny_nets():
    return {
        "dcgan_gen": dcgan.default_generator(
            LATENT, True, nch=8, h=3, initial_size=4, final_size=IN_SHP, div=[2, 2]),
        "dcgan_disc": dcgan.default_discriminator(
            IN_SHP, True, nch=IN_SHP, h=3, div=[4, 2], bn=False, nonlinearity="linear"),
        "p2p_gen": unet.g_unet(IN_SHP, True, False, nf=4),
        "p2p_disc": unet.discriminator(IN_SHP, True, False, nf=4, act="linear"),
    }


def _init_all(nets):
    params, states = {}, {}
    for i, (n, net) in enumerate(nets.items()):
        params[n], states[n] = net.init(jax.random.fold_in(KEY, i))
    # The DCGAN disc's final conv carries a hidden ReLU (reference quirk,
    # dcgan.py:50); at tiny-config random init it can be fully dead, zeroing
    # every DCGAN gradient.  Bias it positive so gradients flow in tests.
    params["dcgan_disc"]["conv_out"]["b"] = (
        params["dcgan_disc"]["conv_out"]["b"] + 0.5)
    return params, states


def _batch(bs=2):
    r = np.random.RandomState(0)
    Z = jnp.asarray(r.rand(bs, LATENT).astype(np.float32))
    X = jnp.asarray(r.rand(bs, IN_SHP, IN_SHP, 1).astype(np.float32))
    Y = jnp.asarray((r.rand(bs, IN_SHP, IN_SHP, 3) * 2 - 1).astype(np.float32))
    return Z, X, Y


def test_losses_golden():
    pred = jnp.array([[0.2], [0.8]])
    np.testing.assert_allclose(
        float(adv_loss(pred, 1.0, lsgan=True)), (0.64 + 0.04) / 2, rtol=1e-6)
    np.testing.assert_allclose(
        float(adv_loss(pred, 0.0, lsgan=False)),
        -(np.log(0.8) + np.log(0.2)) / 2, rtol=1e-6)
    a = jnp.array([1.0, -2.0])
    b = jnp.array([0.0, 0.0])
    assert float(reconstruction_loss(a, b, kind="l1")) == 1.5
    assert float(reconstruction_loss(a, b, kind="l2")) == 2.5


def test_rmsprop_matches_lasagne_formula():
    opt = rmsprop()
    p0 = {"w": jnp.array([1.0, -2.0])}
    g = {"w": jnp.array([0.5, 0.25])}
    state = opt.init(p0)
    p, state = opt.update(g, state, p0, 0.1)
    accu = 0.1 * np.array([0.25, 0.0625])
    want = np.array([1.0, -2.0]) - 0.1 * np.array([0.5, 0.25]) / np.sqrt(accu + 1e-6)
    np.testing.assert_allclose(np.asarray(p["w"]), want, rtol=1e-6)
    # second step accumulates
    p2, state = opt.update(g, state, p, 0.1)
    accu2 = 0.9 * accu + 0.1 * np.array([0.25, 0.0625])
    want2 = np.asarray(p["w"]) - 0.1 * np.array([0.5, 0.25]) / np.sqrt(accu2 + 1e-6)
    np.testing.assert_allclose(np.asarray(p2["w"]), want2, rtol=1e-6)


def test_adam_first_step_size():
    opt = get_optimizer("adam", {"learning_rate": 1e-3})
    p0 = {"w": jnp.array([0.0])}
    g = {"w": jnp.array([10.0])}
    state = opt.init(p0)
    p, _ = opt.update(g, state, p0, 1e-3)
    # bias-corrected adam first step ~ -lr * sign(g)
    np.testing.assert_allclose(np.asarray(p["w"]), [-1e-3], rtol=1e-4)


def test_gradient_partitioning_matches_per_loss_grads():
    """Our single stop-gradient-partitioned grad must equal four independent
    jax.grad calls (one per loss wrt its own net), the reference semantics."""
    nets = _tiny_nets()
    params, states = _init_all(nets)
    Z, X, Y = _batch()
    rng = jax.random.PRNGKey(42)
    alpha, lsgan = 100.0, True

    def loss_of(name):
        def f(p_n):
            merged = dict(params)
            merged[name] = p_n
            losses, _ = forward_losses(
                nets, merged, states, Z, X, Y, rng,
                alpha=alpha, lsgan=lsgan, reconstruction="l1", train=True)
            if name == "dcgan_gen":
                return losses["dcgan_gen"]
            if name == "dcgan_disc":
                return losses["dcgan_disc"]
            if name == "p2p_gen":
                return losses["p2p_gen"] + alpha * losses["p2p_recon"]
            return losses["p2p_disc"]
        return f

    # partitioned total (what build_train_step differentiates)
    def total(diff):
        merged = {**params, **diff}
        losses, _ = forward_losses(
            nets, merged, states, Z, X, Y, rng,
            alpha=alpha, lsgan=lsgan, reconstruction="l1", train=True)
        return (losses["dcgan_gen"] + losses["dcgan_disc"]
                + losses["p2p_gen"] + alpha * losses["p2p_recon"]
                + losses["p2p_disc"])

    grads = jax.grad(total)({n: params[n] for n in nets})
    for name in nets:
        want = jax.grad(loss_of(name))(params[name])
        got = grads[name]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            got, want)


@pytest.mark.parametrize("mode,changed,frozen", [
    ("both", ["dcgan_gen", "dcgan_disc", "p2p_gen", "p2p_disc"], []),
    ("dcgan", ["dcgan_gen", "dcgan_disc"], ["p2p_gen", "p2p_disc"]),
    ("p2p", ["p2p_gen", "p2p_disc"], ["dcgan_gen", "dcgan_disc"]),
])
def test_train_mode_updates_only_active_nets(mode, changed, frozen):
    nets = _tiny_nets()
    params, states = _init_all(nets)
    opt = get_optimizer("rmsprop", {"learning_rate": 1e-4})
    opt_states = {n: opt.init(params[n]) for n in nets}
    step = jax.jit(build_train_step(
        nets, opt, alpha=100.0, lsgan=True, train_mode=mode))
    batch = _batch()
    new_params, new_states, new_opt, losses = step(
        params, states, opt_states, batch, jax.random.PRNGKey(1), 1e-4)
    assert set(losses) == set(TRAIN_KEYS)
    for k in TRAIN_KEYS:
        assert np.isfinite(float(losses[k])), k
    for n in changed:
        diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                             params[n], new_params[n])
        assert max(jax.tree.leaves(diffs)) > 0, f"{n} should have been updated"
    for n in frozen:
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                     params[n], new_params[n])


def test_eval_step_returns_losses_without_mutation():
    nets = _tiny_nets()
    params, states = _init_all(nets)
    ev = jax.jit(build_eval_step(nets, alpha=100.0, lsgan=True))
    losses = ev(params, states, _batch(), jax.random.PRNGKey(2))
    assert set(losses) == set(TRAIN_KEYS)
    for k in TRAIN_KEYS:
        assert np.isfinite(float(losses[k]))


def test_bn_state_advances_in_train_step():
    nets = _tiny_nets()
    params, states = _init_all(nets)
    opt = get_optimizer("rmsprop", {"learning_rate": 1e-4})
    opt_states = {n: opt.init(params[n]) for n in nets}
    step = jax.jit(build_train_step(nets, opt, lsgan=True, train_mode="both"))
    _, new_states, _, _ = step(params, states, opt_states, _batch(),
                               jax.random.PRNGKey(1), 1e-4)
    before = states["dcgan_gen"]["bn_in"]["mean"]
    after = new_states["dcgan_gen"]["bn_in"]["mean"]
    assert float(jnp.max(jnp.abs(after - before))) > 0


def test_batched_disc_passes_match_unbatched(monkeypatch):
    """BN-free discs take the batched real+fake path; it must match the
    two-separate-calls formulation exactly (losses and gradients)."""
    import terrain_tpu.train.step as step_mod

    nets = _tiny_nets()
    params, states = _init_all(nets)
    Z, X, Y = _batch()
    rng = jax.random.PRNGKey(7)
    kw = dict(alpha=100.0, lsgan=True, reconstruction="l1", train=True)

    losses_batched, _ = forward_losses(nets, params, states, Z, X, Y, rng, **kw)
    monkeypatch.setattr(step_mod, "_tree_has_bn", lambda p: True)  # force split
    losses_split, _ = forward_losses(nets, params, states, Z, X, Y, rng, **kw)
    for k in TRAIN_KEYS:
        np.testing.assert_allclose(float(losses_batched[k]),
                                   float(losses_split[k]), rtol=1e-5)

    def grads_of(fwd_losses):
        def total(p):
            ls, _ = fwd_losses(nets, {**params, **p}, states, Z, X, Y, rng, **kw)
            return (ls["dcgan_gen"] + ls["dcgan_disc"] + ls["p2p_gen"]
                    + 100.0 * ls["p2p_recon"] + ls["p2p_disc"])
        return jax.grad(total)({n: params[n] for n in nets})

    g_split = grads_of(forward_losses)
    monkeypatch.undo()
    g_batched = grads_of(forward_losses)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        g_batched, g_split)


def test_lr_mults_ttur_scales_only_named_net():
    nets = _tiny_nets()
    params, states = _init_all(nets)
    opt = get_optimizer("rmsprop", {"learning_rate": 1e-4})
    opt_states = {n: opt.init(params[n]) for n in nets}
    kw = dict(alpha=100.0, lsgan=True, train_mode="both")
    plain = jax.jit(build_train_step(nets, opt, **kw))
    ttur = jax.jit(build_train_step(
        nets, opt, lr_mults={"dcgan_disc": 2.0}, **kw))
    batch = _batch()
    rng = jax.random.PRNGKey(3)
    p1, _, _, _ = plain(params, states, opt_states, batch, rng, 1e-4)
    p2, _, _, _ = plain(params, states, opt_states, batch, rng, 2e-4)
    pm, _, _, _ = ttur(params, states, opt_states, batch, rng, 1e-4)
    # dcgan_disc stepped as if lr were doubled; every other net as plain lr
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        pm["dcgan_disc"], p2["dcgan_disc"])
    for n in ("dcgan_gen", "p2p_gen", "p2p_disc"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            pm[n], p1[n])
    with pytest.raises(ValueError, match="unknown networks"):
        build_train_step(nets, opt, lr_mults={"nope": 2.0}, **kw)
