"""Loss system (reference pix2pix.py:102-121).

LSGAN uses squared error against targets 1/0; vanilla GAN uses binary
cross-entropy on the discriminator's (sigmoid) output.  The pix2pix
generator adds alpha * L1 (or L2) reconstruction, default alpha=100
(pix2pix.py:30,117).  PatchGAN outputs are patch maps; `.mean()` reduces
over patches exactly like the reference.

All reductions are fp32.
"""

import jax.numpy as jnp

_BCE_EPS = 1e-7


def adv_loss(pred, target, *, lsgan):
    """Mean adversarial loss vs a constant target (1.0 real / 0.0 fake)."""
    pred = pred.astype(jnp.float32)
    if lsgan:
        return jnp.mean(jnp.square(pred - target))
    p = jnp.clip(pred, _BCE_EPS, 1.0 - _BCE_EPS)
    return jnp.mean(-(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)))


def reconstruction_loss(pred, target, *, kind="l1"):
    """L1 (default) or L2 mean reconstruction (pix2pix.py:111-115)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if kind == "l2":
        return jnp.mean(jnp.square(pred - target))
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - target))
    raise ValueError(f"reconstruction must be 'l1' or 'l2', got {kind!r}")


# CSV column order — must match the reference exactly (pix2pix.py:157)
TRAIN_KEYS = ("dcgan_gen", "dcgan_disc", "p2p_gen", "p2p_recon", "p2p_disc")
