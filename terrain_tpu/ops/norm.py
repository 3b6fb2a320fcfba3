"""Batch normalization, functional, matching Lasagne BatchNormLayer semantics.

Reference usage: BatchNormLayer with default epsilon=1e-4 and running-average
alpha=1e-2 follows every conv in the DCGAN generator (architectures/
dcgan.py:17,23) and every encoder/decoder block of the U-Net
(architectures/p2p.py:146 etc.).  Lasagne stores the running statistics as
(mean, inv_std) and EMAs *in inv-std space*; we keep the identical state
layout so checkpoints can be imported from the reference pickle format
byte-for-byte (pix2pix.py:158-166).

Statistics are always computed in fp32 even when activations are bf16.
"""

import jax.numpy as jnp
from jax import lax

EPS = 1e-4  # lasagne BatchNormLayer default epsilon
ALPHA = 1e-2  # lasagne BatchNormLayer default running-average alpha


def bn_init_state(num_features):
    return {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "inv_std": jnp.ones((num_features,), jnp.float32),
    }


def bn_init_params(num_features):
    return {
        "gamma": jnp.ones((num_features,), jnp.float32),
        "beta": jnp.zeros((num_features,), jnp.float32),
    }


def batch_norm(x, params, state, *, train, eps=EPS, alpha=ALPHA):
    """Normalize over all axes but the last (channel) axis.

    Returns (y, new_state).  In train mode the *batch* statistics are used
    (and the running stats EMA'd, lasagne-style in inv-std space); in
    deterministic mode the running statistics are used.
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        inv_std = lax.rsqrt(var + eps)
        new_state = {
            "mean": (1.0 - alpha) * state["mean"] + alpha * mean,
            "inv_std": (1.0 - alpha) * state["inv_std"] + alpha * inv_std,
        }
    else:
        mean, inv_std = state["mean"], state["inv_std"]
        new_state = state
    scale = (inv_std * params["gamma"]).astype(x.dtype)
    shift = (params["beta"] - mean * inv_std * params["gamma"]).astype(x.dtype)
    return x * scale + shift, new_state
