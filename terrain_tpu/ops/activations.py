"""Activations, by-name registry (the reference passes Lasagne nonlinearities
as config values, e.g. experiments.py:29 `'nonlinearity': linear`).

Leakiness values matter for parity:
  * DCGAN blocks use LeakyRectify(0.2) explicitly (architectures/dcgan.py:24);
  * U-Net and PatchGAN use lasagne's `leaky_rectify`, whose default
    leakiness is 0.01 (architectures/p2p.py:141 etc.).
"""

import jax
import jax.numpy as jnp


def linear(x):
    return x


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def leaky_relu_02(x):
    return leaky_relu(x, 0.2)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


ACTIVATIONS = {
    "linear": linear,
    None: linear,
    "relu": relu,
    "rectify": relu,
    "leaky_rectify": leaky_relu,  # lasagne default leakiness 0.01
    "leaky_relu": leaky_relu,
    "sigmoid": sigmoid,
    "tanh": tanh,
}


def get_activation(act):
    """Resolve an activation from a name or pass a callable through."""
    if callable(act):
        return act
    try:
        return ACTIVATIONS[act]
    except KeyError:
        raise ValueError(f"unknown activation {act!r}") from None
