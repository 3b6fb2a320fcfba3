"""Activations, by-name registry (the reference passes Lasagne nonlinearities
as config values, e.g. experiments.py:29 `'nonlinearity': linear`).

Leakiness values matter for parity:
  * DCGAN blocks use LeakyRectify(0.2) explicitly (architectures/dcgan.py:24);
  * U-Net and PatchGAN use lasagne's `leaky_rectify`, whose default
    leakiness is 0.01 (architectures/p2p.py:141 etc.).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp


def linear(x):
    return x


def relu(x):
    return jnp.maximum(x, 0)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _leaky_relu_mul(x, negative_slope):
    return jnp.where(x >= 0, x, x * negative_slope)


def _leaky_mul_fwd(x, negative_slope):
    # Save the SCALE (1 or slope) instead of x: the backward becomes a pure
    # multiply, which XLA can fold into neighboring fusions, where the
    # default where-VJP emits a standalone compare_select_fusion
    # (round-4 trace: 2.5 ms/step of those at this line in the shipped
    # composition, docs/RESULTS_r4.md section 4a).  Residual bytes are
    # unchanged (scale replaces x).
    scale = jnp.where(x >= 0, jnp.asarray(1, x.dtype),
                      jnp.asarray(negative_slope, x.dtype))
    return x * scale, scale


def _leaky_mul_bwd(negative_slope, scale, g):
    return (g * scale,)


_leaky_relu_mul.defvjp(_leaky_mul_fwd, _leaky_mul_bwd)


def leaky_relu(x, negative_slope=0.01):
    if os.environ.get("TERRAIN_LEAKY_MUL", "0") == "1":
        return _leaky_relu_mul(x, negative_slope)
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
