"""Minimal functional module system: explicit init/apply over PyTrees.

The reference injects architectures as factory functions returning Lasagne
layer graphs (pix2pix.py:25-28, 73-77).  Here a factory returns a `Network`
bundling `init(key) -> (params, state)` and
`apply(params, state, *inputs, train, rng) -> (out, new_state)`:

  * `params` — trainable leaves (conv/dense weights, BN gamma/beta);
  * `state`  — non-trainable BN running statistics (mean, inv_std);
  * `rng`    — threaded explicitly for dropout.

Param trees are plain nested dicts with deterministic insertion order so the
flattened leaf order matches the reference's lasagne get_all_param_values
ordering for checkpoint import (pix2pix.py:158-166).
"""

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from terrain_tpu.ops import bn_init_params, bn_init_state


def glorot_uniform(key, shape, fan_in, fan_out, gain=1.0):
    """lasagne.init.GlorotUniform: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out)).

    Default W init of every Conv2D/Deconv2D/Dense layer in the reference.
    """
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def conv_init(key, k, cin, cout):
    """HWIO conv params; Glorot fans use the receptive field (lasagne)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    w = glorot_uniform(key, (kh, kw, cin, cout), cin * kh * kw, cout * kh * kw)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def deconv_init(key, k, cin, cout):
    kh, kw = (k, k) if isinstance(k, int) else k
    w = glorot_uniform(key, (kh, kw, cin, cout), cin * kh * kw, cout * kh * kw)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def dense_init(key, din, dout):
    return {
        "w": glorot_uniform(key, (din, dout), din, dout),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def bn_init(c):
    return bn_init_params(c), bn_init_state(c)


def dropout(x, rate, rng, train):
    """Inverted dropout (lasagne DropoutLayer, rescale=True)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


@dataclasses.dataclass
class Network:
    """A model: `init(key)` -> (params, state); `apply(params, state, *x)`.

    `apply` accepts keyword args `train` (bool, static) and `rng` (dropout
    key or None) and returns (output, new_state).
    """

    name: str
    init: Callable[..., Any]
    apply: Callable[..., Any]
    n_inputs: int = 1
    config: dict = dataclasses.field(default_factory=dict)


def param_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def describe(net: Network, params, state) -> str:
    lines = [f"{net.name}: {param_count(params):,} learnable params"]
    # record the factory config so an artifact dir identifies the exact
    # variant that trained (e.g. the conv_out_nonlinearity stability knob)
    for k in sorted(net.config):
        lines.append(f"  config {k} = {net.config[k]!r}")
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        lines.append(f"  {jax.tree_util.keystr(path)} {leaf.shape} {leaf.dtype}")
    return "\n".join(lines)
