"""Optimizers with Lasagne-exact update rules, over arbitrary PyTrees.

The reference trains with lasagne.updates.rmsprop at lr=1e-4 held in a
mutable theano.shared (experiments.py:39-40), so the learning rate here is a
*runtime argument* to `update` (a traced scalar) — the ReduceLROnPlateau
scheduler can mutate it between steps without recompiling.

rmsprop (lasagne):  accu' = rho*accu + (1-rho)*g^2
                    p'    = p - lr * g / sqrt(accu' + eps)      (rho=0.9, eps=1e-6)
adam (lasagne):     a_t = lr*sqrt(1-b2^t)/(1-b1^t); m,v EMAs; p' = p - a_t*m/(sqrt(v)+eps)

Four independent optimizer instances (one per network) are merged into a
single train step, as in the reference (pix2pix.py:131-141).
"""

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Optimizer:
    name: str
    default_lr: float
    init: Callable[[Any], Any]
    # update(grads, opt_state, params, lr) -> (new_params, new_opt_state)
    update: Callable[[Any, Any, Any, Any], Any]


def rmsprop(learning_rate=1.0, rho=0.9, epsilon=1e-6):
    def init(params):
        return {"accu": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params, lr):
        accu = jax.tree.map(
            lambda a, g: rho * a + (1.0 - rho) * jnp.square(g), state["accu"], grads
        )
        new_params = jax.tree.map(
            lambda p, g, a: p - lr * g / jnp.sqrt(a + epsilon), params, grads, accu
        )
        return new_params, {"accu": accu}

    return Optimizer("rmsprop", learning_rate, init, update)


def adam(learning_rate=1e-3, beta1=0.9, beta2=0.999, epsilon=1e-8):
    def init(params):
        return {
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params, lr):
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        a_t = lr * jnp.sqrt(1.0 - beta2**tf) / (1.0 - beta1**tf)
        m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * jnp.square(g), state["v"], grads)
        new_params = jax.tree.map(
            lambda p, m_, v_: p - a_t * m_ / (jnp.sqrt(v_) + epsilon), params, m, v
        )
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer("adam", learning_rate, init, update)


OPTIMIZERS = {"rmsprop": rmsprop, "adam": adam}


def get_optimizer(opt, opt_args=None):
    """Resolve 'rmsprop'/'adam' (+ kwargs, reference `opt`/`opt_args`) or pass
    an Optimizer through.  `learning_rate` in opt_args sets the default lr."""
    if isinstance(opt, Optimizer):
        return opt
    kwargs = dict(opt_args or {})
    return OPTIMIZERS[opt](**kwargs)
