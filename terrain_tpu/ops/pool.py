"""Pooling ops (NHWC), mirroring the reference's Lasagne pool layers.

MaxPool2DLayer(pool_size=2) and Pool2DLayer(mode='average_inc_pad') are used
by the DCGAN discriminator (reference architectures/dcgan.py:46-52).  With
pool_size dividing the input and no implicit padding, 'average_inc_pad'
reduces to a plain mean over the window.

Max-pool backward: XLA's reduce_window grad lowers to select-and-scatter,
which the round-3 flagship trace measured at ~3.8 ms/step
(docs/artifacts_r3/attr/trace_ops.csv, source pool.py).  A dense custom
VJP was built (equality-mask against the broadcast max, cotangent split
evenly among ties — sum-preserving; select-and-scatter routes to the first
maximum; ties have measure zero on continuous activations) and measured
IN CONTEXT on chip: the dense backward made the full step 5.7 ms SLOWER
(74.1 -> 68.4 when reverted, docs/RESULTS_r3.md decomposition matrix) —
its (n,h/2,2,w/2,2,c) window reshape relayouts in bf16 cost more than the
scatter it replaced.  It therefore defaults OFF; TERRAIN_POOL_VJP=dense
re-enables it (grads equality-tested against the reduce_window grad on
tie-free inputs, tests/test_ops.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _reduce_window_max(x, size, s):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, s, s, 1),
        padding="VALID",
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool2d_nonoverlap(x, size):
    return _reduce_window_max(x, size, size)


def _mp_fwd(x, size):
    y = _reduce_window_max(x, size, size)
    return y, (x, y)


def _mp_bwd(size, res, g):
    x, y = res
    n, h, w, c = x.shape
    k = size
    xr = x.reshape(n, h // k, k, w // k, k, c)
    mask = (xr == y[:, :, None, :, None, :]).astype(g.dtype)
    cnt = jnp.sum(mask, axis=(2, 4), keepdims=True)
    dx = mask * (g[:, :, None, :, None, :] / cnt)
    return (dx.reshape(x.shape).astype(x.dtype),)


_max_pool2d_nonoverlap.defvjp(_mp_fwd, _mp_bwd)


def max_pool2d(x, size=2, stride=None):
    import os

    s = stride or size
    if (s == size and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape[1] % size == 0 and x.shape[2] % size == 0
            and os.environ.get("TERRAIN_POOL_VJP", "sas") == "dense"):
        return _max_pool2d_nonoverlap(x, size)
    return _reduce_window_max(x, size, s)


def avg_pool2d(x, size=2, stride=None):
    s = stride or size
    if isinstance(size, int):
        size = (size, size)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, size[0], size[1], 1),
        window_strides=(1, s, s, 1) if isinstance(s, int) else (1, s[0], s[1], 1),
        padding="VALID",
    )
    return (summed / (size[0] * size[1])).astype(x.dtype)
