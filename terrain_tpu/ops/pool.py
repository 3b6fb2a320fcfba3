"""Pooling ops (NHWC), mirroring the reference's Lasagne pool layers.

MaxPool2DLayer(pool_size=2) and Pool2DLayer(mode='average_inc_pad') are used
by the DCGAN discriminator (reference architectures/dcgan.py:46-52).  With
pool_size dividing the input and no implicit padding, 'average_inc_pad'
reduces to a plain mean over the window.
"""

import jax.numpy as jnp
from jax import lax


def max_pool2d(x, size=2, stride=None):
    s = stride or size
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, s, s, 1),
        padding="VALID",
    )


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
