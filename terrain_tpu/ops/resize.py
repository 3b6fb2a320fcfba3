"""Upsampling ops (NHWC).

The reference uses two upsampling flavours:
  * repeat ("nearest") upscale — lasagne.layers.Upscale2DLayer
    (architectures/dcgan.py:31);
  * bilinear x2 — theano bilinear_upsampling via BilinearUpsample2DLayer
    (architectures/layers.py:13-26), i.e. a stride-2 transposed conv with the
    separable kernel [1/4, 3/4, 3/4, 1/4] and edge-replicated borders.  That
    is exactly half-pixel-centres bilinear resizing with edge clamping, which
    is what jax.image.resize(method='bilinear') computes:
        out[2j]   = 0.25*in[j-1] + 0.75*in[j]
        out[2j+1] = 0.75*in[j]   + 0.25*in[j+1]   (indices clamped at edges)
    verified against a direct NumPy transposed-conv implementation in
    tests/test_ops.py.

A Pallas kernel provides the same math fused with the decoder conv; XLA path
here is the reference implementation and the CPU fallback.
"""

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x):
    """Repeat-upscale by 2 in H and W (lasagne Upscale2DLayer, dcgan.py:31)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _use_pallas():
    import os

    return os.environ.get("TERRAIN_PALLAS") == "1"


def upsample_bilinear_2x(x):
    """Bilinear x2 with half-pixel centres + edge clamp (layers.py:13-26).

    TERRAIN_PALLAS=1 dispatches to the tiled Pallas kernel
    (ops/pallas/bilinear.py); default is the XLA resize path."""
    if _use_pallas():
        from terrain_tpu.ops.pallas.bilinear import bilinear_2x_pallas

        return bilinear_2x_pallas(x)
    n, h, w, c = x.shape
    orig = x.dtype
    out = jax.image.resize(
        x.astype(jnp.float32), (n, 2 * h, 2 * w, c), method="bilinear"
    )
    return out.astype(orig)


def upsample_bilinear_2x_weights():
    """The separable 1D kernel of the factor-2 bilinear transposed conv."""
    return jnp.array([0.25, 0.75, 0.75, 0.25], dtype=jnp.float32)
