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


def _interp_axis(x, axis):
    """Factor-2 half-pixel bilinear along `axis`, dense formulation.

    out[2j] = 0.25*in[j-1] + 0.75*in[j]; out[2j+1] = 0.75*in[j] +
    0.25*in[j+1] (edge-clamped) — the docstring formula, written as two
    shifted views + an interleave.  Everything is static slices, concats
    and adds, so BOTH directions are dense VPU work: the round-2 resize
    went through jax.image.resize, whose transpose lowers to gathers and
    f32 layout copies that the round-3 trace measured at ~8.6 ms of the
    67.7 ms flagship step (docs/artifacts_r3/attr/); this formulation's
    adjoint is pad+slice+add and fuses.
    """
    take = lambda s: jax.lax.slice_in_dim(x, s.start, s.stop, axis=axis)
    n = x.shape[axis]
    prev = jnp.concatenate([take(slice(0, 1)), take(slice(0, n - 1))], axis)
    nxt = jnp.concatenate([take(slice(1, n)), take(slice(n - 1, n))], axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=axis + 1)  # (..., n, 2, ...)
    shp = list(x.shape)
    shp[axis] = 2 * n
    return out.reshape(shp)


def _resize_impl():
    import os

    return os.environ.get("TERRAIN_RESIZE", "xla")


def upsample_bilinear_2x(x):
    """Bilinear x2 with half-pixel centres + edge clamp (layers.py:13-26).

    TERRAIN_PALLAS=1 dispatches to the tiled Pallas kernel
    (ops/pallas/bilinear.py); TERRAIN_RESIZE picks between jax.image.resize
    ("xla", default) and the dense separable-interp path ("dense") — both
    exact.  The dense path measured 3.3 ms/step SLOWER in the flagship
    step's context (docs/RESULTS_r3.md decomposition matrix: its
    stack-interleave lowers to stride-2 relayouts), so the conv-lowered
    XLA resize stays the forward default; the dense formulation remains
    the reference implementation and the low-precision adjoint vehicle."""
    if _use_pallas():
        from terrain_tpu.ops.pallas.bilinear import bilinear_2x_pallas

        return bilinear_2x_pallas(x)
    orig = x.dtype
    if _resize_impl() == "xla":
        n, h, w, c = x.shape
        out = jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c),
                               method="bilinear")
    else:
        out = _interp_axis(_interp_axis(x.astype(jnp.float32), 1), 2)
    return out.astype(orig)


def upsample_bilinear_2x_lowp(x):
    """upsample_bilinear_2x without the fp32 round-trip: interpolates in
    the input dtype.  Used by backward composites that already run the
    surrounding convs in bf16 (ops/pallas/bilinear_conv.py)."""
    if _resize_impl() == "xla":
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
    return _interp_axis(_interp_axis(x, 1), 2)


def upsample_bilinear_2x_weights():
    """The separable 1D kernel of the factor-2 bilinear transposed conv."""
    return jnp.array([0.25, 0.75, 0.75, 0.25], dtype=jnp.float32)
