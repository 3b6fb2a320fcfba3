"""Pooling ops (NHWC), mirroring the reference's Lasagne pool layers.

MaxPool2DLayer(pool_size=2) and Pool2DLayer(mode='average_inc_pad') are used
by the DCGAN discriminator (reference architectures/dcgan.py:46-52).  With
pool_size dividing the input and no implicit padding, 'average_inc_pad'
reduces to a plain mean over the window.

Max-pool backward: XLA's reduce_window grad lowers to select-and-scatter;
the round-4 flagship trace attributes ~6.4 ms/step to pool fwd+bwd
(docs/RESULTS_r4.md section 4a).  Two custom-VJP alternatives exist:

* TERRAIN_POOL_VJP=dense (round 3): equality-mask against the broadcast
  max over a (n,h/2,2,w/2,2,c) window reshape, cotangent split among
  ties.  Measured IN CONTEXT on chip: 5.7 ms SLOWER (74.1 -> 68.4 when
  reverted, docs/RESULTS_r3.md) — the 6D reshape keeps permuting the
  (sublane, lane) tiling in bf16.  Kept as the measured-loss reference.
* TERRAIN_POOL_VJP=lanes (round 5): the same adjoint with every pairing
  op moved OFF the tiled dims — (n,h,w,c)->(n,h,w/2,2c) is a contiguous
  (free) reshape putting the W pair on the lane dim, and the H pair
  strides the major h dim.  Single-winner tie routing matching
  select-and-scatter's row-major-first convention (tests/test_ops.py).

Both default OFF pending the in-context chip A/B (round-3 lesson: the
composition decides, not the op microbench).
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


def _lanes_core(x):
    """2x2 s2 max pool via lane-dim W pairing + major-dim H pairing.

    (n,h,w,c) -> (n,h,w/2,2c) is a CONTIGUOUS reshape (free, no relayout):
    lane row w-pair p holds [x[.., 2p, :], x[.., 2p+1, :]], so the W-pair
    max is a lane-slice maximum and the H-pair max strides the MAJOR h dim
    — neither touches the (sublane, lane) tiling the round-3 dense
    formulation's 6D window reshape kept permuting."""
    n, h, w, c = x.shape
    xr = x.reshape(n, h, w // 2, 2 * c)
    m = jnp.maximum(xr[..., :c], xr[..., c:])
    return jnp.maximum(m[:, 0::2], m[:, 1::2]), m


@jax.custom_vjp
def _max_pool2d_lanes(x):
    return _lanes_core(x)[0]


def _lanes_fwd(x):
    y, _ = _lanes_core(x)
    return y, (x,)


def _lanes_bwd(res, g):
    (x,) = res
    n, h, w, c = x.shape
    xr = x.reshape(n, h, w // 2, 2 * c)
    a, b = xr[..., :c], xr[..., c:]
    m = jnp.maximum(a, b)
    # single-winner routing, ties to the row-major-first element — the same
    # convention as XLA's select-and-scatter (grads equality-tested on
    # tie-free inputs and on deliberate ties, tests/test_ops.py)
    hm = m[:, 0::2] >= m[:, 1::2]
    ge = g.astype(x.dtype)
    de = jnp.where(hm, ge, 0)
    do = jnp.where(hm, 0, ge)
    dm = jnp.stack([de, do], axis=2).reshape(n, h, w // 2, c)
    wm = a >= b
    dxr = jnp.concatenate(
        [jnp.where(wm, dm, 0), jnp.where(wm, 0, dm)], axis=-1)
    return (dxr.reshape(n, h, w, c),)


_max_pool2d_lanes.defvjp(_lanes_fwd, _lanes_bwd)


def max_pool2d(x, size=2, stride=None):
    """Max pool; 2x2 s2 fwd/bwd formulation via TERRAIN_POOL_VJP:
    'sas' (default) = XLA reduce_window grad (select-and-scatter),
    'pallas' = in-VMEM Pallas fwd+bwd kernels (ops/pallas/pool2.py —
    block-level lane-pair view, no XLA-visible interleaves),
    'lanes' = lane/major-dim pairing custom VJP (_max_pool2d_lanes;
    measured +11 ms in-context round 5 — XLA still pays relayouts),
    'dense' = round-3 6D window-reshape VJP (measured +5.7 ms).
    The losing modes are kept as measured reference points.  Read at
    TRACE time."""
    import os

    s = stride or size
    mode = os.environ.get("TERRAIN_POOL_VJP", "sas")
    if (s == size and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape[1] % size == 0 and x.shape[2] % size == 0):
        if mode == "pallas" and size == 2:
            from terrain_tpu.ops.pallas import pool2

            if pool2.supported(x.shape):
                return pool2.max_pool2_pallas(x)
        if mode == "lanes" and size == 2:
            return _max_pool2d_lanes(x)
        if mode == "dense":
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
