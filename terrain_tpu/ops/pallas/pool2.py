"""Pallas TPU kernels: 2x2 stride-2 max pool, forward + backward.

The DCGAN discriminator's per-stage MaxPool2 (reference
architectures/dcgan.py:46-52) costs ~6.4 ms/step of the 512px flagship in
XLA: the backward lowers to select-and-scatter (~3.8 ms across stages,
round-4 trace), the forward reduce-window ~1.8 ms, plus ~0.6 ms of layout
copies — ~7x off the bandwidth bound.  Two graph-level rewrites lost to
relayouts (round 3 'dense' +5.7 ms; round 5 'lanes' +11 ms in-context):
ANY XLA-visible formulation pays stride-2 interleave copies on the tiled
dims.

These kernels avoid sublane work entirely via the same contiguous-view
trick as ops/pool.py:_lanes_core, applied at the BLOCK level:

  * XLA-side, x is VIEWED as xr = x.reshape(n, h/2, 2, w/2, 2c) —
    contiguous, free: each lane row holds [x[.., 2p, :] | x[.., 2p+1, :]]
    and the H pair sits on its own MAJOR (untiled) axis;
  * the W-pair max/mask becomes a STATIC LANE-slice maximum (offsets 0
    and C), the H pair a STATIC index on the major axis — no strided
    slices, stacks, or gathers anywhere in the kernel (the first on-chip
    compile of a stride-2 `m[0::2]` formulation died with Mosaic's
    "Only 2D gather is supported": strided major-dim slices and
    jnp.stack lower to gathers — round-2 lesson, round-5 instance);
  * the backward writes dxr in the same view (four static-index,
    static-lane-offset stores), so the final dx.reshape(n, h, w, c) is
    free again;
  * compares run in f32 (Mosaic rejects cmpf on packed bf16, see
    conv_stem.py round-2 notes); tie routing is row-major-first, matching
    select-and-scatter (tests/test_ops.py conventions).

Gated by TERRAIN_POOL_VJP=pallas pending the on-chip in-context A/B
(ops/pool.py dispatch).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h, w, c):
    """Rows of y per block (x block has 2*TH rows).  h is even here.

    Clamped so the f32 block view stays ~1 MiB (8*t*w*c bytes): the
    flagship's (4, 512, 512, 64) stage at th=16 put ~12 MB of f32
    temporaries in scoped VMEM and crashed the remote compile helper
    (docs/artifacts_r5 round-5 check); th is a major dim, so small
    values only add grid steps to a bandwidth-bound kernel.
    """
    for t in (16, 8, 4, 2, 1):
        if (h // 2) % t == 0 and t * w * c <= 131072:
            return t
    return 0


def supported(x_shape, backend=None):
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if len(x_shape) != 4:
        return False
    n, h, w, c = x_shape
    return (h % 2 == 0 and w % 2 == 0
            and (w // 2) % 8 == 0          # sublane-aligned blocks
            and c % 8 == 0 and c <= 512    # static lane slices at offset c
            and _pick_th(h, w, c) != 0
            and h >= 8)


def _fwd_kernel(xr_ref, y_ref, *, C):
    v = xr_ref[0].astype(jnp.float32)             # (TH, 2, W2, 2C)
    m = jnp.maximum(v[..., :C], v[..., C:])       # W pair: lane slices
    y = jnp.maximum(m[:, 0], m[:, 1])             # H pair: static index
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(xr_ref, g_ref, dxr_ref, *, C):
    v = xr_ref[0].astype(jnp.float32)             # (TH, 2, W2, 2C)
    a, b = v[..., :C], v[..., C:]
    m = jnp.maximum(a, b)                         # (TH, 2, W2, C)
    hm = m[:, 0] >= m[:, 1]                       # H winner: even-first ties
    g = g_ref[0].astype(jnp.float32)              # (TH, W2, C)
    de = jnp.where(hm, g, 0.0)                    # routed to H-even row
    do = jnp.where(hm, 0.0, g)                    # routed to H-odd row
    we = a[:, 0] >= b[:, 0]                       # W winners per H row
    wo = a[:, 1] >= b[:, 1]                       # (even-first ties)
    dt = dxr_ref.dtype
    dxr_ref[0, :, 0, :, :C] = jnp.where(we, de, 0.0).astype(dt)
    dxr_ref[0, :, 0, :, C:] = jnp.where(we, 0.0, de).astype(dt)
    dxr_ref[0, :, 1, :, :C] = jnp.where(wo, do, 0.0).astype(dt)
    dxr_ref[0, :, 1, :, C:] = jnp.where(wo, 0.0, do).astype(dt)


_INTERPRET = False  # tests flip this to exercise the kernels on CPU


def _fwd_call(x):
    n, h, w, c = x.shape
    th = _pick_th(h, w, c)
    w2 = w // 2
    xr = x.reshape(n, h // 2, 2, w2, 2 * c)
    kern = functools.partial(_fwd_kernel, C=c)
    return pl.pallas_call(
        kern,
        grid=(n, (h // 2) // th),
        in_specs=[pl.BlockSpec((1, th, 2, w2, 2 * c),
                               lambda nn, hh: (nn, hh, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w2, c), lambda nn, hh: (nn, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w2, c), x.dtype),
        interpret=_INTERPRET,
    )(xr)


def _bwd_call(x, g):
    n, h, w, c = x.shape
    th = _pick_th(h, w, c)
    w2 = w // 2
    xr = x.reshape(n, h // 2, 2, w2, 2 * c)
    kern = functools.partial(_bwd_kernel, C=c)
    dxr = pl.pallas_call(
        kern,
        grid=(n, (h // 2) // th),
        in_specs=[
            pl.BlockSpec((1, th, 2, w2, 2 * c),
                         lambda nn, hh: (nn, hh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w2, c), lambda nn, hh: (nn, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 2, w2, 2 * c),
                               lambda nn, hh: (nn, hh, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, 2, w2, 2 * c), x.dtype),
        interpret=_INTERPRET,
    )(xr, g.astype(x.dtype))
    return dxr.reshape(n, h, w, c)


@jax.custom_vjp
def max_pool2_pallas(x):
    """2x2 s2 max pool; callers check `supported` (ops/pool.py)."""
    return _fwd_call(x)


def _mp_fwd(x):
    return _fwd_call(x), (x,)


def _mp_bwd(res, g):
    (x,) = res
    return (_bwd_call(x, g),)


max_pool2_pallas.defvjp(_mp_fwd, _mp_bwd)
