"""Pallas TPU kernel: bilinear x2 upsampling (NHWC).

Same math as ops/resize.py (Theano bilinear_upsampling semantics:
out[2i] = 0.25 in[i-1] + 0.75 in[i]; out[2i+1] = 0.75 in[i] + 0.25 in[i+1],
edges clamped), expressed as a tiled VPU kernel:

  * the input is edge-padded by 1 in H and W once in XLA (cheap, fused),
    so tiles never special-case borders;
  * grid (N, H/HT, W/WT, C/CT); the padded input stays in HBM (pl.ANY) and
    each program DMAs its (HT+2, WT+2, CT) halo window into VMEM — halo
    overlap is impossible to express with blocked BlockSpecs, so this uses
    the manual make_async_copy pattern;
  * channels ride the 128-wide lane dimension; row/col interpolation is
    pure VPU work; outputs are written as (1, 2HT, 2WT, CT) blocks.

Backward: upsampling is linear, so the custom VJP reuses the XLA reference
path's transpose (one strided correlation) — no second kernel needed.

Enable via TERRAIN_PALLAS=1 (dispatch in ops/resize.py); the XLA
jax.image.resize path remains the default and the CPU fallback.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, out_ref, scratch, sem, *, HT, WT, CT):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    wb = pl.program_id(2)
    cb = pl.program_id(3)
    dma = pltpu.make_async_copy(
        xp_hbm.at[n,
                  pl.ds(hb * HT, HT + 2),
                  pl.ds(wb * WT, WT + 2),
                  pl.ds(cb * CT, CT)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    s = scratch[:]  # (HT+2, WT+2, CT)
    # rows: even uses (i, i+1), odd uses (i+1, i+2)
    re = 0.25 * s[:-2] + 0.75 * s[1:-1]          # (HT, WT+2, CT)
    ro = 0.75 * s[1:-1] + 0.25 * s[2:]           # (HT, WT+2, CT)
    rows = jnp.stack([re, ro], axis=1).reshape(2 * HT, WT + 2, CT)
    ce = 0.25 * rows[:, :-2] + 0.75 * rows[:, 1:-1]   # (2HT, WT, CT)
    co = 0.75 * rows[:, 1:-1] + 0.25 * rows[:, 2:]    # (2HT, WT, CT)
    out = jnp.stack([ce, co], axis=2).reshape(2 * HT, 2 * WT, CT)
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_tile(dim, target):
    for t in (target, 64, 32, 16, 8, 4, 2, 1):
        if t <= target and dim % t == 0:
            return t
    return 1


def _pallas_bilinear_2x(x):
    n, h, w, c = x.shape
    HT = _pick_tile(h, 64)
    WT = _pick_tile(w, 64)
    CT = _pick_tile(c, 128)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    grid = (n, h // HT, w // WT, c // CT)
    kernel = functools.partial(_kernel, HT=HT, WT=WT, CT=CT)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * HT, 2 * WT, CT),
            lambda nn, hh, ww, cc: (nn, hh, ww, cc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((HT + 2, WT + 2, CT), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


def _xla_bilinear_2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c),
                            method="bilinear").astype(x.dtype)


@jax.custom_vjp
def bilinear_2x_pallas(x):
    return _pallas_bilinear_2x(x)


def _fwd(x):
    return _pallas_bilinear_2x(x), x.shape


def _bwd(shape, g):
    # linear op: reuse the XLA path's transpose
    zero = jnp.zeros(shape, g.dtype)
    _, vjp = jax.vjp(_xla_bilinear_2x, zero)
    return (vjp(g)[0],)


bilinear_2x_pallas.defvjp(_fwd, _bwd)
