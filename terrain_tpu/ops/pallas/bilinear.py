"""Pallas TPU kernel: bilinear x2 upsampling (NHWC).

Same math as ops/resize.py (Theano bilinear_upsampling semantics:
out[2i] = 0.25 in[i-1] + 0.75 in[i]; out[2i+1] = 0.75 in[i] + 0.25 in[i+1],
edges clamped), expressed as a tiled VPU kernel:

  * the input is edge-padded once in XLA — 1 before and 7 after in H and W,
    so every DMA window is (HT+8, WT+8, CT) with starts on tile multiples:
    Mosaic requires slice sizes/offsets aligned to the (8, 128) fp32 tiling
    (the real-TPU compiler rejects a 66-wide slice; interpret mode does not);
  * grid (N, H/HT, W/WT, C/CT); the padded input stays in HBM (pl.ANY) and
    each program DMAs its halo window into VMEM — overlapping halo windows
    aren't expressible with blocked BlockSpecs, so this uses the manual
    make_async_copy pattern;
  * channels ride the 128-wide lane dimension; row/col interpolation is
    pure VPU work; outputs are written as (1, 2HT, 2WT, CT) blocks.

Backward: upsampling is linear, so the custom VJP reuses the XLA reference
path's transpose — no second kernel needed.

Dispatch: TERRAIN_PALLAS=1 (ops/resize.py); shapes must have H, W multiples
of the tile (>= 8) and C a multiple of 128, else the XLA path is used.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_LO, PAD_HI = 1, 7  # window = [h0 - 1, h0 + HT + 7): 8-aligned size/start


def _kernel(xp_hbm, out_ref, scratch, sem, *, HT, WT, CT):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    wb = pl.program_id(2)
    cb = pl.program_id(3)
    # xp is padded by (1, 7): window start hb*HT maps to unpadded hb*HT - 1
    dma = pltpu.make_async_copy(
        xp_hbm.at[n,
                  pl.ds(hb * HT, HT + 8),
                  pl.ds(wb * WT, WT + 8),
                  pl.ds(cb * CT, CT)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    s = scratch[:]  # rows/cols [i-1 .. i+HT+6] of the unpadded image
    # rows: out[2i] needs (i-1, i), out[2i+1] needs (i, i+1)
    re = 0.25 * s[0:HT] + 0.75 * s[1:HT + 1]
    ro = 0.75 * s[1:HT + 1] + 0.25 * s[2:HT + 2]
    rows = jnp.stack([re, ro], axis=1).reshape(2 * HT, WT + 8, CT)
    ce = 0.25 * rows[:, 0:WT] + 0.75 * rows[:, 1:WT + 1]
    co = 0.75 * rows[:, 1:WT + 1] + 0.25 * rows[:, 2:WT + 2]
    out = jnp.stack([ce, co], axis=2).reshape(2 * HT, 2 * WT, CT)
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_tile(dim, target, align=8):
    for t in (target, 128, 64, 32, 16, 8):
        if t <= target and dim % t == 0 and t % align == 0:
            return t
    return 0


# 32x32 tiles: the out block (64,64,128) f32 + halo scratch + the
# stack/reshape intermediates stay well under the ~16 MB VMEM budget
# (64-tiles ran out of VMEM on real hardware)
TILE = 32

# Regime guard from real-TPU measurement (docs/RESULTS_r1.md): the kernel
# beats XLA resize on large-spatial inputs (e.g. 1.29x at 256x256x128) but
# collapses when the grid degenerates into many small programs with
# serialized halo DMAs (10x slower at 64x64x512).  Require enough spatial
# extent per channel block that each program does meaningful work.
MIN_SPATIAL = 128


def pallas_supported(shape, dtype=jnp.float32):
    n, h, w, c = shape
    return (h >= MIN_SPATIAL and w >= MIN_SPATIAL
            and _pick_tile(h, TILE) and _pick_tile(w, TILE)
            and c % 128 == 0 and dtype == jnp.float32)


def _pallas_bilinear_2x(x):
    n, h, w, c = x.shape
    HT = _pick_tile(h, TILE)
    WT = _pick_tile(w, TILE)
    CT = 128
    xp = jnp.pad(x, ((0, 0), (PAD_LO, PAD_HI), (PAD_LO, PAD_HI), (0, 0)),
                 mode="edge")
    grid = (n, h // HT, w // WT, c // CT)
    kernel = functools.partial(_kernel, HT=HT, WT=WT, CT=CT)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * HT, 2 * WT, CT),
            lambda nn, hh, ww, cc: (nn, hh, ww, cc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((HT + 8, WT + 8, CT), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


def _xla_bilinear_2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c),
                            method="bilinear").astype(x.dtype)


@jax.custom_vjp
def bilinear_2x_pallas(x):
    if not pallas_supported(x.shape, x.dtype):
        return _xla_bilinear_2x(x)
    return _pallas_bilinear_2x(x)


def _fwd(x):
    return bilinear_2x_pallas(x), x.shape


def _bwd(shape, g):
    # linear op: reuse the XLA path's transpose
    zero = jnp.zeros(shape, g.dtype)
    _, vjp = jax.vjp(_xla_bilinear_2x, zero)
    return (vjp(g)[0],)


bilinear_2x_pallas.defvjp(_fwd, _bwd)
