"""Pallas TPU kernel: fused bilinear x2 upsample + 3x3 'same' conv.

The U-Net decoder's `bilinear_upsample=True` stage (reference
architectures/p2p.py:205-267: BilinearUpsample2DLayer -> Conv2D 3x3 'same')
is the flagship's dominant-FLOP block at large spatial sizes.  Unfused, XLA
materializes the 2x-resolution intermediate in HBM (e.g. (4,256,256,128)
bf16 = 64 MB per stage, read straight back); this kernel keeps the upsampled
tile in VMEM only.

Round-1's phase-decomposition rewrite of this pair was border-INEXACT
(docs/ROADMAP.md item 2) because the upsample clamps edges while the conv
zero-pads; inside one kernel both behaviors coexist exactly:

  * input is edge-padded (1 lo, 7 hi) XLA-side like ops/pallas/bilinear.py,
    so halo DMA windows are (8,128)-aligned and the *upsample* edge clamp is
    inherited from the padding;
  * each program builds the (2HT+2, 2WT+2, CT) upsampled tile with a 1-pixel
    conv halo (Theano half-pixel weights 1/4, 3/4), then zeroes halo rows or
    columns that fall outside the 2H x 2W output — the conv's zero padding;
  * the 3x3 conv runs as NINE tap-shifted matmuls (M, CT) @ (CT, F):
    channels stay on the 128-lane dimension throughout, so tap shifts are
    cheap sublane moves and there is no im2col relayout; channel chunks of
    128 accumulate into an fp32 tile.

Backward: custom VJP via the XLA composite (resize + conv) — upsample and
conv are linear in x, so the composite's vjp is exact; the fwd win also
benefits the eval/sampler paths on its own.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_LO, PAD_HI = 1, 7  # same 8-aligned halo-window trick as bilinear.py


def _kernel(xp_hbm, w_ref, b_ref, out_ref, scratch, sem, *,
            HT, WT, CT, C, F):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    wb = pl.program_id(2)
    n_h = pl.num_programs(1)
    n_w = pl.num_programs(2)
    n_chunks = C // CT
    acc = jnp.zeros((2 * HT * 2 * WT, F), jnp.float32)
    for cc in range(n_chunks):
        dma = pltpu.make_async_copy(
            xp_hbm.at[n,
                      pl.ds(hb * HT, HT + 8),
                      pl.ds(wb * WT, WT + 8),
                      pl.ds(cc * CT, CT)],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        s = scratch[:].astype(jnp.float32)
        # upsampled tile with a 1-pixel conv halo: rows u = 2h0-1 .. 2h0+2HT
        # (ro[k] = odd row 2(h0+k)-1, re[k] = even row 2(h0+k)), see bilinear
        # semantics in ops/resize.py
        ro = 0.75 * s[0:HT + 1] + 0.25 * s[1:HT + 2]
        re = 0.25 * s[0:HT + 1] + 0.75 * s[1:HT + 2]
        rows = jnp.stack([ro, re], axis=1).reshape(2 * HT + 2, WT + 8, CT)
        co = 0.75 * rows[:, 0:WT + 1] + 0.25 * rows[:, 1:WT + 2]
        ce = 0.25 * rows[:, 0:WT + 1] + 0.75 * rows[:, 1:WT + 2]
        up = jnp.stack([co, ce], axis=2).reshape(2 * HT + 2, 2 * WT + 2, CT)
        # conv zero padding: halo rows/cols outside the 2H x 2W image are 0
        ri = lax.broadcasted_iota(jnp.int32, (2 * HT + 2, 1, 1), 0)
        ci = lax.broadcasted_iota(jnp.int32, (1, 2 * WT + 2, 1), 1)
        row_ok = jnp.logical_and(
            jnp.logical_or(hb > 0, ri > 0),
            jnp.logical_or(hb < n_h - 1, ri < 2 * HT + 1))
        col_ok = jnp.logical_and(
            jnp.logical_or(wb > 0, ci > 0),
            jnp.logical_or(wb < n_w - 1, ci < 2 * WT + 1))
        up = jnp.where(jnp.logical_and(row_ok, col_ok), up, 0.0)
        # 3x3 conv as 9 tap-shifted matmuls: K = CT on lanes, no im2col
        for dy in range(3):
            for dx in range(3):
                sl = up[dy:dy + 2 * HT, dx:dx + 2 * WT, :]
                a = sl.reshape(2 * HT * 2 * WT, CT)
                acc = acc + jnp.dot(
                    a, w_ref[dy * 3 + dx, cc * CT:(cc + 1) * CT, :],
                    preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    out_ref[0] = acc.reshape(2 * HT, 2 * WT, F).astype(out_ref.dtype)


def _pick_tile(dim, target):
    for t in (target, 64, 32, 16, 8):
        if t <= target and dim % t == 0 and t % 8 == 0:
            return t
    return 0


TILE = 32
MIN_SPATIAL = 32  # engage from 32x32 up (64x64+ after upsample); measured


def supported(x_shape, w_shape, backend=None):
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    n, h, w, c = x_shape
    kh, kw, ci, f = w_shape
    ct = min(c, 128)
    return (kh == 3 and kw == 3 and ci == c
            and h >= MIN_SPATIAL and w >= MIN_SPATIAL
            and bool(_pick_tile(h, TILE)) and bool(_pick_tile(w, TILE))
            and c % ct == 0 and c % 8 == 0 and f % 8 == 0 and f <= 1024
            # VMEM budget (~16 MB/core): fp32 weights (9*c*f*4) + fp32 acc +
            # double-buffered out block must fit beside the upsample tiles;
            # measured on-chip: 512x128 fits, 1024x256 overflows ("exceeded
            # vmem" at allocation) -> cap the weight plane
            and c * f <= 512 * 128)


_INTERPRET = False  # tests flip this to exercise the kernel on CPU


def _pallas_call(x, w, b, out_dtype):
    n, h, wd, c = x.shape
    f = w.shape[-1]
    HT = _pick_tile(h, TILE)
    WT = _pick_tile(wd, TILE)
    CT = min(c, 128)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (PAD_LO, PAD_HI), (PAD_LO, PAD_HI), (0, 0)),
                 mode="edge")
    wm = w.reshape(9, c, f).astype(jnp.float32)
    bm = b.reshape(1, f).astype(jnp.float32)
    kern = functools.partial(_kernel, HT=HT, WT=WT, CT=CT, C=c, F=f)
    return pl.pallas_call(
        kern,
        grid=(n, h // HT, wd // WT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * HT, 2 * WT, f), lambda nn, hh, ww: (nn, hh, ww, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * wd, f), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((HT + 8, WT + 8, CT), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(xp, wm, bm)


def _xla_composite(x, w, b):
    n, h, wd, c = x.shape
    up = jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * wd, c),
                          method="bilinear")
    out = lax.conv_general_dilated(
        up, w.astype(jnp.float32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.astype(out.dtype)


def _dense_composite(x, w, b):
    """Same linear map as the kernel/_xla_composite, but built from the
    dense separable interp (ops/resize.py:_interp_axis) and conv2d in the
    caller's compute dtype.  Exists for the BACKWARD: jax.image.resize's
    transpose lowers to gathers plus f32 layout copies that the round-3
    trace measured at ~8.6 ms of the 67.7 ms flagship step
    (docs/artifacts_r3/attr/trace_ops.csv, source fused.py:104); this
    composite's adjoint is dense slice/concat/conv work in bf16."""
    from terrain_tpu.ops.conv import conv2d
    from terrain_tpu.ops.resize import upsample_bilinear_2x_lowp

    up = upsample_bilinear_2x_lowp(x)
    return conv2d(up, w, b, stride=1, padding="same", compute_dtype=x.dtype)


@jax.custom_vjp
def bilinear2x_conv3x3_pallas(x, w, b):
    """Fused bilinear-x2 + conv3x3 'same'; callers check `supported`."""
    return _pallas_call(x, w, b, x.dtype)


def _fwd(x, w, b):
    return bilinear2x_conv3x3_pallas(x, w, b), (x, w, b)


def _bwd(res, g):
    import os

    x, w, b = res
    if os.environ.get("TERRAIN_BC_BWD", "dense") == "xla32":
        _, vjp = jax.vjp(_xla_composite, x, w, b)
        dx, dw, db = vjp(g.astype(jnp.float32))
    else:
        _, vjp = jax.vjp(_dense_composite, x, w, b)
        dx, dw, db = vjp(g.astype(x.dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


bilinear2x_conv3x3_pallas.defvjp(_fwd, _bwd)
