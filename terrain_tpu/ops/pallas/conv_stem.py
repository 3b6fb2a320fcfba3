"""Pallas TPU kernel: the tiny-cin 5x5 stride-1 'stem' convolution.

The DCGAN discriminator's first layer (reference architectures/dcgan.py:46-50:
Conv2D 5x5 pad='same' over a 1-channel 512px heightmap into 64 maps) is the
shape XLA handles worst on TPU: with cin=1 the contraction dimension is 1-25,
the MXU runs ~1% occupied, and the measured in-context cost was ~24 ms of a
131 ms train step (docs/ROADMAP.md item 1 — ~600x off roofline).  SURVEY.md
§7 "hard parts" called this exact shape out.  The graph-level im2col rewrite
was measured and REJECTED in round 1 (materializing patches in HBM kills XLA
fusion in fwd+bwd); this kernel keeps the patch tensor in VMEM only.

Design (NHWC, cin=1, k=5, s=1, symmetric 'same' padding):
  * XLA-side: squeeze the channel, pad H by (2, 6) and W by (2, W_PAD-2-W)
    so every DMA window has 8-aligned starts/sizes in sublanes and the row
    span is one 128-aligned block of lanes (Mosaic requires (8, 128)-tiled
    slices, see ops/pallas/bilinear.py lessons);
  * grid (N, H/TH): each program DMAs a (TH+8, Wp) halo row-band from HBM
    (pl.ANY) into VMEM, builds the (TH*W, 25) patch matrix by 25 static
    shifted slices (VMEM-only), and runs ONE MXU dot against the (25, F)
    weight matrix;
  * output block (1, TH, W, F), optional fused bias.

Backward: custom VJP.  dW = patches^T @ g is the SAME im2col structure with
a huge contraction (M = N*H*W) — MXU-friendly, one accumulating kernel.
dX = conv_transpose(g, w) has cout=1 (again MXU-hostile in XLA), computed as
h = g @ W^T (one big (M,F)@(F,25) dot) followed by 25 shifted adds — also a
kernel.  Both fall back to XLA off-TPU / off-regime.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Halo: 2 rows/cols before and after; windows padded to 8-aligned sizes.
PAD_LO = 2
K = 5


def _w_pad(w):
    """Padded row length: W + halo, rounded up to a lane multiple."""
    return ((w + 4 + 127) // 128) * 128


def _fwd_kernel(xp_hbm, w_ref, b_ref, out_ref, scratch, sem, *, TH, W, Wp, F):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    # rows [hb*TH - 2, hb*TH + TH + 6) of the unpadded image (xp has 2 lo pad)
    dma = pltpu.make_async_copy(
        xp_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    s = scratch[:]
    # patches[(y, x), (dy, dx)] = s[y + dy, x + dx]  (y < TH, x < W)
    taps = [s[dy:dy + TH, dx:dx + W] for dy in range(K) for dx in range(K)]
    patches = jnp.stack(taps, axis=-1).reshape(TH * W, K * K)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    out = out + b_ref[0]
    out_ref[0] = out.reshape(TH, W, F).astype(out_ref.dtype)


def _dw_kernel(xp_hbm, g_ref, out_ref, scratch, sem, *, TH, W, Wp, F):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    s = scratch[:]
    taps = [s[dy:dy + TH, dx:dx + W] for dy in range(K) for dx in range(K)]
    patches = jnp.stack(taps, axis=-1).reshape(TH * W, K * K)
    g = g_ref[0].reshape(TH * W, F).astype(jnp.float32)
    part = jax.lax.dot_general(  # (25, M) @ (M, F): contraction over pixels
        patches, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    part32 = jnp.concatenate(  # pad rows 25 -> 32: 8-aligned full-block RMW
        [part, jnp.zeros((32 - K * K, F), jnp.float32)], axis=0)
    first = jnp.logical_and(n == 0, hb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += part32  # grid is sequential on TPU: safe accumulation


def _dx_kernel(gp_hbm, w_ref, out_ref, scratch, sem, *, TH, W, Wp, F):
    """dX row band: h = g_halo @ W^T (one dot), then 25 shifted adds.

    dX[y, x] = sum_{dy,dx} g[y + 2 - dy, x + 2 - dx] * w[dy, dx]
             = sum_{dy,dx} gh[y + (4-dy) - 2, ...]  with gh 2-lo-padded,
    i.e. tap (dy, dx) of h is read at shifted offset (4-dy, 4-dx)."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        gp_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, Wp), pl.ds(0, F)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    gh = scratch[:].reshape((TH + 8) * Wp, F).astype(jnp.float32)
    h = jnp.dot(gh, w_ref[:], preferred_element_type=jnp.float32)
    h = h.reshape(TH + 8, Wp, K * K)
    acc = jnp.zeros((TH, W), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            t = dy * K + dx
            acc = acc + h[4 - dy:4 - dy + TH, 4 - dx:4 - dx + W, t]
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_th(h, dtype):
    # VMEM budget: out block (TH, W, F) double-buffered + patch intermediates
    for t in (32, 16, 8):
        if h % t == 0:
            return t
    return 0


def supported(x_shape, w_shape, stride, padding, backend=None):
    """Regime guard: the shapes this kernel wins on (auto-dispatch)."""
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, f = w_shape
    return (padding == "same" and stride in (1, (1, 1))
            and kh == K and kw == K and c == 1 and ci == 1
            and h >= 256 and w >= 256 and w % 128 == 0
            and f % 8 == 0 and f <= 512
            and _pick_th(h, None) != 0)


def _pad_rows(x2d, wp):
    """(N, H, W) -> (N, H + 8, Wp): 2 lo / 6 hi rows, 2 lo cols, zeros."""
    n, h, w = x2d.shape
    return jnp.pad(x2d, ((0, 0), (PAD_LO, 6), (PAD_LO, wp - w - PAD_LO)))


def _conv_stem_fwd_pallas(x, w, b, out_dtype, interpret=False):
    n, h, wdt, _ = x.shape
    kh, kw, _, f = w.shape
    TH = _pick_th(h, x.dtype)
    Wp = _w_pad(wdt)
    xp = _pad_rows(x[..., 0].astype(jnp.float32), Wp)
    wm = w.reshape(K * K, f).astype(jnp.float32)
    bm = b.reshape(1, f).astype(jnp.float32)
    kern = functools.partial(_fwd_kernel, TH=TH, W=wdt, Wp=Wp, F=f)
    return pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, wdt, f), lambda nn, hh: (nn, hh, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, f), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wm, bm)


def _conv_stem_dw_pallas(x, g, f, interpret=False):
    n, h, wdt, _ = x.shape
    TH = _pick_th(h, x.dtype)
    Wp = _w_pad(wdt)
    xp = _pad_rows(x[..., 0].astype(jnp.float32), Wp)
    kern = functools.partial(_dw_kernel, TH=TH, W=wdt, Wp=Wp, F=f)
    # output rows padded 25 -> 32 for sublane alignment; sliced by caller
    out = pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TH, wdt, f), lambda nn, hh: (nn, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, f), lambda nn, hh: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, g)
    return out[:K * K].reshape(K, K, 1, f)


def _conv_stem_dx_pallas(g, w, out_dtype, interpret=False):
    n, h, wdt, f = g.shape
    TH = _pick_th(h, g.dtype)
    Wp = _w_pad(wdt)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (PAD_LO, 6), (PAD_LO, Wp - wdt - PAD_LO), (0, 0)))
    # h-tensor tap t=(dy,dx) contracts g with w[dy,dx,:]: (F, 25) transposed
    wt = w.reshape(K * K, f).astype(jnp.float32).T  # (F, 25)
    kern = functools.partial(_dx_kernel, TH=TH, W=wdt, Wp=Wp, F=f)
    out = pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, wdt), lambda nn, hh: (nn, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp, f), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gp, wt)
    return out[..., None]


def _xla_conv(x, w, b):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), dimension_numbers=_DIMNUMS)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


_INTERPRET = False  # tests flip this to exercise the kernels on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv_stem(x, w, b):
    """5x5 s1 'same' conv for cin=1 via the Pallas stem kernel.

    Callers must have checked `supported(...)`; exactness vs the XLA path is
    tested (tests/test_pallas.py).  b may be zeros (bias folded by caller).
    """
    return _conv_stem_fwd_pallas(x, w, b, x.dtype, interpret=_INTERPRET)


def _conv_stem_fwd(x, w, b):
    return conv_stem(x, w, b), (x, w)


def _conv_stem_bwd(res, g):
    x, w = res
    f = w.shape[-1]
    dw = _conv_stem_dw_pallas(x, g.astype(jnp.float32), f,
                              interpret=_INTERPRET).astype(w.dtype)
    dx = _conv_stem_dx_pallas(g, w, x.dtype, interpret=_INTERPRET)
    db = g.sum(axis=(0, 1, 2)).astype(jnp.float32)
    return dx, dw, db


conv_stem.defvjp(_conv_stem_fwd, _conv_stem_bwd)
