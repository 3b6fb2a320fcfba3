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
import os

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


def _row_patches(scratch, y, W):
    """(25, W) patch matrix (f32) for output row y: row t=(dy,dx) is the
    input row shifted by (dy, dx), read from the dx-pre-shifted plane stack
    `scratch` (K, TH+8, Wp) at lane offset 0.

    Why planes: slicing one buffer at lane starts dx=0..4 bakes the offset
    into the vector's layout metadata, and tpu.concatenate rejects inputs
    whose offsets differ on a non-concat dim ("result/input offset
    mismatch"); a dynamic lane start instead must be provably 128-aligned
    ("cannot statically prove that index in dimension 1 is a multiple of
    128"); jnp.stack needs an unsupported (8,128)->(8,128,1) relayout.
    All three measured on real Mosaic (docs/RESULTS_r2.md) — shifting
    XLA-side into K planes keeps every in-kernel load at lane offset 0
    (sublane offsets may differ: dim 0 is the concat dim)."""
    return jnp.concatenate(
        [scratch[dx, pl.ds(y + dy, 1), pl.ds(0, W)]
         for dy in range(K) for dx in range(K)], axis=0).astype(jnp.float32)


def _fwd_kernel(xs_hbm, w_ref, b_ref, out_ref, scratch, sem, *, TH, W, Wp, F,
                slope):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    # rows [hb*TH - 2, hb*TH + TH + 6) of the unpadded image (xp has 2 lo
    # pad), all K dx-shifted planes in one strided DMA
    dma = pltpu.make_async_copy(
        xs_hbm.at[n, pl.ds(0, K), pl.ds(hb * TH, TH + 8), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    b = b_ref[0]
    # one MXU dot per output row: (25, W) contracted on dim0 with (25, F)
    for y in range(TH):
        row = jax.lax.dot_general(
            _row_patches(scratch, y, W), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (W, F)
        row = row + b
        if slope is not None:
            # fused LeakyReLU epilogue while the tile is in VMEM: the
            # standalone select after this custom-call cost 1.6 ms + a
            # 1.6 ms layout copy in the round-3 trace (activations.py:23)
            row = jnp.maximum(row, slope * row)
        out_ref[0, y] = row.astype(out_ref.dtype)


def _dw_kernel(xs_hbm, g_ref, *rest, TH, W, Wp, F, slope=None):
    if slope is None:
        out_ref, scratch, sem = rest
        y_ref = None
    else:
        # fused leaky backward: g arrives RAW and the activation select
        # runs here against the saved fused output y — the XLA-side
        # select was a standalone HBM round trip (a compare_select
        # fusion that cannot fuse into this custom call)
        y_ref, out_ref, scratch, sem = rest
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xs_hbm.at[n, pl.ds(0, K), pl.ds(hb * TH, TH + 8), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    part = jnp.zeros((K * K, F), jnp.float32)
    gsum = jnp.zeros((1, F), jnp.float32)
    # per output row: (25, W) patches x (W, F) grads -> (25, F), contraction
    # over the W pixels (K = 512 fills the MXU depth)
    for y in range(TH):
        g = g_ref[0, y].astype(jnp.float32)  # (W, F)
        if y_ref is not None:
            # compare in f32: Mosaic rejects arith.cmpf on packed bf16
            # vectors ("Target does not support this comparison", v5e)
            g = jnp.where(y_ref[0, y].astype(jnp.float32) >= 0, g, slope * g)
        part = part + jax.lax.dot_general(
            _row_patches(scratch, y, W), g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # bias grad rides along: db = sum g, accumulated into pad row 25 —
        # the standalone g.sum re-read 268 MB of g (2.2 ms/step, round-3
        # trace fusion.2297)
        gsum = gsum + jnp.sum(g, axis=0, keepdims=True)
    part32 = jnp.concatenate(  # pad rows 25 -> 32: 8-aligned full-block RMW
        [part, gsum, jnp.zeros((32 - K * K - 1, F), jnp.float32)], axis=0)
    first = jnp.logical_and(n == 0, hb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += part32  # grid is sequential on TPU: safe accumulation


def _dx_kernel(gt_hbm, w_ref, out_ref, scratch, bstash, sem, *, TH, W, Wp, F):
    """dX row band from the TRANSPOSED cotangent gT (N, Hp, F, Wp).

    dX[y, x] = sum_{dy,dx,f} g[y + 2 - dy, x + 2 - dx, f] * w[dy, dx, f];
    with gp 2-lo-padded, output row y reads gp band row rp = y + (4 - dy)
    at column offset 4 - dx.  Per band row: ONE dot B = w(25,F) @ r(F,Wp)
    (so B rows are taps, W stays on lanes), then static shifted row-adds.
    The transposed layout exists because contracting F any other way lands
    W on sublanes, and real Mosaic has no cheap (Wp,k)->(1,W) relayout."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        gt_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, F), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    acc = [jnp.zeros((1, W), jnp.float32) for _ in range(TH)]
    for rp in range(TH + 8):
        r = scratch[rp].astype(jnp.float32)  # (F, Wp)
        B = jax.lax.dot_general(
            w_ref[:], r, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (25, Wp)
        # round-trip B through VMEM so the shifted tap slices are ref loads
        # (canonical lane offset) — vector slices at offsets 1..4 feed adds
        # Mosaic won't relayout (same failure class as _row_patches)
        bstash[0:K * K] = B
        for dy in range(K):
            y = rp - (4 - dy)
            if 0 <= y < TH:
                for dx in range(K):
                    t = dy * K + dx
                    acc[y] = acc[y] + bstash[pl.ds(t, 1), pl.ds(4 - dx, W)]
    for y in range(TH):
        out_ref[0, y] = acc[y][0].astype(out_ref.dtype)


def _pick_th(h, dtype):
    # VMEM budget: out block (TH, W, F) double-buffered + patch intermediates.
    # TERRAIN_STEM_TH caps the ladder for per-batch-size tile A/Bs (the
    # 16-caps below still apply where measured; read per call — cheap).
    cap = int(os.environ.get("TERRAIN_STEM_TH", "32"))
    for t in (32, 16, 8):
        if t <= cap and h % t == 0:
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


def _plane_dtype(x):
    """HBM dtype for the plane stack.  TERRAIN_STEM_PLANES=bf16 stores the
    K shifted planes (the round-4 trace's ~4.5 ms 'stem boundary stacks'
    line — fwd and dW each write+read ~27 MB of f32 planes per step at
    512px bs4) in bf16 instead, halving that traffic.  EXACT when the
    input is already bf16 (the flagship TERRAIN_DTYPE=bf16 path): planes
    are copies/zero-pads of bf16 values and the kernels upcast to f32 at
    the patch slice, so every dot still accumulates f32 against f32
    weights.  Off (or fp32 inputs, where the downcast would lose bits):
    f32 planes, the round-3/4 behavior.  Read at TRACE time."""
    if (x.dtype == jnp.bfloat16
            and os.environ.get("TERRAIN_STEM_PLANES", "f32") == "bf16"):
        return jnp.bfloat16
    return jnp.float32


def _plane_stack(x2d, wp):
    """(N, H, W) -> (N, K, H+8, Wp): K dx-shifted copies of the padded image
    so every kernel load is lane-offset-0 (see _row_patches).  Plane dx
    holds xp shifted left by dx lanes."""
    xp = _pad_rows(x2d, wp)
    return jnp.stack(
        [jnp.pad(xp[:, :, dx:], ((0, 0), (0, 0), (0, dx))) for dx in range(K)],
        axis=1)


def _pad_rows(x2d, wp):
    """(N, H, W) -> (N, H + 8, Wp): 2 lo / 6 hi rows, 2 lo cols, zeros."""
    n, h, w = x2d.shape
    return jnp.pad(x2d, ((0, 0), (PAD_LO, 6), (PAD_LO, wp - w - PAD_LO)))


def _conv_stem_fwd_pallas(x, w, b, out_dtype, interpret=False, slope=None):
    n, h, wdt, _ = x.shape
    kh, kw, _, f = w.shape
    # TH=32 fits standalone but exceeded the scoped-VMEM limit by ~500K when
    # embedded in the full fp32 train step (double-buffered (1,TH,W,F) out
    # block); 16 holds in both dtypes with margin
    TH = min(_pick_th(h, x.dtype), 16)
    Wp = _w_pad(wdt)
    pdt = _plane_dtype(x)
    xs = _plane_stack(x[..., 0].astype(pdt), Wp)
    wm = w.reshape(K * K, f).astype(jnp.float32)
    bm = b.reshape(1, f).astype(jnp.float32)
    kern = functools.partial(_fwd_kernel, TH=TH, W=wdt, Wp=Wp, F=f,
                             slope=slope)
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
            pltpu.VMEM((K, TH + 8, Wp), pdt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xs, wm, bm)


def _conv_stem_dw_pallas(x, g, f, interpret=False, y=None, slope=None):
    n, h, wdt, _ = x.shape
    # tighter band than fwd: the (1, TH, W, F) grad block + K input planes
    # overflow VMEM at TH=32 (measured on-chip: "exceeded vmem" at alloc)
    TH = min(_pick_th(h, x.dtype), 16)
    Wp = _w_pad(wdt)
    pdt = _plane_dtype(x)
    xs = _plane_stack(x[..., 0].astype(pdt), Wp)
    kern = functools.partial(_dw_kernel, TH=TH, W=wdt, Wp=Wp, F=f,
                             slope=slope)
    g_spec = pl.BlockSpec((1, TH, wdt, f), lambda nn, hh: (nn, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), g_spec]
    args = [xs, g]
    if slope is not None:
        in_specs.append(g_spec)  # y: saved fused output, same blocking as g
        args.append(y)
    # output rows padded 25 -> 32 for sublane alignment; row 25 carries the
    # fused bias grad (see _dw_kernel); sliced by caller
    out = pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((32, f), lambda nn, hh: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, TH + 8, Wp), pdt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return out[:K * K].reshape(K, K, 1, f), out[K * K]


def _conv_stem_dx_pallas(g, w, out_dtype, interpret=False):
    n, h, wdt, f = g.shape
    TH = _pick_th(h, g.dtype)
    Wp = _w_pad(wdt)
    gp = jnp.pad(g, ((0, 0), (PAD_LO, 6), (PAD_LO, Wp - wdt - PAD_LO), (0, 0)))
    # transpose so each band row slices as (F, Wp) with W on lanes; the
    # (N,Hp,Wp,F)->(N,Hp,F,Wp) relayout is XLA-side (see _dx_kernel)
    gt = jnp.transpose(gp, (0, 1, 3, 2))
    wm = w.reshape(K * K, f).astype(jnp.float32)  # (25, F)
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
            pltpu.VMEM((TH + 8, f, Wp), gt.dtype),
            pltpu.VMEM((K * K, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gt, wm)
    return out[..., None]


def _xla_conv(x, w, b):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), dimension_numbers=_DIMNUMS)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


_INTERPRET = False  # tests flip this to exercise the kernels on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_stem(x, w, b, slope=None):
    """5x5 s1 'same' conv for cin=1 via the Pallas stem kernel, with an
    optional fused LeakyReLU(slope) epilogue (the DCGAN discriminator's
    conv->leaky pattern when BN is off, reference architectures/dcgan.py:50).

    Callers must have checked `supported(...)`; exactness vs the XLA path is
    tested (tests/test_pallas.py).  b may be zeros (bias folded by caller).
    """
    return _conv_stem_fwd_pallas(x, w, b, x.dtype, interpret=_INTERPRET,
                                 slope=slope)


def _conv_stem_fwd(x, w, b, slope):
    y = conv_stem(x, w, b, slope)
    # with the fused epilogue the activation mask is recovered from the
    # output's sign (slope > 0 preserves it), so y joins the residuals
    return y, ((x, w, y) if slope is not None else (x, w))


def _conv_stem_bwd(slope, res, g):
    f = res[1].shape[-1]
    if slope is None:
        x, w = res
        dw, db = _conv_stem_dw_pallas(x, g, f, interpret=_INTERPRET)
        dx = _conv_stem_dx_pallas(g, w, x.dtype, interpret=_INTERPRET)
        return dx, dw.astype(w.dtype), db
    x, w, y = res
    if os.environ.get("TERRAIN_ACT_BWD", "0") == "1":
        # fused leaky backward (opt-in pending the on-chip A/B, round-3
        # lesson): the dW kernel consumes RAW g plus the saved output y
        # and applies the select in VMEM; the dX-side select then has a
        # single consumer and fuses into the pad+transpose, so the
        # standalone (N,H,W,F) compare_select HBM round trip disappears.
        dw, db = _conv_stem_dw_pallas(x, g, f, interpret=_INTERPRET,
                                      y=y, slope=slope)
        gx = jnp.where(y >= 0, g, slope * g)
        dx = _conv_stem_dx_pallas(gx, w, x.dtype, interpret=_INTERPRET)
        return dx, dw.astype(w.dtype), db
    g = jnp.where(y >= 0, g, slope * g)  # leaky backward, XLA-side
    dw, db = _conv_stem_dw_pallas(x, g, f, interpret=_INTERPRET)
    dx = _conv_stem_dx_pallas(g, w, x.dtype, interpret=_INTERPRET)
    return dx, dw.astype(w.dtype), db


conv_stem.defvjp(_conv_stem_fwd, _conv_stem_bwd)
