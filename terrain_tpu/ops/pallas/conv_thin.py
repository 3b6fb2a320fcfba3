"""Pallas TPU kernel: thin-COUT 3x3 stride-1 'same' convolutions.

The DCGAN generator's output stage (reference architectures/dcgan.py:31-32:
Conv2D h=5 'same' -> 1 channel after a repeat-upscale, which ops/fused.py
phase-decomposes into a 3x3 conv with 4 output channels at half resolution)
is the mirror image of the stem pathology: the MXU's 128-lane output
dimension carries 4 live channels, so XLA runs it at 0-3% efficiency,
15-30x off its bandwidth bound (round-3 trace roofline table,
docs/RESULTS_r3.md "per-conv-shape roofline"; docs/ROADMAP.md item 1 names
this exact shape as the remaining small-channel-dim class member).

Design (NHWC in/out; k=3, s=1, symmetric 'same' zero padding; cout<=8):
  * XLA-side: zero-pad rows (1 lo, 7 hi) and cols (1 lo, Wp-W-1 hi) so DMA
    windows are (8,128)-aligned, then transpose to (N, Hp, C, Wp) — W on
    LANES, like conv_stem's dX kernel: with cout off the lane dimension the
    only way to keep the MXU fed is to put the image row there;
  * weights flatten to (9*FS, C): row t*FS+o is tap t=(dy,dx) of output
    channel o (FS = cout padded to a sublane multiple);
  * grid (N, H/TH): each program DMAs a (TH+8, C, Wp) halo band, and per
    band row runs ONE dot (9*FS, C) @ (C, Wp) -> all taps' per-channel
    partial rows at once; the result round-trips through VMEM (bstash) so
    the tap-shifted slices are ref loads at static lane offsets dx<=2 —
    exactly conv_stem._dx_kernel's proven pattern (value slices with
    non-canonical lane offsets are the real-Mosaic failure mode,
    docs/RESULTS_r2.md);
  * output block (1, TH, FS, W) — channels on SUBLANES, W on lanes; the
    consumer pays one small transpose back to NHWC, which XLA fuses with
    the depth-to-space interleave it was already paying (ROADMAP: "the d2s
    relayout is paid by XLA either way").

Backward:
  * dX = conv3x3_same(zero-padded cotangent, rot180(w) io-swapped) is the
    SAME structure with (cin, cout) roles swapped (cin=FS thin, cout=C) —
    the generalized forward kernel runs it with weights (9*C, FS);
  * dW[t,i,o] = sum_y <g row (FS,W), shifted x row (C,W)> — 9 small
    lane-contracted dots per output row, accumulated across the sequential
    grid like conv_stem._dw_kernel;
  * db = sum(g) stays on XLA: the cotangent here is ~4 MB (vs the 268 MB
    stem case that forced db into the kernel).

Everything falls back to XLA off-TPU / off-regime.  Default-ON on TPU
since the chain-O in-context chip A/B settled it (63.4 vs 65.7 ms/step
base — the best single-knob win in the round-3 matrix; docs/RESULTS_r3.md
chain P).  TERRAIN_PALLAS_THIN=0 opts out of this kernel alone,
TERRAIN_PALLAS_CONV=0 of all conv-path Pallas kernels (dispatch:
ops/conv.py _try_pallas_thin).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMNUMS = ("NHWC", "HWIO", "NHWC")
K = 3
# Band height: 16 is the embedded-in-step scoped-VMEM sweet spot measured
# at bs=4 (stem's lesson).  TERRAIN_THIN_TH overrides it for per-batch-size
# tile A/Bs (read once at import; every chip arm is its own process).
TH = int(os.environ.get("TERRAIN_THIN_TH", "16"))


def _w_pad(w):
    """Padded row length: W + 2 halo cols, rounded up to a lane multiple."""
    return ((w + 2 + 127) // 128) * 128


def _sub_pad(f):
    """Channel count padded to a sublane multiple."""
    return max(8, ((f + 7) // 8) * 8)


def _fwd_kernel(xt_hbm, w_ref, out_ref, scratch, bstash, sem, *,
                CIN, FS, W, Wp):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, CIN), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    acc = [jnp.zeros((FS, W), jnp.float32) for _ in range(TH)]
    for rp in range(TH + 2):
        # all taps x all output channels for this input row in ONE dot:
        # (9*FS, C) @ (C, Wp)
        B = jax.lax.dot_general(
            w_ref[:], scratch[rp],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # round-trip through VMEM so tap slices are ref loads (canonical
        # lane offset) — see conv_stem._dx_kernel
        bstash[:] = B
        for dy in range(K):
            y = rp - dy
            if 0 <= y < TH:
                for dx in range(K):
                    t = dy * K + dx
                    acc[y] = acc[y] + bstash[pl.ds(t * FS, FS), pl.ds(dx, W)]
    for y in range(TH):
        out_ref[0, y] = acc[y].astype(out_ref.dtype)


def _dw_kernel(xt_hbm, g_ref, out_ref, scratch, sem, *, CIN, FS, W, Wp):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[n, pl.ds(hb * TH, TH + 8), pl.ds(0, CIN), pl.ds(0, Wp)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    accs = [jnp.zeros((FS, CIN), jnp.float32) for _ in range(K * K)]
    for y in range(TH):
        gy = g_ref[0, y]  # (FS, W)
        for dy in range(K):
            for dx in range(K):
                # lane-contracted outer product: dW tap (dy,dx) sums
                # g[y, :, o] * x[y+dy-1, :+dx-1, i] over the W lanes
                xs = scratch[y + dy, :, pl.ds(dx, W)]  # (CIN, W) ref load
                accs[dy * K + dx] = accs[dy * K + dx] + jax.lax.dot_general(
                    gy, xs,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
    full = jnp.concatenate(accs, axis=0)  # (9*FS, CIN), FS%8==0 -> aligned
    first = jnp.logical_and(n == 0, hb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += full  # grid is sequential on TPU: safe accumulation


def supported(x_shape, w_shape, stride, padding, backend=None):
    """Regime guard: thin-cout k3 s1 shapes this kernel targets (the
    phase-decomposed DCGAN generator output stage)."""
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, f = w_shape
    s = stride if isinstance(stride, tuple) else (stride, stride)
    return (padding == "same" and s == (1, 1)
            and kh == K and kw == K and ci == c
            and 8 <= c <= 64 and c % 8 == 0 and 1 <= f <= 8
            # bs=8 in-context chip A/B: the kernel costs +1.3 ms/step there
            # (its boundary transposes scale with batch while the XLA
            # counterpart amortizes better) while winning -2.3 ms at bs=4,
            # so the regime is batch-gated (docs/RESULTS_r4.md 4c)
            and n <= 4
            and h % TH == 0 and h >= 64
            and w % 128 == 0 and 128 <= w <= 1024)


def _pad_t(x, cs):
    """(N,H,W,C) -> (N, H+8, CS, Wp): zero-pad rows (1,7), cols (1, rest),
    channels C->CS, then put W on lanes."""
    n, h, w, c = x.shape
    wp = _w_pad(w)
    xp = jnp.pad(x, ((0, 0), (1, 7), (1, wp - w - 1), (0, cs - c)))
    return jnp.transpose(xp, (0, 1, 3, 2))


def _wm_fwd(w, fs):
    """(3,3,C,F) -> (9*FS, C): row t*FS+o = tap t, output channel o."""
    c, f = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, fs - f)))
    return jnp.transpose(wp, (0, 1, 3, 2)).reshape(K * K * fs, c)


def _thin_call(xt, wm, n, h, W, Wp, CIN, FS, out_dtype, interpret):
    kern = functools.partial(_fwd_kernel, CIN=CIN, FS=FS, W=W, Wp=Wp)
    return pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, FS, W), lambda nn, hh: (nn, hh, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, FS, W), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, CIN, Wp), xt.dtype),
            pltpu.VMEM((K * K * FS, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, wm)


def _conv_thin_fwd_pallas(x, w, out_dtype, interpret=False):
    n, h, wdt, c = x.shape
    f = w.shape[-1]
    fs = _sub_pad(f)
    wp = _w_pad(wdt)
    xt = _pad_t(x, c)
    out = _thin_call(xt, _wm_fwd(w, fs).astype(x.dtype),
                     n, h, wdt, wp, c, fs, out_dtype, interpret)
    # channels back to the minor dim; XLA fuses this with the consumer's
    # depth-to-space interleave (both are the same relayout family)
    return jnp.transpose(out[:, :, :f, :], (0, 1, 3, 2))


def _conv_thin_dx_pallas(g, w, out_dtype, interpret=False):
    n, h, wdt, f = g.shape
    c = w.shape[2]
    fs = _sub_pad(f)
    wp = _w_pad(wdt)
    gt = _pad_t(g, fs)
    # dX = conv3x3_same(gp, rot180(w) io-swapped): same kernel, roles
    # swapped — contraction over the FS cotangent channels, C on sublanes
    wf = w[::-1, ::-1]
    wx = jnp.pad(wf, ((0, 0), (0, 0), (0, 0), (0, fs - f)))
    wx = wx.reshape(K * K * c, fs).astype(g.dtype)
    out = _thin_call(gt, wx, n, h, wdt, wp, fs, c, out_dtype, interpret)
    return jnp.transpose(out, (0, 1, 3, 2))


def _conv_thin_dw_pallas(x, g, interpret=False):
    n, h, wdt, c = x.shape
    f = g.shape[-1]
    fs = _sub_pad(f)
    wp = _w_pad(wdt)
    xt = _pad_t(x, c)  # same expression as forward: XLA CSEs it in-step
    gt = jnp.transpose(jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, fs - f))),
                       (0, 1, 3, 2))
    kern = functools.partial(_dw_kernel, CIN=c, FS=fs, W=wdt, Wp=wp)
    out = pl.pallas_call(
        kern,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TH, fs, wdt), lambda nn, hh: (nn, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K * K * fs, c), lambda nn, hh: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K * K * fs, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, c, wp), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, gt)
    # rows t*FS+o, lanes i -> (3,3,C,F)
    return jnp.transpose(out.reshape(K, K, fs, c), (0, 1, 3, 2))[..., :f]


def _xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS)


_INTERPRET = False  # tests flip this to exercise the kernels on CPU


@jax.custom_vjp
def conv_thin(x, w):
    """3x3 s1 'same' conv for cout<=8 via the transposed-layout Pallas
    kernel (no bias: callers add it, or fold it past the depth-to-space —
    reference architectures/dcgan.py:31-32 via ops/fused.py's phase
    decomposition).  Callers must have checked `supported(...)`; exactness
    vs the XLA path is tested (tests/test_pallas.py)."""
    return _conv_thin_fwd_pallas(x, w, x.dtype, interpret=_INTERPRET)


def _conv_thin_fwd(x, w):
    return conv_thin(x, w), (x, w)


def _conv_thin_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = _conv_thin_dx_pallas(g, w, x.dtype, interpret=_INTERPRET)
    dw = _conv_thin_dw_pallas(x, g, interpret=_INTERPRET)
    return dx, dw.astype(w.dtype)


conv_thin.defvjp(_conv_thin_fwd, _conv_thin_bwd)
