"""Pallas TPU kernel: small-cin 3x3 stride-2 'same' convolutions.

The two first-layer convolutions the stem kernel (conv_stem.py) does NOT
cover are the same MXU pathology at k=3 s=2:

  * U-Net encoder conv1 (reference architectures/p2p.py:137-143):
    (N,512,512,1) -> (N,256,256,64) — contraction dim 9;
  * PatchGAN conv1 over concat(A,B) (reference architectures/p2p.py:283-285):
    (2N,512,512,4) -> (2N,256,256,64) — contraction dim 36.

XLA runs both at ~0-2% MXU efficiency (round-3 trace, docs/artifacts_r3/
attr/trace_ops.csv: 0.39-0.71 ms fwd and 0.55 ms dW each per 67.7 ms step
vs microsecond flop bounds — 15-30x off their bandwidth bounds).  This
kernel reuses the stem's proven plane-stack design (every in-kernel load
at lane offset 0; see conv_stem._row_patches for the real-Mosaic failure
modes that force it), with the stride baked into the planes:

  * XLA-side: pad rows/cols by 1 lo (symmetric 'same'), then build
    3*cin planes P[dx*cin+ci][n, r, j] = xp[n, r, 2j+dx, ci] — the
    stride-2 column subsampling happens once on the (cheap, small) input,
    never inside the hot loop;
  * grid (N, Hout/TH): each program DMAs a (3cin, 2TH+8, Wout) halo band,
    builds (9cin, Wout) patch matrices by static shifted row reads
    (output row y taps padded rows 2y+dy), and runs ONE MXU dot per
    output row against the (9cin, F) weight matrix;
  * optional fused LeakyReLU epilogue (PatchGAN's conv->leaky, BN off);
  * dW: same patches contracted against the cotangent rows, accumulated
    into an (8-aligned) output block with the bias grad riding in a pad
    row — identical structure to conv_stem._dw_kernel.

dX stays on XLA: the U-Net encoder conv1 input is real data (no cotangent
is ever needed — dead-code eliminated), and the PatchGAN conv1 dX is a
thin-cout transpose conv the trace does not rank (revisit if a profile
ever names it).
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


def _patches(scratch, y, cin, Wout):
    """(9*cin, Wout) patch matrix for output row y: row t=(dy,dx,ci) is
    padded input row 2y+dy of the (dx,ci) plane — all loads at lane
    offset 0 (see conv_stem._row_patches for why planes)."""
    return jnp.concatenate(
        [scratch[dx * cin + ci, pl.ds(2 * y + dy, 1), pl.ds(0, Wout)]
         for dy in range(K) for dx in range(K) for ci in range(cin)],
        axis=0)


def _fwd_kernel(ps_hbm, w_ref, b_ref, out_ref, scratch, sem, *,
                TH, cin, Wout, F, slope):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        ps_hbm.at[n, pl.ds(0, K * cin), pl.ds(2 * hb * TH, 2 * TH + 8),
                  pl.ds(0, Wout)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    b = b_ref[0]
    for y in range(TH):
        row = jax.lax.dot_general(
            _patches(scratch, y, cin, Wout), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Wout, F)
        row = row + b
        if slope is not None:
            row = jnp.maximum(row, slope * row)
        out_ref[0, y] = row.astype(out_ref.dtype)


def _dw_kernel(ps_hbm, g_ref, *rest, TH, cin, Wout, F, rows_out, slope=None):
    if slope is None:
        out_ref, scratch, sem = rest
        y_ref = None
    else:
        # fused leaky backward: g arrives RAW, select applied here against
        # the saved fused output y (see conv_stem._dw_kernel) — and when
        # the layer input is data (U-Net enc conv1) this kernel is the
        # select's ONLY consumer, so the standalone pass disappears fully
        y_ref, out_ref, scratch, sem = rest
    n = pl.program_id(0)
    hb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        ps_hbm.at[n, pl.ds(0, K * cin), pl.ds(2 * hb * TH, 2 * TH + 8),
                  pl.ds(0, Wout)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    part = jnp.zeros((K * K * cin, F), jnp.float32)
    gsum = jnp.zeros((1, F), jnp.float32)
    for y in range(TH):
        g = g_ref[0, y].astype(jnp.float32)  # (Wout, F)
        if y_ref is not None:
            # compare in f32: Mosaic rejects arith.cmpf on packed bf16
            # vectors ("Target does not support this comparison", v5e)
            g = jnp.where(y_ref[0, y].astype(jnp.float32) >= 0, g, slope * g)
        part = part + jax.lax.dot_general(
            _patches(scratch, y, cin, Wout), g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gsum = gsum + jnp.sum(g, axis=0, keepdims=True)  # db rides along
    pad = rows_out - K * K * cin - 1
    full = jnp.concatenate(
        [part, gsum, jnp.zeros((pad, F), jnp.float32)], axis=0)
    first = jnp.logical_and(n == 0, hb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += full  # grid is sequential on TPU: safe accumulation


def _pick_th(hout):
    for t in (16, 8):
        if hout % t == 0:
            return t
    return 0


def supported(x_shape, w_shape, stride, padding, backend=None):
    """Regime guard: the first-layer shapes this kernel wins on."""
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, f = w_shape
    return (padding == "same" and tuple(stride) == (2, 2)
            and kh == K and kw == K and ci == c and c in (1, 2, 4)
            and h % 2 == 0 and w % 2 == 0
            and (w // 2) % 128 == 0 and h >= 64
            and f % 8 == 0 and f <= 512
            and _pick_th(h // 2) != 0)


def _planes(x, Wout):
    """(N,H,W,C) -> (N, 3C, H+8, Wout) f32: padded, column-subsampled
    planes; P[dx*cin+ci][n, r, j] = xp[n, r, 2j+dx, ci]."""
    n, h, w, c = x.shape
    # rows: 1 lo ('same'), 7 hi (8-aligned halo windows); cols: 1 lo + 1 hi
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 7), (1, 1), (0, 0)))
    planes = [xp[:, :, dx:dx + 2 * Wout:2, ci]
              for dx in range(K) for ci in range(c)]
    return jnp.stack(planes, axis=1)


def _conv_s2_fwd_pallas(x, w, b, out_dtype, interpret=False, slope=None):
    n, h, wdt, cin = x.shape
    f = w.shape[-1]
    hout, wout = h // 2, wdt // 2
    TH = _pick_th(hout)
    ps = _planes(x, wout)
    wm = w.reshape(K * K * cin, f).astype(jnp.float32)
    bm = b.reshape(1, f).astype(jnp.float32)
    kern = functools.partial(_fwd_kernel, TH=TH, cin=cin, Wout=wout, F=f,
                             slope=slope)
    return pl.pallas_call(
        kern,
        grid=(n, hout // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, wout, f), lambda nn, hh: (nn, hh, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hout, wout, f), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((K * cin, 2 * TH + 8, wout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(ps, wm, bm)


def _rows_out(cin):
    """dW output rows: 9*cin weight rows + 1 bias row, 8-aligned."""
    need = K * K * cin + 1
    return ((need + 7) // 8) * 8


def _conv_s2_dw_pallas(x, g, f, interpret=False, y=None, slope=None):
    n, h, wdt, cin = x.shape
    hout, wout = h // 2, wdt // 2
    TH = _pick_th(hout)
    ps = _planes(x, wout)
    rows = _rows_out(cin)
    kern = functools.partial(_dw_kernel, TH=TH, cin=cin, Wout=wout, F=f,
                             rows_out=rows, slope=slope)
    g_spec = pl.BlockSpec((1, TH, wout, f), lambda nn, hh: (nn, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), g_spec]
    args = [ps, g]
    if slope is not None:
        in_specs.append(g_spec)  # y: saved fused output, same blocking as g
        args.append(y)
    out = pl.pallas_call(
        kern,
        grid=(n, hout // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, f), lambda nn, hh: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K * cin, 2 * TH + 8, wout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    dw = out[:K * K * cin].reshape(K, K, cin, f)
    return dw, out[K * K * cin]


def _xla_conv(x, w, b):
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2),
        padding=((1, 1), (1, 1)), dimension_numbers=_DIMNUMS)
    return out + b.astype(out.dtype)


_INTERPRET = False  # tests flip this to exercise the kernels on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_s2(x, w, b, slope=None):
    """3x3 s2 'same' conv for tiny cin via the Pallas plane-stack kernel,
    with an optional fused LeakyReLU(slope) epilogue (the PatchGAN
    conv->leaky pattern, reference architectures/p2p.py:283-288).

    Callers must have checked `supported(...)`; exactness vs the XLA path
    is tested (tests/test_pallas.py).  b may be zeros (bias folded)."""
    return _conv_s2_fwd_pallas(x, w, b, x.dtype, interpret=_INTERPRET,
                               slope=slope)


def _conv_s2_fwd(x, w, b, slope):
    y = conv_s2(x, w, b, slope)
    # with the fused epilogue the activation mask is recovered from the
    # output's sign (slope > 0 preserves it), so y joins the residuals
    return y, ((x, w, y) if slope is not None else (x, w))


def _conv_s2_bwd(slope, res, g):
    if slope is not None:
        x, w, y = res
        if os.environ.get("TERRAIN_ACT_BWD", "0") == "1":
            # fused leaky backward (opt-in pending the on-chip A/B): the
            # dW kernel takes raw g + y; the dX-side select has a single
            # consumer and fuses into the XLA transpose conv (or is DCE'd
            # with it when the layer input is data).
            f = w.shape[-1]
            dw, db = _conv_s2_dw_pallas(x, g, f, interpret=_INTERPRET,
                                        y=y, slope=slope)
            gx = jnp.where(y >= 0, g, slope * g)
            _, vjp_x = jax.vjp(
                lambda xx: _xla_conv(xx, w, jnp.zeros_like(db)), x)
            (dx,) = vjp_x(gx.astype(x.dtype))
            return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(x.dtype)
        g = jnp.where(y >= 0, g, slope * g)  # leaky backward, XLA-side
    else:
        x, w = res
    f = w.shape[-1]
    dw, db = _conv_s2_dw_pallas(x, g, f, interpret=_INTERPRET)
    # dX on XLA: dead-code-eliminated when the input is data (U-Net enc
    # conv1); a thin-cout transpose conv otherwise (PatchGAN conv1) —
    # unranked by the trace, revisit with a profile that names it.
    _, vjp_x = jax.vjp(lambda xx: _xla_conv(xx, w, jnp.zeros_like(db)), x)
    (dx,) = vjp_x(g.astype(x.dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(x.dtype)


conv_s2.defvjp(_conv_s2_fwd, _conv_s2_bwd)
