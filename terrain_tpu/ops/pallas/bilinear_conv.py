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

Backward: custom VJP.  The SHIPPED dx path (TERRAIN_BC_BWD=conv6, default
since round 5) expresses the exact adjoint of (bilinear-x2 -> conv3x3) as
ONE stride-2 6x6 convolution on the cotangent plus edge-clamp border strips
(`_dx_conv6`) — measured 61.35 vs 64.94 ms/step bs=4 (replicate 62.09) and
118.1 vs 120.3 bs=8 on the 512px flagship, with a healthy 600-epoch quality
trajectory (docs/RESULTS_r4.md section 4d, docs/artifacts_r4/stable512_bc6/).
TERRAIN_BC_BWD=dense keeps the round-3/4 dense-composite adjoint;
TERRAIN_BC_BWD=xla32 keeps the f32 XLA composite vjp.  Like all TERRAIN_*
backward knobs, the value is read at TRACE time — set it before the first
jitted step compiles (see ops/fused.py).
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


def _tap_matrix_bilinear():
    """M[a, u] with Kc[a,b,o,i] = sum_{u,v} M[a,u] M[b,v] w[u,v,i,o]: the
    1D composition of the bilinear-x2 adjoint (4-tap [1/4,3/4,3/4,1/4],
    stride 2) with the 3x3 conv adjoint — per axis, interior taps.

    Derivation: dx[i] = sum_{a1} k1[a1] t[2i-1+a1], t[p] = sum_u w[u]^T
    g[p+1-u]  =>  dx[i] = sum_e Ke[e] g[2i+e], e = a1-u in [-2,3],
    Ke[e] = sum_u k1[e+u] w[u]^T.  a = e+2."""
    import numpy as np

    k1 = np.array([0.25, 0.75, 0.75, 0.25], np.float32)
    M = np.zeros((6, 3), np.float32)
    for a in range(6):
        for u in range(3):
            j = a - 2 + u
            if 0 <= j < 4:
                M[a, u] = k1[j]
    return M


def _down4(v, axis, *, fix):
    """Stride-2 4-tap [1/4,3/4,3/4,1/4] downsample (the bilinear-x2
    adjoint's conv part), zero pad (1,2); ``fix`` adds the edge-clamp
    adjoint (+1/4 of the first/last input sample onto the first/last
    output sample, ops/resize.py:_interp_axis clamp semantics)."""
    n = v.shape[axis]
    ho = n // 2
    pads = [(0, 0)] * v.ndim
    pads[axis] = (1, 2)
    vp = jnp.pad(v, pads)

    def sl(a):
        return lax.slice_in_dim(vp, a, a + 2 * ho - 1, stride=2, axis=axis)

    out = 0.25 * sl(0) + 0.75 * sl(1) + 0.75 * sl(2) + 0.25 * sl(3)
    if fix:
        head = lax.slice_in_dim(out, 0, 1, axis=axis) \
            + 0.25 * lax.slice_in_dim(v, 0, 1, axis=axis)
        tail = lax.slice_in_dim(out, ho - 1, ho, axis=axis) \
            + 0.25 * lax.slice_in_dim(v, n - 1, n, axis=axis)
        mid = lax.slice_in_dim(out, 1, ho - 1, axis=axis)
        out = jnp.concatenate([head, mid, tail], axis=axis)
    return out


def _dx_conv6(g, w):
    """Exact dx of (bilinear-x2 upsample -> conv3x3 'same'): ONE stride-2
    6x6 conv on the cotangent (combined kernel, interior) plus border
    strips for the upsample's edge clamp.

    The dense adjoint's interleave (stack/reshape transpose of
    ops/resize.py:_interp_axis) lowers to stride-2 relayout copies + loop
    fusions the round-4 trace measured at ~5.4 ms/step (fused.py:104,
    docs/RESULTS_r4.md section 4a); this formulation is the same FLOPs as
    the plain conv adjoint (36*cin*cout*H^2) expressed as a single normal
    strided convolution, with no 2x-resolution intermediate in HBM.
    SHIPPED default since round 5: the on-chip in-context A/B won at both
    bs=4 (61.35 vs 64.94 ms) and bs=8 (118.1 vs 120.3), and the 600-epoch
    quality trajectory through it is healthy (docs/RESULTS_r4.md section 4d,
    docs/artifacts_r4/stable512_bc6/)."""
    n, h2, w2, _ = g.shape
    # slices below take 4-row/col slabs of g and 3-row/col border strips;
    # anything smaller is out of regime — fail loudly, not with a concat
    # shape error (the custom_vjp is reachable directly, bypassing
    # `supported`)
    assert h2 >= 4 and w2 >= 4, (
        f"_dx_conv6 needs cotangent H,W >= 4 (input H,W >= 2); got {g.shape}")
    ho, wo = h2 // 2, w2 // 2
    cd = g.dtype
    M = jnp.asarray(_tap_matrix_bilinear())
    Kc = jnp.einsum("au,bv,uvio->aboi", M, M,
                    w.astype(jnp.float32)).astype(cd)
    main = lax.conv_general_dilated(
        g, Kc, window_strides=(2, 2), padding=((2, 3), (2, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # border strips of t = conv3x3-adjoint(g): rows/cols 0..2 and last 3,
    # from 4-row/col slabs of g (f32 — the strips are 1/H of the work)
    wT = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    t_top = lax.conv_general_dilated(
        g32[:, 0:4], wT, (1, 1), padding=((1, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # t rows 0..2
    t_bot = lax.conv_general_dilated(
        g32[:, h2 - 4:], wT, (1, 1), padding=((0, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # t rows 2H-3..2H-1
    t_lef = lax.conv_general_dilated(
        g32[:, :, 0:4], wT, (1, 1), padding=((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # t cols 0..2
    t_rig = lax.conv_general_dilated(
        g32[:, :, w2 - 4:], wT, (1, 1), padding=((1, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # t cols 2W-3..2W-1

    # true first/last output rows: clamp-inclusive h-weights [1, 3/4, 1/4]
    # on the three border t rows, then the full (clamped) w-axis adjoint
    row0 = _down4(1.0 * t_top[:, 0:1] + 0.75 * t_top[:, 1:2]
                  + 0.25 * t_top[:, 2:3], 2, fix=True)
    rowL = _down4(0.25 * t_bot[:, 0:1] + 0.75 * t_bot[:, 1:2]
                  + 1.0 * t_bot[:, 2:3], 2, fix=True)
    col0 = _down4(1.0 * t_lef[:, :, 0:1] + 0.75 * t_lef[:, :, 1:2]
                  + 0.25 * t_lef[:, :, 2:3], 1, fix=True)
    colL = _down4(0.25 * t_rig[:, :, 0:1] + 0.75 * t_rig[:, :, 1:2]
                  + 1.0 * t_rig[:, :, 2:3], 1, fix=True)

    mid = jnp.concatenate(
        [col0[:, 1:ho - 1].astype(cd), main[:, 1:ho - 1, 1:wo - 1],
         colL[:, 1:ho - 1].astype(cd)], axis=2)
    return jnp.concatenate(
        [row0.astype(cd), mid, rowL.astype(cd)], axis=1)


@jax.custom_vjp
def bilinear2x_conv3x3_pallas(x, w, b):
    """Fused bilinear-x2 + conv3x3 'same'; callers check `supported`."""
    return _pallas_call(x, w, b, x.dtype)


def _fwd(x, w, b):
    return bilinear2x_conv3x3_pallas(x, w, b), (x, w, b)


def _bwd(res, g):
    import os

    x, w, b = res
    mode = os.environ.get("TERRAIN_BC_BWD", "conv6")
    if mode == "xla32":
        _, vjp = jax.vjp(_xla_composite, x, w, b)
        dx, dw, db = vjp(g.astype(jnp.float32))
    elif mode == "conv6":
        # dx via the combined strided conv; dw/db via the dense composite's
        # partial vjp (the conv fwd is DCE'd under jit — only the resize fwd
        # residual and the dW conv run, same as the dense path)
        gc = g.astype(x.dtype)
        dx = _dx_conv6(gc, w)
        _, vjp = jax.vjp(
            lambda w_, b_: _dense_composite(x, w_, b_), w, b)
        dw, db = vjp(gc)
    else:
        _, vjp = jax.vjp(_dense_composite, x, w, b)
        dx, dw, db = vjp(g.astype(x.dtype))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


bilinear2x_conv3x3_pallas.defvjp(_fwd, _bwd)
