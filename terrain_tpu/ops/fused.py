"""Exact fused upsample+conv ops via phase (subpixel) decomposition.

TPU-first rewrites of the reference's upsample->conv compositions — same
math, fundamentally better mapping to the MXU:

1. upsample2x_nearest_conv: repeat-upscale x2 followed by an odd-k 'same'
   conv (the DCGAN generator's stage pattern, dcgan.py:22-31, h=5) collapses
   to ONE low-resolution conv with 4x output channels + depth-to-space.
   For k=5 the phase kernels are 3x3, so FLOPs drop 25*(2H)^2 -> 4*9*H^2 =
   2.78x, the materialized 2x-resolution intermediate disappears, and the
   4x-wider output channels tile the 128-lane MXU better.  Exact: for
   output q = 2i+phi, tap k' reads repeated-input floor((q+k')/2) =
   i + floor((phi+k')/2), so summing W taps into per-phase kernels grouped
   by d = floor((phi+k')/2) reproduces the original conv bit-for-bit
   (zero padding maps consistently).  Verified against the unfused path in
   tests/test_fused.py.

2. deconv2x2: the k=2 s=2 transposed conv (the U-Net decoder/output,
   p2p.py:23-24) writes non-overlapping 2x2 blocks — exactly a 1x1 conv
   (matmul) with 4x output channels + depth-to-space.  Keeps our
   conv2d_transpose's flipped-scatter kernel convention so checkpoints and
   the reference importer are unaffected.

Both are plain compositions of einsum/conv/reshape, so autodiff gives the
low-resolution backward passes for free and XLA fuses the depth-to-space
into the consumer.
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from terrain_tpu.ops.conv import conv2d


@lru_cache(maxsize=None)
def _phase_grouping(k):
    """G[phi, k_idx, d_idx] = 1 iff floor((phi + k' )/2) == d, k' = k_idx - p.

    Returns (G, n_taps) with a common d range across both phases."""
    assert k % 2 == 1, "phase decomposition requires odd kernel size"
    p = (k - 1) // 2
    dmin = -((p + 1) // 2)  # floor(-p/2)
    dmax = (1 + p) // 2
    n_taps = dmax - dmin + 1
    G = np.zeros((2, k, n_taps), np.float32)
    for phi in range(2):
        for ki in range(k):
            kp = ki - p
            d = (phi + kp) // 2  # python floor division
            G[phi, ki, d - dmin] = 1.0
    # NumPy on purpose: a cached jnp array created under trace would leak a
    # tracer into later jit traces (UnexpectedTracerError)
    return G, n_taps


def _depth_to_space2(y, cout):
    """(N,H,W,2,2,cout)-channel layout -> (N,2H,2W,cout)."""
    n, h, w = y.shape[0], y.shape[1], y.shape[2]
    y = y.reshape(n, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, cout)


def _nearest_conv_core(x, w, compute_dtype):
    """The phase-decomposed upsample2x_nearest_conv map, bias-free."""
    k, cout = w.shape[0], w.shape[-1]
    cd = compute_dtype or x.dtype
    G, n_taps = _phase_grouping(k)
    # K[a,b,i,ph,pw,o] = sum_{kh,kw} w[kh,kw,i,o] G[ph,kh,a] G[pw,kw,b]
    K = jnp.einsum("hwio,pha,qwb->abipqo", w.astype(jnp.float32),
                   G, G).astype(cd)
    K = K.reshape(n_taps, n_taps, w.shape[2], 4 * cout)
    y = conv2d(x, K, stride=1, padding="same", compute_dtype=cd)
    return _depth_to_space2(y, cout)


@lru_cache(maxsize=None)
def _nearest_dx_taps(k):
    """M[a, u]: combined (repeat-upsample adjoint ∘ conv-k adjoint) 1D tap
    matrix.  dx[j] = sum_{k'} w[k']^T (g[2j-k'] + g[2j+1-k']) — a stride-2
    (k+1)-tap conv on g, kernel K[a] = sum_u M[a,u] w[u]^T.  Zero padding
    composes exactly (no clamp in repeat upsample), so there are NO border
    corrections."""
    p = (k - 1) // 2
    M = np.zeros((k + 1, k), np.float32)
    for u in range(k):           # u = k' + p
        for a in (2 * p - u, 2 * p + 1 - u):
            if 0 <= a <= k:
                M[a, u] += 1.0
    return M, p


def _nearest_dx_conv(g, w):
    """Exact dx of conv2d(repeat_upsample_2x(x), w, 'same') as ONE stride-2
    conv on the cotangent — replaces the space-to-depth relayout +
    4x-channel conv the autodiff backward emits (fused.py:62 measured
    1.8 ms/step in the round-4 flagship trace)."""
    k = w.shape[0]
    M, p = _nearest_dx_taps(k)
    Mj = jnp.asarray(M)
    Kc = jnp.einsum("au,bv,uvio->aboi", Mj, Mj,
                    w.astype(jnp.float32)).astype(g.dtype)
    return lax.conv_general_dilated(
        g, Kc, window_strides=(2, 2),
        padding=((p, p + 1), (p, p + 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _nearest_conv_cv(x, w):
    return _nearest_conv_core(x, w, x.dtype)


def _nearest_cv_fwd(x, w):
    return _nearest_conv_cv(x, w), (x, w)


def _nearest_cv_bwd(res, g):
    x, w = res
    gc = g.astype(x.dtype)
    dx = _nearest_dx_conv(gc, w)
    _, vjpw = jax.vjp(lambda w_: _nearest_conv_core(x, w_, x.dtype), w)
    (dw,) = vjpw(gc)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_nearest_conv_cv.defvjp(_nearest_cv_fwd, _nearest_cv_bwd)


def upsample2x_nearest_conv(x, w, b=None, *, compute_dtype=None):
    """Exactly conv2d(upsample_nearest_2x(x), w, 'same', stride 1).

    x: (N,H,W,cin); w: (k,k,cin,cout), k odd.  Output (N,2H,2W,cout).

    TERRAIN_NEAREST_BWD=conv swaps the autodiff backward's dx
    (space-to-depth + 4x-channel conv adjoint) for the single combined
    stride-2 conv (_nearest_dx_conv) — exact, and measured a LOSS on the
    512px flagship (round-4 chain F: 66.42 ms alone, 63.13 combined with
    bc6, vs 61.35 for bc6 alone), so it stays opt-in as an A/B knob.
    Read at TRACE time: set before the first jitted step compiles
    (flipping it afterwards silently keeps the compiled backward).
    """
    cd = compute_dtype or x.dtype
    if os.environ.get("TERRAIN_NEAREST_BWD", "0") == "conv":
        y = _nearest_conv_cv(x.astype(cd), w)
    else:
        y = _nearest_conv_core(x, w, cd)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def bilinear2x_conv3x3(x, w, b=None, *, compute_dtype=None):
    """Bilinear x2 upsample followed by a 3x3 'same' conv (the U-Net
    decoder's `bilinear_upsample` stage, reference p2p.py:205-267).

    On TPU, large-spatial stages dispatch to the fused Pallas kernel
    (ops/pallas/bilinear_conv.py) that never materializes the 2x-resolution
    intermediate in HBM; otherwise (CPU, off-regime, TERRAIN_PALLAS_DECODER=0
    or the TERRAIN_PALLAS_CONV=0 master switch) the exact unfused composite
    runs.
    """
    import os

    cd = compute_dtype or x.dtype
    master = os.environ.get("TERRAIN_PALLAS_CONV", "1")
    if os.environ.get("TERRAIN_PALLAS_DECODER", master) != "0" and master != "0":
        from terrain_tpu.ops.pallas import bilinear_conv as _bc

        if _bc.supported(x.shape, w.shape):
            bb = b if b is not None else jnp.zeros((w.shape[-1],), cd)
            return _bc.bilinear2x_conv3x3_pallas(
                x.astype(cd), w.astype(cd), bb)
    from terrain_tpu.ops.resize import upsample_bilinear_2x

    up = upsample_bilinear_2x(x)
    return conv2d(up, w, b, stride=1, padding="same", compute_dtype=cd)


def _deconv2x2_core(x, w, compute_dtype):
    cout = w.shape[-1]
    cd = compute_dtype or x.dtype
    wf = w[::-1, ::-1]  # conv2d_transpose scatters the flipped kernel
    # (N,H,W,cin) @ (cin, 2*2*cout)
    wm = wf.transpose(2, 0, 1, 3).reshape(w.shape[2], 4 * cout).astype(cd)
    y = jnp.einsum("nhwi,ix->nhwx", x.astype(cd), wm)
    return _depth_to_space2(y, cout)


@jax.custom_vjp
def _deconv2x2_cv(x, w):
    return _deconv2x2_core(x, w, x.dtype)


def _deconv2x2_cv_fwd(x, w):
    return _deconv2x2_cv(x, w), (x, w)


def _deconv2x2_cv_bwd(res, g):
    x, w = res
    gc = g.astype(x.dtype)
    # dx[i,j,ci] = sum_{p,q,o} wf[p,q,ci,o] g[2i+p, 2j+q, o]: the
    # non-overlapping scatter's adjoint is a stride-2 2x2 VALID conv —
    # no space-to-depth relayout (which autodiff would emit, fused.py:62)
    wf = w[::-1, ::-1]
    Kc = jnp.transpose(wf, (0, 1, 3, 2)).astype(gc.dtype)  # (2,2,cout,cin)
    dx = lax.conv_general_dilated(
        gc, Kc, window_strides=(2, 2), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    _, vjpw = jax.vjp(lambda w_: _deconv2x2_core(x, w_, x.dtype), w)
    (dw,) = vjpw(gc)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_deconv2x2_cv.defvjp(_deconv2x2_cv_fwd, _deconv2x2_cv_bwd)


def deconv2x2(x, w, b=None, *, compute_dtype=None):
    """Exactly conv2d_transpose(x, w, stride=2) for k=2: non-overlapping
    2x2 scatter of the flipped kernel == matmul + depth-to-space.

    x: (N,H,W,cin); w: (2,2,cin,cout).  Output (N,2H,2W,cout).

    TERRAIN_DECONV_BWD=conv swaps the autodiff dx (space-to-depth +
    matmul adjoint) for a single stride-2 2x2 VALID conv — exact, and
    measured neutral-to-losing on the 512px flagship (round-4 chains F/G:
    64.18 ms alone, 61.72 with bc6 vs bc6-alone 61.35/62.09 — inside the
    noise band), so it stays opt-in as an A/B knob.  Read at TRACE time:
    set before the first jitted step compiles (flipping it afterwards
    silently keeps the compiled backward).
    """
    cd = compute_dtype or x.dtype
    if os.environ.get("TERRAIN_DECONV_BWD", "0") == "conv":
        y = _deconv2x2_cv(x.astype(cd), w)
    else:
        y = _deconv2x2_core(x, w, cd)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
