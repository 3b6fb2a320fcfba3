"""Convolution ops, NHWC, TPU-first.

XLA's conv_general_dilated is the primary path (it tiles onto the MXU and
fuses surrounding elementwise ops); Pallas kernels plug in behind the same
signatures for the fused decoder blocks (see terrain_tpu.ops.pallas).

Semantics mirror the reference's Lasagne layers (cited per function) but the
layout is NHWC/HWIO and padding is always *explicit symmetric* (k-1)//2 —
Lasagne's pad='same' pads symmetrically even for strided convs
(reference architectures/p2p.py:20-21), which differs from XLA's 'SAME'
(asymmetric low/high split for even inputs), so we never use the string form.
"""

import os

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _try_pallas_stem(x, w, b, stride, padding, cd, slope=None):
    """Auto-dispatch the tiny-cin 5x5 s1 stem conv to the Pallas kernel on
    TPU (the ~600x-off-roofline XLA shape, docs/ROADMAP.md item 1).  Regime
    checks live in ops/pallas/conv_stem.supported; TERRAIN_PALLAS_STEM=0
    opts out of this kernel alone, TERRAIN_PALLAS_CONV=0 of all conv-path
    Pallas kernels.  Returns None when the XLA path should run."""
    master = os.environ.get("TERRAIN_PALLAS_CONV", "1")
    if os.environ.get("TERRAIN_PALLAS_STEM", master) == "0" or master == "0":
        return None
    from terrain_tpu.ops.pallas import conv_stem as _cs

    if not _cs.supported(x.shape, w.shape, stride, padding):
        return None
    bb = b if b is not None else jnp.zeros((w.shape[-1],), cd)
    return _cs.conv_stem(x.astype(cd), w.astype(cd), bb, slope)


def _try_pallas_s2(x, w, b, stride, padding, cd, slope=None):
    """Auto-dispatch the small-cin 3x3 s2 first-layer convs (U-Net encoder
    conv1, PatchGAN conv1 — 15-30x off their bandwidth bounds in XLA per
    the round-3 trace) to the Pallas plane-stack kernel.  Opt-IN: it wins
    alone (64.5 vs 65.7 ms/step base, chain O) but LOSES in the shipped
    default context — s2+thin measured 64.3 vs thin-only 63.4 (chain P),
    so the default stays off while conv_thin ships on
    (docs/RESULTS_r3.md, chain P matrix).  TERRAIN_PALLAS_CONV=0 still
    masters all conv-path Pallas kernels."""
    master = os.environ.get("TERRAIN_PALLAS_CONV", "1")
    if os.environ.get("TERRAIN_PALLAS_CONVS2", "0") != "1" or master == "0":
        return None
    from terrain_tpu.ops.pallas import conv_s2 as _c2

    if not _c2.supported(x.shape, w.shape, stride, padding):
        return None
    bb = b if b is not None else jnp.zeros((w.shape[-1],), cd)
    return _c2.conv_s2(x.astype(cd), w.astype(cd), bb, slope)


def _try_pallas_thin(x, w, b, stride, padding, cd):
    """Auto-dispatch thin-cout 3x3 s1 convs (the phase-decomposed DCGAN
    generator output stage — 4 live output channels on the 128-lane MXU,
    15-30x off its bandwidth bound per the round-3 trace roofline) to the
    transposed-layout Pallas kernel.  Default-ON since the chain-O
    in-context chip A/B (63.4 vs 65.7 ms/step base — the best single-knob
    win in the matrix; docs/RESULTS_r3.md); TERRAIN_PALLAS_THIN=0 opts
    out of this kernel alone, TERRAIN_PALLAS_CONV=0 of all conv-path
    Pallas kernels."""
    master = os.environ.get("TERRAIN_PALLAS_CONV", "1")
    if os.environ.get("TERRAIN_PALLAS_THIN", master) == "0" or master == "0":
        return None
    from terrain_tpu.ops.pallas import conv_thin as _ct

    if not _ct.supported(x.shape, w.shape, stride, padding):
        return None
    out = _ct.conv_thin(x.astype(cd), w.astype(cd))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _to_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, *, stride=1, padding="same", compute_dtype=None):
    """2D convolution (cross-correlation), NHWC x HWIO -> NHWC.

    padding: 'same' (symmetric (k-1)//2, Lasagne pad='same'), 'valid', or an
    explicit ((ph_lo, ph_hi), (pw_lo, pw_hi)).

    Mirrors lasagne.layers.Conv2DLayer as used at reference
    architectures/dcgan.py:22 and architectures/p2p.py:20-21 (linear
    nonlinearity is applied by callers).
    """
    kh, kw = w.shape[0], w.shape[1]
    s = _to_pair(stride)
    cd0 = compute_dtype or x.dtype
    out = _try_pallas_stem(x, w, b, s, padding, cd0)
    if out is None:
        out = _try_pallas_s2(x, w, b, s, padding, cd0)
    if out is None:
        out = _try_pallas_thin(x, w, b, s, padding, cd0)
    if out is not None:
        return out
    if padding == "same":
        pad = (((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    elif padding == "valid":
        pad = ((0, 0), (0, 0))
    else:
        pad = padding
    cd = compute_dtype or x.dtype
    out = lax.conv_general_dilated(
        x.astype(cd),
        w.astype(cd),
        window_strides=s,
        padding=pad,
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_leaky(x, w, b=None, *, slope=0.2, stride=1, padding="same",
                 compute_dtype=None):
    """conv2d followed by LeakyReLU(slope), fused into the Pallas stem
    kernel's epilogue when that regime engages (the DCGAN discriminator's
    BN-less conv->leaky blocks, reference architectures/dcgan.py:46-52) —
    a custom-call boundary otherwise forces the activation select into a
    standalone HBM round trip (round-3 trace: 1.6 ms select + 1.6 ms
    layout copy per step on the 512px stem).  TERRAIN_STEM_ACT=0 opts out
    of the fusion; semantics are identical either way."""
    if os.environ.get("TERRAIN_STEM_ACT", "1") != "0":
        s = _to_pair(stride)
        cd0 = compute_dtype or x.dtype
        out = _try_pallas_stem(x, w, b, s, padding, cd0, slope=slope)
        if out is None:
            out = _try_pallas_s2(x, w, b, s, padding, cd0, slope=slope)
        if out is not None:
            return out
    from terrain_tpu.ops.activations import leaky_relu

    return leaky_relu(
        conv2d(x, w, b, stride=stride, padding=padding,
               compute_dtype=compute_dtype), slope)


def conv2d_transpose(x, w, b=None, *, stride=2, compute_dtype=None):
    """Transposed (fractionally strided) convolution, VALID, crop=0.

    Output spatial size = (in - 1) * stride + k, matching
    lasagne.layers.Deconv2DLayer(filter_size=k, stride=s, crop=0) as wrapped
    by the reference's `Deconvolution` helper (architectures/p2p.py:23-24):
    k=2,s=2 doubles resolution; k=2,s=1 grows the 1x1 bottleneck to 2x2.

    w has HWIO layout where I = input channels of x, O = output channels.

    The k=2 s=2 case (every U-Net decoder upsample) dispatches to the exact
    matmul + depth-to-space formulation (ops/fused.py) — non-overlapping
    2x2 scatter is a 1x1 conv with 4x output channels, which tiles the MXU
    far better than a dilated conv lowering.
    """
    s = _to_pair(stride)
    if w.shape[0] == 2 and w.shape[1] == 2 and s == (2, 2):
        from terrain_tpu.ops.fused import deconv2x2

        return deconv2x2(x, w, b, compute_dtype=compute_dtype)
    cd = compute_dtype or x.dtype
    out = lax.conv_transpose(
        x.astype(cd),
        w.astype(cd),
        strides=s,
        padding="VALID",
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def dense(x, w, b=None, *, compute_dtype=None):
    """Fully connected layer: (N, din) @ (din, dout).

    Mirrors lasagne.layers.DenseLayer (reference architectures/dcgan.py:16).
    """
    cd = compute_dtype or x.dtype
    out = jnp.dot(x.astype(cd), w.astype(cd))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
