"""Paired data augmentation, on device, inside the jitted train step.

The reference augments on the host with Keras ImageDataGenerator(
horizontal_flip=True, vertical_flip=True, rotation_range=360,
fill_mode="reflect"), applying the *same per-image transform* to the
heightmap and its texture by reusing one seed for both flows
(experiments.py:13, util.py:37-40).

TPU-native version: A and B are concatenated on channels and rotated/flipped
in one vectorized gather pass, so pairing is exact by construction and the
host ships nothing but the RNG key.  Rotation is bilinear resampling with
edge-inclusive 'reflect' boundary (scipy/Keras "reflect": d c b a | a b c d |
a b c d mirrored with edge duplication); Keras draws theta ~ U(-360, 360)
degrees for rotation_range=360 and flips each axis with p=0.5.

Deviation noted for parity: old Keras rotated with nearest-neighbour
(order=0) interpolation in some versions; we use bilinear, which is strictly
smoother and the modern default.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def _reflect_index(i, n):
    """Edge-inclusive reflect: ... 1 0 | 0 1 .. n-1 | n-1 n-2 ... (period 2n)."""
    m = jnp.mod(i, 2 * n)
    return jnp.where(m >= n, 2 * n - 1 - m, m)


def _rotate_flip_one(img, theta, flip_h, flip_v):
    """Rotate one (H, W, C) image by theta (radians) about its centre with
    bilinear sampling + reflect fill, then apply flips.

    TPU-shaped: the flips are folded into the *source coordinates* (flipping
    the output equals negating the centred target grid — exact in fp, since
    (h-1-i)-c = -(i-c) with c=(h-1)/2), and the four bilinear taps are ONE
    gather over the channel-flattened image with stacked linear indices —
    XLA emits a single gather kernel instead of four 2D advanced-index
    gathers plus two reverse+select pairs."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    yy = jnp.where(flip_v, -yy, yy)
    xx = jnp.where(flip_h, -xx, xx)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    u = ct * yy - st * xx + cy  # source row coordinate
    v = st * yy + ct * xx + cx  # source col coordinate
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i, u1i = u0.astype(jnp.int32), u0.astype(jnp.int32) + 1
    v0i, v1i = v0.astype(jnp.int32), v0.astype(jnp.int32) + 1
    u0i, u1i = _reflect_index(u0i, h), _reflect_index(u1i, h)
    v0i, v1i = _reflect_index(v0i, w), _reflect_index(v1i, w)
    lin = jnp.stack([u0i * w + v0i, u0i * w + v1i,
                     u1i * w + v0i, u1i * w + v1i])  # (4, h, w)
    p = jnp.take(img.reshape(h * w, c), lin.reshape(4, h * w), axis=0)
    p00, p01, p10, p11 = (t.reshape(h, w, c) for t in p)
    return (
        p00 * (1 - fu) * (1 - fv)
        + p01 * (1 - fu) * fv
        + p10 * fu * (1 - fv)
        + p11 * fu * fv
    )


# --------------------------------------------------------------------------
# Shear-decomposition rotation (the TPU-fast path).
#
# The single-gather rotation above is correct but gathers 4·H·W arbitrary
# linear indices per image — a generic gather the TPU lowers to slow scalar
# addressing (measured ~29 ms of the 99 ms flagship step at bs=4,
# docs/RESULTS_r3.md "Step attribution").  The classic Paeth 3-shear
# factorization R(r) = ShearX(a)·ShearY(b)·ShearX(a) (a = -tan(r/2),
# b = sin r) turns the resample into three 1-D fractional shifts whose
# offset varies only along the *other* axis.  Each shift is executed as
# log2-many static `roll`+`select` stages (one per bit of the integer
# offset) plus one 2-tap mix for the fraction — all dense, fully
# vectorized VPU work, no gathers at all.
#
# Reflect fill comes for free: rolling the edge-inclusive reflect extension
# concat(x, reverse(x)) — which is exactly one period of the reflect
# indexing _reflect_index implements — makes circular shift equal reflect
# sampling.  Angles are first reduced to |r| <= pi/4 by a per-image rot90
# (select over the 4 dihedral variants), which bounds the shear offsets and
# the bit count.
#
# Semantics note: a 3-pass bilinear resample is slightly smoother than the
# 1-pass 4-tap bilinear above (three 2-tap mixes instead of one 4-tap), and
# corner fill can differ where a later shear re-samples an earlier shear's
# reflected band.  Augmentation is randomized noise injection — the
# distribution is what matters — but the gather path stays available as
# TERRAIN_AUGMENT=gather and is the semantic reference in tests.
# --------------------------------------------------------------------------


def _shift_frac(x, t, axis, max_abs):
    """Sample x at (index + t) along `axis` in a periodic domain.

    x: (N, H, L, C) or (N, L, W, C); t: per-image-per-row real offsets,
    shaped to broadcast against x with size 1 on `axis` (and on C).
    `max_abs` is a static bound on |t|; offsets are biased by it so the
    binary decomposition only spends ceil(log2(2*max_abs+2)) roll stages.
    out[j] = (1-f)·x[j+k] + f·x[j+k+1] with k=floor(t), f=frac(t).
    """
    length = x.shape[axis]
    k = jnp.floor(t)
    f = t - k
    # bias into [0, 2*max_abs+1], then one static pre-roll undoes the bias
    bias = int(np.ceil(max_abs)) + 1
    k = k.astype(jnp.int32) + bias
    x = jnp.roll(x, bias, axis=axis)  # static: out[j] = x[j - bias]
    del length
    nbits = max(int(np.ceil(np.log2(2 * bias + 2))), 1)
    for b in range(nbits):
        rolled = jnp.roll(x, -(1 << b), axis=axis)
        x = jnp.where(((k >> b) & 1) > 0, rolled, x)
    x1 = jnp.roll(x, -1, axis=axis)  # fractional 2-tap mix
    return x * (1.0 - f) + x1 * f


def _reflect_pad(x, axis):
    """One full period of edge-inclusive reflect: concat(x, reverse(x))."""
    return jnp.concatenate([x, jnp.flip(x, axis=axis)], axis=axis)


def _rot90_select(x, q):
    """Per-image rot90**q for square (N, H, W, C) images, q: (N,) in 0..3.

    All four dihedral variants are dense layout ops; the per-image choice
    is two selects.  Convention matches _rotate_flip_one's sampling
    out[p] = src[R(q*90deg) p]: for q=1, out[i,j] = src[h-1-j, i]."""
    r1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)   # 90
    r2 = jnp.flip(jnp.flip(x, axis=1), axis=2)     # 180
    r3 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)   # 270
    q = q.reshape(-1, 1, 1, 1)
    return jnp.where(q == 0, x,
                     jnp.where(q == 1, r1, jnp.where(q == 2, r2, r3)))


def _rotate_flip_shear(imgs, theta, flip_h, flip_v):
    """Batched rotate+flip equal in distribution to vmap(_rotate_flip_one).

    imgs: (N, H, W, C) square images; theta: (N,) radians."""
    n, h, w, c = imgs.shape
    assert h == w, "shear rotation assumes square images"
    # reduce to |r| <= pi/4 with a per-image quarter-turn pre-rotation
    theta = jnp.mod(theta, 2 * jnp.pi)
    q = jnp.floor((theta + jnp.pi / 4) / (jnp.pi / 2)).astype(jnp.int32)
    r = theta - q.astype(jnp.float32) * (jnp.pi / 2)
    x = _rot90_select(imgs, jnp.mod(q, 4))

    # sampling composition out(p) = src(Xa·Yb·Xa·p) equals src(R(r)·p)
    # with a = tan(r/2), b = -sin(r):  Xa·Yb·Xa = [[c,-s],[s,c]]
    a = jnp.tan(r / 2.0)           # x-shear coefficient, |a| <= tan(pi/8)
    b = -jnp.sin(r)                # y-shear coefficient, |b| <= sin(pi/4)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows = (jnp.arange(h, dtype=jnp.float32) - cy)  # (H,)
    cols = (jnp.arange(w, dtype=jnp.float32) - cx)  # (W,)
    amax = float(np.tan(np.pi / 8)) * max(cy, cx) + 1
    bmax = float(np.sin(np.pi / 4)) * max(cy, cx) + 1

    # pass 1: x-shear — out[i, j] = src[i, j + a*(i-cy)]
    t1 = (a[:, None] * rows[None, :])[:, :, None, None]  # (N, H, 1, 1)
    x = _reflect_pad(x, axis=2)
    x = _shift_frac(x, t1, axis=2, max_abs=amax)[:, :, :w]
    # pass 2: y-shear — out[i, j] = src[i + b*(j-cx), j]
    t2 = (b[:, None] * cols[None, :])[:, None, :, None]  # (N, 1, W, 1)
    x = _reflect_pad(x, axis=1)
    x = _shift_frac(x, t2, axis=1, max_abs=bmax)[:, :h]
    # pass 3: x-shear again
    x = _reflect_pad(x, axis=2)
    x = _shift_frac(x, t1, axis=2, max_abs=amax)[:, :, :w]

    x = jnp.where(flip_h.reshape(-1, 1, 1, 1), jnp.flip(x, axis=2), x)
    x = jnp.where(flip_v.reshape(-1, 1, 1, 1), jnp.flip(x, axis=1), x)
    return x


def augment_pair(rng, X, Y, *, rotation=True, flips=True):
    """Apply one random transform per (A, B) pair; A=(N,H,W,Ca), B=(N,H,W,Cb).

    Returns (X_aug, Y_aug).  Fully jittable; vmapped over the batch.
    """
    n = X.shape[0]
    ca = X.shape[-1]
    k_theta, k_fh, k_fv = jax.random.split(rng, 3)
    if rotation:
        theta = jax.random.uniform(
            k_theta, (n,), jnp.float32, -2 * jnp.pi, 2 * jnp.pi)
    else:
        theta = jnp.zeros((n,), jnp.float32)
    if flips:
        flip_h = jax.random.bernoulli(k_fh, 0.5, (n,))
        flip_v = jax.random.bernoulli(k_fv, 0.5, (n,))
    else:
        flip_h = jnp.zeros((n,), bool)
        flip_v = jnp.zeros((n,), bool)
    both = jnp.concatenate([X, Y], axis=-1)
    if not rotation:
        # flips only: two select+reverse passes, no resampling at all
        out = jnp.where(flip_h.reshape(-1, 1, 1, 1),
                        jnp.flip(both, axis=2), both)
        out = jnp.where(flip_v.reshape(-1, 1, 1, 1),
                        jnp.flip(out, axis=1), out)
    elif (os.environ.get("TERRAIN_AUGMENT", "shear") == "shear"
            and X.shape[1] == X.shape[2]):
        out = _rotate_flip_shear(both, theta, flip_h, flip_v)
    else:
        out = jax.vmap(_rotate_flip_one)(both, theta, flip_h, flip_v)
    return out[..., :ca], out[..., ca:]


def identity_pair(rng, X, Y):
    return X, Y
