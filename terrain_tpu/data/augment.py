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

import jax
import jax.numpy as jnp


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
    out = jax.vmap(_rotate_flip_one)(both, theta, flip_h, flip_v)
    return out[..., :ca], out[..., ca:]


def identity_pair(rng, X, Y):
    return X, Y
