"""Fused-op exactness: phase-decomposed upsample+conv and matmul deconv must
reproduce the unfused reference paths bit-for-bit (up to fp assoc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terrain_tpu.ops import conv2d, conv2d_transpose, upsample_nearest_2x
from terrain_tpu.ops.fused import deconv2x2, upsample2x_nearest_conv


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(2, 4, 4, 8), (1, 7, 5, 3)])
def test_upsample_nearest_conv_exact(k, shape, rng):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    cin = shape[-1]
    cout = 6
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) / k)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    want = conv2d(upsample_nearest_2x(x), w, b, stride=1, padding="same")
    got = upsample2x_nearest_conv(x, w, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_upsample_nearest_conv_grads_match(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 3, 2).astype(np.float32) / 5)

    def loss_fused(w):
        return jnp.sum(upsample2x_nearest_conv(x, w) ** 2)

    def loss_ref(w):
        return jnp.sum(conv2d(upsample_nearest_2x(x), w, padding="same") ** 2)

    gf = jax.grad(loss_fused)(w)
    gr = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 1, 1, 8), (1, 5, 3, 4)])
def test_deconv2x2_exact(shape, rng):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    cin = shape[-1]
    w = jnp.asarray(rng.randn(2, 2, cin, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    want = conv2d_transpose(x, w, b, stride=2)
    got = deconv2x2(x, w, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_paths(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 8, 4).astype(np.float32) / 8)
    y = upsample2x_nearest_conv(x, w, compute_dtype=jnp.bfloat16)
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 8, 8, 4)
    w2 = jnp.asarray(rng.randn(2, 2, 8, 4).astype(np.float32))
    y2 = deconv2x2(x, w2, compute_dtype=jnp.bfloat16)
    assert y2.dtype == jnp.bfloat16 and y2.shape == (1, 8, 8, 4)


# ---- combined-conv backward rewrites (TERRAIN_NEAREST_BWD/TERRAIN_DECONV_BWD)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(2, 4, 6, 8), (1, 7, 5, 3)])
def test_nearest_bwd_conv_exact(k, shape, rng, monkeypatch):
    """dx/dw of the conv-mode backward == autodiff of the default path."""
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    cin = shape[-1]
    w = jnp.asarray(rng.randn(k, k, cin, 6).astype(np.float32) / k)
    g = jnp.asarray(
        rng.randn(shape[0], 2 * shape[1], 2 * shape[2], 6).astype(np.float32))

    def loss(fn, x, w):
        return jnp.vdot(fn(x, w), g)

    monkeypatch.delenv("TERRAIN_NEAREST_BWD", raising=False)
    dx0, dw0 = jax.grad(loss, argnums=(1, 2))(upsample2x_nearest_conv, x, w)
    monkeypatch.setenv("TERRAIN_NEAREST_BWD", "conv")
    dx1, dw1 = jax.grad(loss, argnums=(1, 2))(upsample2x_nearest_conv, x, w)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 1, 1, 8), (1, 5, 3, 4)])
def test_deconv2x2_bwd_conv_exact(shape, rng, monkeypatch):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    cin = shape[-1]
    w = jnp.asarray(rng.randn(2, 2, cin, 6).astype(np.float32))
    g = jnp.asarray(
        rng.randn(shape[0], 2 * shape[1], 2 * shape[2], 6).astype(np.float32))

    def loss(x, w):
        return jnp.vdot(deconv2x2(x, w), g)

    monkeypatch.delenv("TERRAIN_DECONV_BWD", raising=False)
    dx0, dw0 = jax.grad(loss, argnums=(0, 1))(x, w)
    monkeypatch.setenv("TERRAIN_DECONV_BWD", "conv")
    dx1, dw1 = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-4, atol=1e-4)


def test_nearest_bwd_conv_bias_db(rng, monkeypatch):
    """db flows through autodiff outside the custom_vjp core."""
    monkeypatch.setenv("TERRAIN_NEAREST_BWD", "conv")
    x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 3, 2).astype(np.float32) / 5)
    b = jnp.asarray(rng.randn(2).astype(np.float32))
    db = jax.grad(lambda b: jnp.sum(upsample2x_nearest_conv(x, w, b)))(b)
    np.testing.assert_allclose(np.asarray(db), np.full(2, 8 * 8),
                               rtol=1e-5, atol=1e-5)
