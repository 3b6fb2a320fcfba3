"""Pallas kernel correctness (interpret mode on CPU; real-TPU runs happen in
the benchmark).  Each kernel must match its XLA reference path, forward and
backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from terrain_tpu.ops.pallas.bilinear import (
    _pallas_bilinear_2x,
    _xla_bilinear_2x,
    bilinear_2x_pallas,
    pallas_supported,
)


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 8, 16, 256)])
def test_bilinear_pallas_kernel_matches_xla(shape, rng):
    # exercise the kernel itself (the public wrapper's regime guard would
    # route these small shapes to XLA)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_bilinear_2x(x)
    want = _xla_bilinear_2x(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_regime_guard():
    # winning regime: large spatial, lane-aligned channels
    assert pallas_supported((4, 256, 256, 128))
    # measured-slow regimes fall back to XLA
    assert not pallas_supported((4, 64, 64, 512))
    assert not pallas_supported((4, 256, 256, 96))
    assert not pallas_supported((4, 250, 256, 128))


def test_bilinear_pallas_grad_matches_xla(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 128).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda x: jnp.sum(bilinear_2x_pallas(x) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(_xla_bilinear_2x(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_resize_dispatch_flag(monkeypatch, rng):
    from terrain_tpu.ops import upsample_bilinear_2x

    x = jnp.asarray(rng.rand(1, 4, 4, 128).astype(np.float32))
    want = np.asarray(upsample_bilinear_2x(x))
    monkeypatch.setenv("TERRAIN_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(upsample_bilinear_2x(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- conv stem (cin=1)

from terrain_tpu.ops.pallas import conv_stem as cs


def _xla_ref(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


@pytest.mark.parametrize("shape,f", [((2, 16, 16, 1), 8), ((1, 24, 32, 1), 16)])
def test_conv_stem_forward_matches_xla(shape, f, rng, monkeypatch):
    monkeypatch.setattr(cs, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 1, f).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(f).astype(np.float32))
    got = cs.conv_stem(x, w, b)
    want = _xla_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_stem_grads_match_xla(rng, monkeypatch):
    monkeypatch.setattr(cs, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(2, 16, 16, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    def loss_pl(x, w, b):
        return jnp.sum(cs.conv_stem(x, w, b) * cot)

    def loss_xla(x, w, b):
        return jnp.sum(_xla_ref(x, w, b) * cot)

    gx_p, gw_p, gb_p = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, b)
    gx_x, gw_x, gb_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


def test_conv_stem_regime_guard():
    # the hot DCGAN-disc stem shape on TPU
    assert cs.supported((8, 512, 512, 1), (5, 5, 1, 64), (1, 1), "same",
                        backend="tpu")
    # wrong kernel/stride/cin/backend or misaligned spatial dims -> XLA
    assert not cs.supported((8, 512, 512, 1), (5, 5, 1, 64), (1, 1), "same",
                            backend="cpu")
    assert not cs.supported((8, 512, 512, 4), (5, 5, 4, 64), (1, 1), "same",
                            backend="tpu")
    assert not cs.supported((8, 512, 512, 1), (3, 3, 1, 64), (1, 1), "same",
                            backend="tpu")
    assert not cs.supported((8, 512, 512, 1), (5, 5, 1, 64), (2, 2), "same",
                            backend="tpu")
    assert not cs.supported((8, 512, 500, 1), (5, 5, 1, 64), (1, 1), "same",
                            backend="tpu")
    assert not cs.supported((8, 128, 128, 1), (5, 5, 1, 64), (1, 1), "same",
                            backend="tpu")


def test_conv2d_dispatch_uses_xla_off_tpu(rng):
    # on CPU the public conv2d must not enter the pallas path
    from terrain_tpu.ops.conv import conv2d

    x = jnp.asarray(rng.randn(1, 256, 256, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1)
    out = conv2d(x, w, stride=1, padding="same")
    assert out.shape == (1, 256, 256, 8)


# ------------------------------------- fused bilinear x2 + conv3x3 decoder

from terrain_tpu.ops.pallas import bilinear_conv as bc


@pytest.mark.parametrize("shape,f", [
    ((1, 16, 16, 8), 8),     # single tile: zero-halo borders on all sides
    ((2, 32, 48, 8), 16),    # multi-tile grid: interior halos + borders
    ((1, 16, 16, 256), 8),   # channel chunking (2 chunks of 128)
])
def test_bilinear_conv_fused_matches_composite(shape, f, rng, monkeypatch):
    monkeypatch.setattr(bc, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[-1], f).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(f).astype(np.float32))
    got = bc.bilinear2x_conv3x3_pallas(x, w, b)
    want = bc._xla_composite(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bilinear_conv_fused_grads_match_composite(rng, monkeypatch):
    monkeypatch.setattr(bc, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 32, 32, 8).astype(np.float32))
    g_p = jax.grad(lambda *a: jnp.sum(bc.bilinear2x_conv3x3_pallas(*a) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    g_x = jax.grad(lambda *a: jnp.sum(bc._xla_composite(*a) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    for p, q in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-4, atol=1e-4)


def test_bilinear_conv_regime_guard():
    # flagship decoder stages on TPU
    assert bc.supported((4, 128, 128, 128), (3, 3, 128, 64), backend="tpu")
    assert bc.supported((4, 32, 32, 512), (3, 3, 512, 128), backend="tpu")
    assert not bc.supported((4, 128, 128, 128), (3, 3, 128, 64),
                            backend="cpu")
    assert not bc.supported((4, 8, 8, 512), (3, 3, 512, 256), backend="tpu")
    assert not bc.supported((4, 128, 128, 128), (5, 5, 128, 64),
                            backend="tpu")


def test_fused_op_public_dispatch_cpu(rng):
    # off-TPU the public op runs the exact composite
    from terrain_tpu.ops import bilinear2x_conv3x3

    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    got = bilinear2x_conv3x3(x, w, b)
    want = bc._xla_composite(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dense_composite_matches_xla_composite(rng):
    """_dense_composite (the backward's adjoint source since round 3) is
    the same linear map as _xla_composite / the kernel."""
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(bc._dense_composite(x, w, b)),
        np.asarray(bc._xla_composite(x, w, b)), rtol=1e-4, atol=1e-4)


def test_conv_stem_fused_leaky_matches_unfused(rng, monkeypatch):
    """slope epilogue == conv_stem + leaky_relu, values and all grads."""
    monkeypatch.setattr(cs, "_INTERPRET", True)
    from terrain_tpu.ops.activations import leaky_relu

    x = jnp.asarray(rng.randn(1, 256, 256, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 256, 256, 8).astype(np.float32))
    got = cs.conv_stem(x, w, b, 0.2)
    want = leaky_relu(cs.conv_stem(x, w, b), 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g_f = jax.grad(lambda *a: jnp.sum(cs.conv_stem(*a, 0.2) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    g_u = jax.grad(lambda *a: jnp.sum(leaky_relu(cs.conv_stem(*a), 0.2) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    for p, q in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-4, atol=1e-4)


def test_conv_stem_fused_bwd_select_matches(rng, monkeypatch):
    """TERRAIN_ACT_BWD=1 (select fused into the dW kernel) == the default
    XLA-side leaky backward, all grads."""
    monkeypatch.setattr(cs, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(1, 64, 128, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 64, 128, 8).astype(np.float32))

    def grads(*a):
        return jax.grad(lambda *q: jnp.sum(cs.conv_stem(*q, 0.2) * cot),
                        argnums=(0, 1, 2))(*a)

    monkeypatch.delenv("TERRAIN_ACT_BWD", raising=False)
    g_ref = grads(x, w, b)
    monkeypatch.setenv("TERRAIN_ACT_BWD", "1")
    g_fused = grads(x, w, b)
    for p, q in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-5)


# ----------------------------------------- small-cin 3x3 s2 conv (conv_s2)

from terrain_tpu.ops.pallas import conv_s2 as c2


def _xla_s2(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


@pytest.mark.parametrize("shape,f", [((2, 16, 16, 1), 8),
                                     ((1, 32, 16, 4), 16),
                                     ((2, 16, 32, 2), 8)])
def test_conv_s2_forward_matches_xla(shape, f, rng, monkeypatch):
    monkeypatch.setattr(c2, "_INTERPRET", True)
    cin = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, f).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(f).astype(np.float32))
    got = c2.conv_s2(x, w, b)
    want = _xla_s2(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_s2_grads_match_xla(rng, monkeypatch):
    monkeypatch.setattr(c2, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

    def loss_pl(x, w, b):
        return jnp.sum(c2.conv_s2(x, w, b) * cot)

    def loss_xla(x, w, b):
        return jnp.sum(_xla_s2(x, w, b) * cot)

    gx_p, gw_p, gb_p = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, b)
    gx_x, gw_x, gb_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


def test_conv_s2_fused_leaky_matches_unfused(rng, monkeypatch):
    """slope epilogue == conv_s2 + leaky_relu, values and all grads
    (the PatchGAN conv1 -> leaky pattern, BN off)."""
    monkeypatch.setattr(c2, "_INTERPRET", True)
    from terrain_tpu.ops.activations import leaky_relu

    x = jnp.asarray(rng.randn(1, 32, 32, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    got = c2.conv_s2(x, w, b, 0.01)
    want = leaky_relu(c2.conv_s2(x, w, b), 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g_f = jax.grad(lambda *a: jnp.sum(c2.conv_s2(*a, 0.01) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    g_u = jax.grad(lambda *a: jnp.sum(leaky_relu(c2.conv_s2(*a), 0.01) * cot),
                   argnums=(0, 1, 2))(x, w, b)
    for p, q in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-4, atol=1e-4)


def test_conv_s2_fused_bwd_select_matches(rng, monkeypatch):
    """TERRAIN_ACT_BWD=1 (select fused into conv_s2's dW kernel) == the
    default XLA-side leaky backward, all grads."""
    monkeypatch.setattr(c2, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(1, 32, 32, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))

    def grads(*a):
        return jax.grad(lambda *q: jnp.sum(c2.conv_s2(*q, 0.01) * cot),
                        argnums=(0, 1, 2))(*a)

    monkeypatch.delenv("TERRAIN_ACT_BWD", raising=False)
    g_ref = grads(x, w, b)
    monkeypatch.setenv("TERRAIN_ACT_BWD", "1")
    g_fused = grads(x, w, b)
    for p, q in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-5)


def test_conv_s2_regime_guard():
    # the two hot first-layer shapes on TPU
    assert c2.supported((4, 512, 512, 1), (3, 3, 1, 64), (2, 2), "same",
                        backend="tpu")
    assert c2.supported((8, 512, 512, 4), (3, 3, 4, 64), (2, 2), "same",
                        backend="tpu")
    # earth256-scale
    assert c2.supported((4, 256, 256, 1), (3, 3, 1, 64), (2, 2), "same",
                        backend="tpu")
    # wrong backend/kernel/stride/cin, lane-misaligned W -> XLA
    assert not c2.supported((4, 512, 512, 1), (3, 3, 1, 64), (2, 2), "same",
                            backend="cpu")
    assert not c2.supported((4, 512, 512, 8), (3, 3, 8, 64), (2, 2), "same",
                            backend="tpu")
    assert not c2.supported((4, 512, 512, 1), (5, 5, 1, 64), (2, 2), "same",
                            backend="tpu")
    assert not c2.supported((4, 512, 512, 1), (3, 3, 1, 64), (1, 1), "same",
                            backend="tpu")
    assert not c2.supported((4, 512, 200, 1), (3, 3, 1, 64), (2, 2), "same",
                            backend="tpu")


def test_conv_s2_dispatch_flag(rng, monkeypatch):
    """TERRAIN_PALLAS_CONVS2 is opt-in (wins alone but loses in the
    thin-on default context — chain P matrix, docs/RESULTS_r3.md); on
    CPU the backend guard routes to XLA regardless of the flag, so assert
    the flagged path matches XLA (real-Mosaic numerics are covered by the
    committed chip compile checks, docs/artifacts_r3/attr)."""
    from terrain_tpu.ops.conv import conv2d

    x = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    monkeypatch.setenv("TERRAIN_PALLAS_CONVS2", "1")
    got = conv2d(x, w, b, stride=2, padding="same")  # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_s2(x, w, b)),
                               rtol=1e-5, atol=1e-5)


# ----------------------------------------- thin-cout 3x3 s1 conv (conv_thin)

from terrain_tpu.ops.pallas import conv_thin as ct


def _xla_thin(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,f", [((2, 16, 16, 8), 4),
                                     ((1, 32, 16, 32), 8),
                                     ((2, 16, 32, 16), 1)])
def test_conv_thin_forward_matches_xla(shape, f, rng, monkeypatch):
    monkeypatch.setattr(ct, "_INTERPRET", True)
    cin = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, f).astype(np.float32) * 0.1)
    got = ct.conv_thin(x, w)
    want = _xla_thin(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_thin_grads_match_xla(rng, monkeypatch):
    """All three kernels (fwd, dX via the role-swapped fwd body, dW)
    against the XLA composite's autodiff."""
    monkeypatch.setattr(ct, "_INTERPRET", True)
    x = jnp.asarray(rng.randn(2, 16, 16, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 4).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))

    gx_p, gw_p = jax.grad(
        lambda x, w: jnp.sum(ct.conv_thin(x, w) * cot), argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(
        lambda x, w: jnp.sum(_xla_thin(x, w) * cot), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-3)


def test_conv_thin_regime_guard():
    # the flagship shape: DCGAN gen output stage after phase decomposition
    # (ops/fused.py upsample2x_nearest_conv: (5,5,32,1) -> (3,3,32,4))
    assert ct.supported((4, 256, 256, 32), (3, 3, 32, 4), (1, 1), "same",
                        backend="tpu")
    # earth256-scale
    assert ct.supported((4, 128, 128, 32), (3, 3, 32, 4), (1, 1), "same",
                        backend="tpu")
    # wrong backend / fat cout / stride / kernel / lane-misaligned W -> XLA
    assert not ct.supported((4, 256, 256, 32), (3, 3, 32, 4), (1, 1), "same",
                            backend="cpu")
    assert not ct.supported((4, 256, 256, 32), (3, 3, 32, 64), (1, 1), "same",
                            backend="tpu")
    assert not ct.supported((4, 256, 256, 32), (3, 3, 32, 4), (2, 2), "same",
                            backend="tpu")
    assert not ct.supported((4, 256, 256, 32), (5, 5, 32, 4), (1, 1), "same",
                            backend="tpu")
    assert not ct.supported((4, 256, 200, 32), (3, 3, 32, 4), (1, 1), "same",
                            backend="tpu")
    # cin=1 is the stem's regime, not this kernel's
    assert not ct.supported((4, 512, 512, 1), (3, 3, 1, 4), (1, 1), "same",
                            backend="tpu")
    # bs=8 measured the kernel as a +1.3 ms loss (RESULTS_r4 4c): batch-gated
    assert not ct.supported((8, 256, 256, 32), (3, 3, 32, 4), (1, 1), "same",
                            backend="tpu")


def test_conv_thin_dispatch_flag(rng, monkeypatch):
    """TERRAIN_PALLAS_THIN=1 explicitly set; on CPU the backend guard
    routes to XLA either way, so the flagged path must still match XLA."""
    from terrain_tpu.ops.conv import conv2d

    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    monkeypatch.setenv("TERRAIN_PALLAS_THIN", "1")
    got = conv2d(x, w, b, stride=1, padding="same")  # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_thin(x, w) + b),
                               rtol=1e-5, atol=1e-5)


def test_conv_thin_dispatch_default_and_optouts(rng, monkeypatch):
    """The shipped default: with the env UNSET, ops/conv.py routes
    in-regime thin convs to the Pallas kernel (default-ON since the
    chain-O chip A/B), and each opt-out (TERRAIN_PALLAS_THIN=0,
    TERRAIN_PALLAS_CONV=0) routes back to XLA.  The CPU backend guard is
    stubbed out so the dispatch decision itself is what's under test."""
    from terrain_tpu.ops import conv as conv_mod

    calls = []
    real_supported = ct.supported
    monkeypatch.setattr(
        ct, "supported",
        lambda xs, ws, stride, padding, backend=None: real_supported(
            xs, ws, stride, padding, backend="tpu"))
    monkeypatch.setattr(
        ct, "conv_thin",
        lambda x, w: (calls.append("pallas"), _xla_thin(x, w))[1])
    for var in ("TERRAIN_PALLAS_THIN", "TERRAIN_PALLAS_CONV"):
        monkeypatch.delenv(var, raising=False)

    x = jnp.asarray(rng.randn(1, 128, 128, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    got = conv_mod.conv2d(x, w, b, stride=1, padding="same")
    assert calls == ["pallas"], "default (env unset) must dispatch Pallas"
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_xla_thin(x, w) + b),
                               rtol=1e-5, atol=1e-5)

    for var in ("TERRAIN_PALLAS_THIN", "TERRAIN_PALLAS_CONV"):
        calls.clear()
        monkeypatch.setenv(var, "0")
        out = conv_mod.conv2d(x, w, b, stride=1, padding="same")
        assert calls == [], "%s=0 must opt out to XLA" % var
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_xla_thin(x, w) + b),
                                   rtol=1e-5, atol=1e-5)
        monkeypatch.delenv(var)


def test_conv_thin_under_fused_output_stage(rng, monkeypatch):
    """conv_thin slotted under ops/fused.upsample2x_nearest_conv's phase
    conv (the integration point: the DCGAN generator output stage) must
    reproduce the unfused upsample->conv composite exactly."""
    monkeypatch.setattr(ct, "_INTERPRET", True)
    from terrain_tpu.ops.fused import _depth_to_space2, _phase_grouping

    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w5 = jnp.asarray(rng.randn(5, 5, 8, 1).astype(np.float32) * 0.1)
    G, n_taps = _phase_grouping(5)
    K3 = jnp.einsum("hwio,pha,qwb->abipqo", w5, G, G).reshape(3, 3, 8, 4)
    got = _depth_to_space2(ct.conv_thin(x, K3), 1)
    # reference: nearest x2 upsample then 5x5 'same' conv
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    want = jax.lax.conv_general_dilated(
        up, w5, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv_thin_bf16_jit_grads(rng, monkeypatch):
    """The flagship dtype path: bf16 inputs under jit, fwd + both grads
    finite and close to the f32 XLA reference (kernel accumulates f32)."""
    monkeypatch.setattr(ct, "_INTERPRET", True)
    x32 = rng.randn(1, 16, 16, 8).astype(np.float32)
    w32 = (rng.randn(3, 3, 8, 4) * 0.1).astype(np.float32)
    cot32 = rng.randn(1, 16, 16, 4).astype(np.float32)
    x, w, cot = (jnp.asarray(a, jnp.bfloat16) for a in (x32, w32, cot32))

    got = jax.jit(ct.conv_thin)(x, w)
    want = _xla_thin(jnp.asarray(x32), jnp.asarray(w32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.1, atol=0.05)

    gx, gw = jax.jit(jax.grad(
        lambda x, w: jnp.sum((ct.conv_thin(x, w) * cot).astype(jnp.float32)),
        argnums=(0, 1)))(x, w)
    rx, rw = jax.grad(
        lambda x, w: jnp.sum(_xla_thin(x, w) * jnp.asarray(cot32)),
        argnums=(0, 1))(jnp.asarray(x32), jnp.asarray(w32))
    for g, r in ((gx, rx), (gw, rw)):
        g = np.asarray(g, np.float32)
        r = np.asarray(r)
        assert np.isfinite(g).all()
        scale = max(float(np.abs(r).max()), 1e-6)
        assert float(np.abs(g - r).max()) / scale < 0.1


@pytest.mark.parametrize("shape,f", [
    ((1, 4, 4, 3), 5),      # tiny, borders dominate
    ((2, 8, 6, 4), 8),      # non-square
    ((1, 16, 16, 8), 8),    # flagship-ish
    ((1, 2, 2, 2), 3),      # degenerate: every output pixel is border
])
def test_bc_bwd_conv6_matches_dense(shape, f, rng, monkeypatch):
    """TERRAIN_BC_BWD=conv6: the combined stride-2 6x6-conv dx (plus
    border-clamp strips) equals the dense composite's adjoint exactly;
    dw/db ride the same partial vjp either way."""
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[-1], f).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(f).astype(np.float32))
    g = jnp.asarray(rng.randn(shape[0], 2 * shape[1], 2 * shape[2],
                              f).astype(np.float32))
    _, vjp = jax.vjp(bc._dense_composite, x, w, b)
    dx0, dw0, db0 = vjp(g)
    np.testing.assert_allclose(np.asarray(bc._dx_conv6(g, w)),
                               np.asarray(dx0), rtol=1e-4, atol=1e-5)
    # end-to-end through the custom_vjp dispatch (interpret-mode forward;
    # only where the fwd kernel can tile the shape)
    if not (bc._pick_tile(shape[1], bc.TILE)
            and bc._pick_tile(shape[2], bc.TILE)):
        return
    monkeypatch.setattr(bc, "_INTERPRET", True)
    # shipped DEFAULT (no env var) is conv6 since round 5
    monkeypatch.delenv("TERRAIN_BC_BWD", raising=False)
    g_def = jax.grad(lambda *a: jnp.vdot(bc.bilinear2x_conv3x3_pallas(*a), g),
                     argnums=(0, 1, 2))(x, w, b)
    monkeypatch.setenv("TERRAIN_BC_BWD", "conv6")
    g_c = jax.grad(lambda *a: jnp.vdot(bc.bilinear2x_conv3x3_pallas(*a), g),
                   argnums=(0, 1, 2))(x, w, b)
    monkeypatch.setenv("TERRAIN_BC_BWD", "dense")
    g_d = jax.grad(lambda *a: jnp.vdot(bc.bilinear2x_conv3x3_pallas(*a), g),
                   argnums=(0, 1, 2))(x, w, b)
    for p, q, r in zip(g_c, g_d, g_def):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r), np.asarray(q),
                                   rtol=1e-4, atol=1e-5)


def test_dx_conv6_out_of_regime_fails_loudly(rng):
    """Direct _dx_conv6 use below the 4x4-cotangent floor raises the
    explicit regime assert, not a confusing concat shape error."""
    g = jnp.asarray(rng.randn(1, 2, 2, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
    with pytest.raises(AssertionError, match="H,W >= 4"):
        bc._dx_conv6(g, w)


def test_conv_stem_bf16_planes_exact_vs_f32_planes(rng, monkeypatch):
    """TERRAIN_STEM_PLANES=bf16: storing the K shifted planes in bf16 is
    EXACT for bf16 inputs (planes are copies/zero-pads of bf16 values;
    dots still run f32) — fwd and all grads bit-equal to the f32-planes
    path; fp32 inputs ignore the knob (the downcast would lose bits)."""
    monkeypatch.setattr(cs, "_INTERPRET", True)
    x32 = rng.randn(1, 16, 16, 1).astype(np.float32)
    w = jnp.asarray(rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    xb = jnp.asarray(x32).astype(jnp.bfloat16)

    def run(slope=None):
        y = cs.conv_stem(xb, w, b, slope)
        g = jax.grad(lambda *a: jnp.sum(
            (cs.conv_stem(*a, slope) * cot).astype(jnp.float32)),
            argnums=(0, 1, 2))(xb, w, b)
        return y, g

    monkeypatch.setenv("TERRAIN_STEM_PLANES", "f32")
    y0, g0 = run()
    ys0, gs0 = run(slope=0.2)
    monkeypatch.setenv("TERRAIN_STEM_PLANES", "bf16")
    y1, g1 = run()
    ys1, gs1 = run(slope=0.2)
    np.testing.assert_array_equal(np.asarray(y0, np.float32),
                                  np.asarray(y1, np.float32))
    np.testing.assert_array_equal(np.asarray(ys0, np.float32),
                                  np.asarray(ys1, np.float32))
    for p, q in list(zip(g0, g1)) + list(zip(gs0, gs1)):
        np.testing.assert_array_equal(np.asarray(p, np.float32),
                                      np.asarray(q, np.float32))
    # fp32 inputs: knob is ignored (plane dtype stays f32)
    assert cs._plane_dtype(jnp.asarray(x32)) == jnp.float32
    assert cs._plane_dtype(xb) == jnp.bfloat16


from terrain_tpu.ops.pallas import pool2


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 8),     # minimal aligned
    (2, 32, 48, 16),    # non-square, multi-block
    (1, 8, 16, 8),      # smallest th ladder entry
])
def test_pool2_pallas_fwd_and_grad_match_sas(shape, rng, monkeypatch):
    """ops/pallas/pool2.py: fwd equals reduce_window everywhere; grad
    equals the select-and-scatter grad on tie-free inputs — fp32 and
    bf16 (interpret mode; tie conventions asserted separately)."""
    from terrain_tpu.ops.pool import _reduce_window_max

    assert pool2.supported(shape, backend="tpu")
    monkeypatch.setattr(pool2, "_INTERPRET", True)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.array(rng.randn(*shape).astype(np.float32)).astype(dtype)
        n, h, w, c = shape
        cot = jnp.array(rng.randn(n, h // 2, w // 2, c)
                        .astype(np.float32)).astype(dtype)
        y = jax.jit(pool2.max_pool2_pallas)(x)
        y_ref = _reduce_window_max(x, 2, 2)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(y_ref, np.float32))
        g = jax.jit(jax.grad(lambda a: jnp.sum(
            (pool2.max_pool2_pallas(a) * cot).astype(jnp.float32))))(x)
        g_ref = jax.grad(lambda a: jnp.sum(
            (_reduce_window_max(a, 2, 2) * cot).astype(jnp.float32)))(x)
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(g_ref, np.float32))


def test_pool2_pallas_tie_routing(rng, monkeypatch):
    """Whole-window ties route to the row-major-first element (the SAS
    convention, same as TERRAIN_POOL_VJP=lanes)."""
    monkeypatch.setattr(pool2, "_INTERPRET", True)
    x = jnp.ones((1, 8, 16, 8), jnp.float32)
    g = jax.grad(lambda a: jnp.sum(pool2.max_pool2_pallas(a)))(x)
    g = np.asarray(g)
    np.testing.assert_array_equal(g[0, 0::2, 0::2], 1.0)
    assert g.sum() == 4 * 8 * 8  # one winner per window per channel


def test_pool2_regime_guard():
    assert pool2.supported((4, 512, 512, 64), backend="tpu")
    assert pool2.supported((4, 8, 16, 256), backend="tpu")
    assert not pool2.supported((4, 512, 512, 64), backend="cpu")
    assert not pool2.supported((4, 511, 512, 64), backend="tpu")  # odd h
    assert not pool2.supported((4, 16, 8, 64), backend="tpu")     # w/2 < 8
    assert not pool2.supported((4, 16, 16, 6), backend="tpu")     # c % 8
    assert not pool2.supported((4, 16, 16, 1024), backend="tpu")  # c cap


def test_pool2_dispatch_flag(rng, monkeypatch):
    """TERRAIN_POOL_VJP=pallas routes through pool2 on supported shapes
    (interpret mode stands in for the chip) and falls back off-regime."""
    from terrain_tpu.ops.pool import _reduce_window_max, max_pool2d

    monkeypatch.setattr(pool2, "_INTERPRET", True)
    monkeypatch.setenv("TERRAIN_POOL_VJP", "pallas")
    monkeypatch.setattr(pool2, "supported",
                        lambda s, backend=None: pool2._pick_th(s[1], s[2], s[3]) != 0
                        and s[1] % 2 == 0 and s[2] % 2 == 0
                        and (s[2] // 2) % 8 == 0 and s[3] % 8 == 0)
    x = jnp.array(rng.randn(1, 16, 16, 8).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool2d(x, 2)),
                                  np.asarray(_reduce_window_max(x, 2, 2)))
    x_odd = jnp.array(rng.randn(1, 15, 16, 8).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool2d(x_odd, 2)),
        np.asarray(_reduce_window_max(x_odd, 2, 2)))
