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
