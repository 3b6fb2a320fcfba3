"""Op-level unit tests: shapes + golden math vs direct NumPy implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terrain_tpu.ops import (
    avg_pool2d,
    batch_norm,
    bn_init_params,
    bn_init_state,
    conv2d,
    conv2d_transpose,
    dense,
    leaky_relu,
    max_pool2d,
    upsample_bilinear_2x,
    upsample_nearest_2x,
)


def _np_conv2d_same(x, w, stride):
    """Direct NumPy conv: NHWC x HWIO, symmetric (k-1)//2 padding."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    oh = (h + 2 * ph - kh) // stride + 1
    ow = (wd + 2 * pw - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride : i * stride + kh, j * stride : j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def test_conv2d_same_stride1_matches_numpy(rng):
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    w = rng.randn(5, 5, 3, 4).astype(np.float32)
    got = np.asarray(conv2d(jnp.array(x), jnp.array(w), stride=1, padding="same"))
    want = _np_conv2d_same(x, w, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv2d_same_stride2_symmetric_padding(rng):
    # Lasagne pad='same' with stride 2 pads symmetrically (1,1) for k=3;
    # XLA string 'SAME' would pad (0,1) — assert we match the symmetric one.
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 3).astype(np.float32)
    got = np.asarray(conv2d(jnp.array(x), jnp.array(w), stride=2, padding="same"))
    want = _np_conv2d_same(x, w, 2)
    assert got.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv2d_valid_k2(rng):
    x = rng.randn(1, 2, 2, 4).astype(np.float32)
    w = rng.randn(2, 2, 4, 8).astype(np.float32)
    got = np.asarray(conv2d(jnp.array(x), jnp.array(w), stride=1, padding="valid"))
    assert got.shape == (1, 1, 1, 8)
    want = np.tensordot(x, w, axes=([1, 2, 3], [0, 1, 2]))[:, None, None, :]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv2d_transpose_shapes(rng):
    x = jnp.array(rng.randn(2, 1, 1, 8).astype(np.float32))
    w = jnp.array(rng.randn(2, 2, 8, 4).astype(np.float32))
    # k=2 s=1: 1x1 -> 2x2 (the U-Net bottleneck deconv, p2p.py:197)
    assert conv2d_transpose(x, w, stride=1).shape == (2, 2, 2, 4)
    x2 = jnp.array(rng.randn(2, 5, 5, 8).astype(np.float32))
    # k=2 s=2: exact doubling (p2p.py:23-24)
    assert conv2d_transpose(x2, w, stride=2).shape == (2, 10, 10, 4)


def test_conv2d_transpose_scatter_semantics(rng):
    # Transposed conv with stride s scatters a kxk block per input pixel.
    # lax.conv_transpose scatters the *spatially flipped* kernel — harmless
    # for a learned kernel, but the reference-weight import tool must flip
    # (see tools/import_reference_weights.py).
    x = rng.randn(1, 3, 3, 2).astype(np.float32)
    w = rng.randn(2, 2, 2, 4).astype(np.float32)  # HWIO: I = x channels
    y = np.asarray(conv2d_transpose(jnp.array(x), jnp.array(w), stride=2))
    assert y.shape == (1, 6, 6, 4)
    want = np.zeros((1, 6, 6, 4), np.float32)
    wf = w[::-1, ::-1]
    for i in range(3):
        for j in range(3):
            for ci in range(2):
                want[0, 2 * i : 2 * i + 2, 2 * j : 2 * j + 2, :] += (
                    x[0, i, j, ci] * wf[:, :, ci, :]
                )
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)


def test_dense(rng):
    x = rng.randn(3, 7).astype(np.float32)
    w = rng.randn(7, 5).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(dense(jnp.array(x), jnp.array(w), jnp.array(b)))
    np.testing.assert_allclose(got, x @ w + b, rtol=2e-5, atol=2e-5)


def _np_bilinear_2x(x):
    """Theano bilinear_upsampling(ratio=2): stride-2 transposed conv with
    kernel [1/4,3/4,3/4,1/4] and edge-replicated border (layers.py:13-26)."""
    n, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros((n, 2 * h, 2 * w, c), np.float32)
    # rows
    rows = np.zeros((n, 2 * h, w + 2, c), np.float32)
    for i in range(h):
        rows[:, 2 * i] = 0.25 * xp[:, i] + 0.75 * xp[:, i + 1]
        rows[:, 2 * i + 1] = 0.75 * xp[:, i + 1] + 0.25 * xp[:, i + 2]
    for j in range(w):
        out[:, :, 2 * j] = 0.25 * rows[:, :, j] + 0.75 * rows[:, :, j + 1]
        out[:, :, 2 * j + 1] = 0.75 * rows[:, :, j + 1] + 0.25 * rows[:, :, j + 2]
    return out


def test_upsample_bilinear_2x_matches_theano_semantics(rng):
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    got = np.asarray(upsample_bilinear_2x(jnp.array(x)))
    want = _np_bilinear_2x(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upsample_nearest_2x(rng):
    x = rng.randn(1, 2, 2, 1).astype(np.float32)
    got = np.asarray(upsample_nearest_2x(jnp.array(x)))
    assert got.shape == (1, 4, 4, 1)
    want = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(got, want)


def test_pools(rng):
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    mp = np.asarray(max_pool2d(jnp.array(x), 2))
    ap = np.asarray(avg_pool2d(jnp.array(x), 2))
    assert mp.shape == (1, 2, 2, 2) and ap.shape == (1, 2, 2, 2)
    want_m = x.reshape(1, 2, 2, 2, 2, 2).max(axis=(2, 4))
    want_a = x.reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(mp, want_m, rtol=1e-6)
    np.testing.assert_allclose(ap, want_a, rtol=1e-5, atol=1e-6)


def test_batch_norm_train_and_det(rng):
    x = rng.randn(8, 4, 4, 3).astype(np.float32) * 3 + 1
    params = bn_init_params(3)
    state = bn_init_state(3)
    y, new_state = batch_norm(jnp.array(x), params, state, train=True)
    y = np.asarray(y)
    # batch-normalized output has ~0 mean, ~1 std per channel (eps=1e-4)
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1, atol=1e-2)
    # EMA: new = 0.99*old + 0.01*batch (lasagne alpha=1e-2), inv-std space
    mean = x.mean(axis=(0, 1, 2))
    inv_std = 1.0 / np.sqrt(x.var(axis=(0, 1, 2)) + 1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.01 * mean, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["inv_std"]), 0.99 * 1.0 + 0.01 * inv_std, rtol=1e-5
    )
    # deterministic mode uses the provided running stats
    det, same_state = batch_norm(jnp.array(x), params, new_state, train=False)
    want = (x - np.asarray(new_state["mean"])) * np.asarray(new_state["inv_std"])
    np.testing.assert_allclose(np.asarray(det), want, rtol=1e-4, atol=1e-4)


def test_leaky_relu_slopes():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.2)), [-0.2, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.01)), [-0.01, 0.0, 2.0])


def test_leaky_relu_mul_vjp_matches_default(monkeypatch):
    """TERRAIN_LEAKY_MUL=1 (save-the-scale custom VJP, multiply backward)
    must be value- and gradient-identical to the default where-VJP,
    including the x==0 subgradient (both take the positive branch)."""
    import jax

    x = jnp.array([-2.0, -1e-3, 0.0, 1e-3, 3.0])
    g = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])

    def run(slope):
        y, vjp = jax.vjp(lambda t: leaky_relu(t, slope), x)
        return np.asarray(y), np.asarray(vjp(g)[0])

    monkeypatch.delenv("TERRAIN_LEAKY_MUL", raising=False)
    y0, dx0 = run(0.2)
    monkeypatch.setenv("TERRAIN_LEAKY_MUL", "1")
    y1, dx1 = run(0.2)
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(dx0, dx1)
    # dtype preserved through the custom path in bf16
    yb = leaky_relu(x.astype(jnp.bfloat16), 0.01)
    assert yb.dtype == jnp.bfloat16


def test_bf16_conv_accumulates_fp32(rng):
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    w = rng.randn(3, 3, 16, 16).astype(np.float32) / 16
    f32 = np.asarray(conv2d(jnp.array(x), jnp.array(w), padding="same"))
    bf = np.asarray(
        conv2d(jnp.array(x), jnp.array(w), padding="same", compute_dtype=jnp.bfloat16).astype(jnp.float32)
    )
    assert np.abs(bf - f32).max() < 0.15  # bf16 mantissa, fp32 accumulate


def test_gaussian_blur_matches_scipy(rng):
    from terrain_tpu.ops.blur import gaussian_blur, gaussian_kernel_1d

    x = rng.randn(1, 16, 16, 2).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.array(x), sigma=1.0, ksize=5))
    k = gaussian_kernel_1d(5, 1.0)
    k2 = np.outer(k, k)
    from scipy.signal import convolve2d

    want = np.zeros_like(x)
    for c in range(2):
        # symmetric kernel: correlation == convolution; zero 'same' padding
        want[0, :, :, c] = convolve2d(x[0, :, :, c], k2, mode="same")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # blurring reduces total variation
    tv = lambda a: np.abs(np.diff(a, axis=1)).sum()
    assert tv(got) < tv(x)



def test_max_pool_custom_grad_matches_select_and_scatter(rng, monkeypatch):
    """The dense mask backward (ops/pool.py, TERRAIN_POOL_VJP=dense) equals
    the reduce_window grad (XLA select-and-scatter) on tie-free inputs."""
    import jax

    from terrain_tpu.ops.pool import _reduce_window_max

    monkeypatch.setenv("TERRAIN_POOL_VJP", "dense")
    x = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))  # ties: measure 0
    cot = jnp.array(rng.randn(2, 4, 4, 3).astype(np.float32))
    g_dense = jax.grad(lambda a: jnp.sum(max_pool2d(a, 2) * cot))(x)
    g_sas = jax.grad(lambda a: jnp.sum(_reduce_window_max(a, 2, 2) * cot))(x)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_sas),
                               rtol=1e-6, atol=1e-6)


def test_max_pool_custom_grad_tie_splitting(monkeypatch):
    """Tied maxima split the cotangent evenly (sum-preserving)."""
    import jax

    monkeypatch.setenv("TERRAIN_POOL_VJP", "dense")
    x = jnp.ones((1, 2, 2, 1), jnp.float32)  # one window, 4-way tie
    g = jax.grad(lambda a: jnp.sum(max_pool2d(a, 2)) * 1.0)(x)
    np.testing.assert_allclose(np.asarray(g), 0.25 * np.ones((1, 2, 2, 1)))
    assert float(jnp.sum(g)) == 1.0


def test_max_pool_lanes_fwd_and_grad_match_sas(rng, monkeypatch):
    """TERRAIN_POOL_VJP=lanes: lane/major-dim pairing formulation equals
    reduce_window fwd everywhere and its grad on tie-free inputs — in
    fp32 and the flagship bf16 path."""
    import jax

    from terrain_tpu.ops.pool import _reduce_window_max

    monkeypatch.setenv("TERRAIN_POOL_VJP", "lanes")
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.array(rng.randn(2, 8, 6, 3).astype(np.float32)).astype(dtype)
        cot = jnp.array(
            rng.randn(2, 4, 3, 3).astype(np.float32)).astype(dtype)
        y = jax.jit(lambda a: max_pool2d(a, 2))(x)
        y_ref = _reduce_window_max(x, 2, 2)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(y_ref, np.float32))
        loss = lambda a: jnp.sum((max_pool2d(a, 2) * cot).astype(jnp.float32))
        g_lanes = jax.jit(jax.grad(loss))(x)
        g_sas = jax.grad(lambda a: jnp.sum(
            (_reduce_window_max(a, 2, 2) * cot).astype(jnp.float32)))(x)
        np.testing.assert_array_equal(np.asarray(g_lanes, np.float32),
                                      np.asarray(g_sas, np.float32))


def test_max_pool_lanes_tie_routing_row_major_first(monkeypatch):
    """lanes routes a tied window's whole cotangent to the row-major-first
    maximum (select-and-scatter's convention), single winner."""
    import jax

    monkeypatch.setenv("TERRAIN_POOL_VJP", "lanes")
    x = jnp.ones((1, 2, 2, 1), jnp.float32)  # 4-way tie
    g = jax.grad(lambda a: jnp.sum(max_pool2d(a, 2)) * 1.0)(x)
    want = np.zeros((1, 2, 2, 1), np.float32)
    want[0, 0, 0, 0] = 1.0
    np.testing.assert_array_equal(np.asarray(g), want)
    # two-way diagonal tie at the max: (0,1) vs (1,0) -> (0,1) wins
    x2 = jnp.array([[[[0.0], [5.0]], [[5.0], [1.0]]]], jnp.float32)
    g2 = jax.grad(lambda a: jnp.sum(max_pool2d(a, 2)) * 1.0)(x2)
    want2 = np.zeros((1, 2, 2, 1), np.float32)
    want2[0, 0, 1, 0] = 1.0
    np.testing.assert_array_equal(np.asarray(g2), want2)


def test_max_pool_lanes_requires_regime(rng, monkeypatch):
    """Off-regime shapes (odd H/W, size!=2, ints) fall back to
    reduce_window under the lanes knob."""
    from terrain_tpu.ops.pool import _reduce_window_max

    monkeypatch.setenv("TERRAIN_POOL_VJP", "lanes")
    x = jnp.array(rng.randn(1, 7, 6, 3).astype(np.float32))  # odd H
    np.testing.assert_array_equal(
        np.asarray(max_pool2d(x, 2)), np.asarray(_reduce_window_max(x, 2, 2)))
    x4 = jnp.array(rng.randn(1, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool2d(x4, 4)), np.asarray(_reduce_window_max(x4, 4, 4)))
