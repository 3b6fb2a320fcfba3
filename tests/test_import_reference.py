"""Reference weight-format conversion tests.

1. Numerical: lasagne Conv2D does *true convolution* (flip_filters=True) and
   its deconv scatters the unflipped kernel — verify our converters make
   XLA's correlation/flipped-scatter reproduce those semantics, against
   direct NumPy implementations.
2. Structural: export_from_model -> import_into_model must round-trip a
   model's params/states exactly (both directions of every transform).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tools")

from import_reference_weights import (  # noqa: E402
    conv_w_from_ref,
    deconv_w_from_ref,
    dense_feats_from_ref,
    dense_feats_to_ref,
    export_from_model,
    import_into_model,
)

from terrain_tpu.ops import conv2d, conv2d_transpose  # noqa: E402


def _theano_conv_same(x, W):
    """Lasagne Conv2DLayer semantics: TRUE convolution (kernel flipped),
    pad='same'.  x: (N,H,W,cin) NHWC for convenience; W: (cout,cin,kh,kw)."""
    n, h, w_, cin = x.shape
    cout, _, kh, kw = W.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    Wf = W[:, :, ::-1, ::-1]  # flip -> correlation with flipped kernel
    out = np.zeros((n, h, w_, cout), np.float32)
    for i in range(h):
        for j in range(w_):
            patch = xp[:, i:i + kh, j:j + kw, :]  # (n,kh,kw,cin)
            out[:, i, j, :] = np.einsum("nhwc,ochw->no", patch, Wf)
    return out


def _theano_deconv(x, W, stride):
    """Lasagne TransposedConv2D semantics: gradient of correlation, i.e.
    scatter the UNflipped kernel.  W: (cin,cout,kh,kw)."""
    n, h, w_, cin = x.shape
    _, cout, kh, kw = W.shape
    oh, ow = (h - 1) * stride + kh, (w_ - 1) * stride + kw
    out = np.zeros((n, oh, ow, cout), np.float32)
    for i in range(h):
        for j in range(w_):
            for ci in range(cin):
                out[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :] += (
                    x[:, i, j, ci][:, None, None, None]
                    * W[ci].transpose(1, 2, 0)[None])
    return out


def test_conv_import_matches_theano_semantics(rng):
    x = rng.randn(2, 6, 6, 3).astype(np.float32)
    W = rng.randn(4, 3, 5, 5).astype(np.float32)  # (cout,cin,kh,kw)
    want = _theano_conv_same(x, W)
    got = np.asarray(conv2d(jnp.array(x), jnp.array(conv_w_from_ref(W)),
                            stride=1, padding="same"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deconv_import_matches_theano_semantics(rng):
    x = rng.randn(1, 3, 3, 2).astype(np.float32)
    W = rng.randn(2, 4, 2, 2).astype(np.float32)  # (cin,cout,kh,kw)
    want = _theano_deconv(x, W, 2)
    got = np.asarray(conv2d_transpose(jnp.array(x),
                                      jnp.array(deconv_w_from_ref(W)), stride=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dense_feature_permutation_roundtrip(rng):
    nch, s = 4, 2
    v = rng.randn(nch * s * s).astype(np.float32)
    np.testing.assert_allclose(
        dense_feats_to_ref(dense_feats_from_ref(v, nch, s), nch, s), v)
    W = rng.randn(7, nch * s * s).astype(np.float32)
    np.testing.assert_allclose(
        dense_feats_to_ref(dense_feats_from_ref(W, nch, s), nch, s), W)


def test_dense_permutation_preserves_reshape_semantics(rng):
    """Reference: dense -> reshape (N,nch,s,s); ours: dense' -> reshape
    (N,s,s,nch).  With the permuted W, both must produce the same value at
    (c, y, x) vs (y, x, c)."""
    nch, s, din = 3, 2, 5
    W = rng.randn(din, nch * s * s).astype(np.float32)
    z = rng.randn(1, din).astype(np.float32)
    ref = (z @ W).reshape(1, nch, s, s)
    ours = (z @ dense_feats_from_ref(W, nch, s)).reshape(1, s, s, nch)
    np.testing.assert_allclose(ours[0].transpose(2, 0, 1), ref[0], rtol=1e-5)


@pytest.mark.parametrize("bilinear", [False, True])
def test_full_model_export_import_roundtrip(bilinear):
    from terrain_tpu.models import dcgan, p2p
    from terrain_tpu.train.trainer import TwoStageGAN

    IN, LAT = 16, 8
    def build(seed):
        return TwoStageGAN(
            gen_fn_dcgan=dcgan.default_generator,
            disc_fn_dcgan=dcgan.default_discriminator,
            gen_params_dcgan={"nch": 8, "h": 3, "initial_size": 4,
                              "final_size": IN, "div": [2, 2]},
            disc_params_dcgan={"nch": IN, "h": 3, "div": [4, 2], "bn": True,
                               "nonlinearity": "linear"},
            gen_fn_p2p=p2p.g_unet,
            disc_fn_p2p=p2p.discriminator,
            gen_params_p2p={"nf": 4, "act": "tanh", "num_repeats": 1,
                            "bilinear_upsample": bilinear},
            disc_params_p2p={"nf": 4, "bn": True, "act": "linear"},
            in_shp=IN, latent_dim=LAT, is_a_grayscale=True,
            is_b_grayscale=False, lsgan=True, opt="rmsprop",
            opt_args={"learning_rate": 1e-4}, verbose=False, seed=seed)

    src = build(seed=0)
    payload = export_from_model(src)
    dst = build(seed=99)  # different init
    import_into_model(payload, dst)
    for n in src.params:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            src.params[n], dst.params[n])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            src.states[n], dst.states[n])
    # and the imported model computes identical outputs
    z = jnp.asarray(np.random.RandomState(1).rand(2, LAT).astype(np.float32))
    a_src, _ = src.nets["dcgan_gen"].apply(
        src.params["dcgan_gen"], src.states["dcgan_gen"], z, train=False)
    a_dst, _ = dst.nets["dcgan_gen"].apply(
        dst.params["dcgan_gen"], dst.states["dcgan_gen"], z, train=False)
    np.testing.assert_allclose(np.asarray(a_src), np.asarray(a_dst), atol=1e-6)
