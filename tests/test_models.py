"""Model factory tests: shapes on tiny configs, param counts at full size.

Expected parameter counts are hand-derived from the reference formulas
(architectures/dcgan.py:14-58 with the experiments.py:105-106 configs):
DCGAN G = 14,774,657 and DCGAN D = 5,129,217 trainable params (~14.8M/5.1M,
matching SURVEY.md §2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terrain_tpu.models import dcgan, param_count, unet

KEY = jax.random.PRNGKey(0)


def test_dcgan_generator_tiny_shapes():
    # 4 -> 32px with 3 stages
    net = dcgan.default_generator(
        latent_dim=16, is_a_grayscale=True, nch=32, h=5, initial_size=4,
        final_size=32, div=[2, 2, 4], num_repeats=0,
    )
    params, state = net.init(KEY)
    z = jnp.zeros((2, 16))
    out, new_state = net.apply(params, state, z, train=True, rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid
    det, _ = net.apply(params, state, z, train=False)
    assert det.shape == (2, 32, 32, 1)


def test_dcgan_generator_full_param_count():
    net = dcgan.default_generator(
        latent_dim=1000, is_a_grayscale=True, div=[2, 2, 4, 4, 8, 8, 8],
        num_repeats=0,
    )
    params, _ = net.init(KEY)
    assert param_count(params) == 14_774_657


def test_dcgan_discriminator_full_param_count():
    net = dcgan.default_discriminator(
        in_shp=512, is_a_grayscale=True, div=[8, 4, 4, 4, 2, 2, 2],
        num_repeats=0, bn=False, nonlinearity="linear",
    )
    params, _ = net.init(KEY)
    assert param_count(params) == 5_129_217


def test_dcgan_discriminator_tiny_shapes():
    net = dcgan.default_discriminator(
        in_shp=32, is_a_grayscale=True, nch=32, h=5, div=[4, 2, 1],
        bn=False, nonlinearity="linear",
    )
    params, state = net.init(KEY)
    x = jnp.zeros((2, 32, 32, 1))
    out, _ = net.apply(params, state, x, train=True)
    assert out.shape == (2, 1)


def test_dcgan_discriminator_mismatched_pool_asserts():
    with pytest.raises(AssertionError):
        dcgan.default_discriminator(in_shp=64, is_a_grayscale=True, nch=32, div=[4, 2, 1])


@pytest.mark.parametrize("bilinear", [False, True])
def test_unet_tiny_shapes(bilinear):
    net = unet.g_unet(
        in_shp=32, is_a_grayscale=True, is_b_grayscale=False, nf=4,
        act="tanh", dropout=True, num_repeats=1, bilinear_upsample=bilinear,
    )
    params, state = net.init(KEY)
    x = jnp.zeros((2, 32, 32, 1))
    out, new_state = net.apply(params, state, x, train=True, rng=jax.random.PRNGKey(3))
    assert out.shape == (2, 32, 32, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0  # tanh
    det, _ = net.apply(params, state, x, train=False)
    assert det.shape == (2, 32, 32, 3)


def test_unet_256_is_the_generic_topology():
    net = unet.g_unet_256(256, True, False, nf=2, dropout=0.5)
    assert net.config["n_down"] == 7
    assert net.config["dropout_p"] == 0.5


def test_patchgan_shapes_and_stride2_final():
    # in_shp 64: 4 stride-2 blocks + stride-2 final conv -> 2x2 patch map
    net = unet.discriminator(64, True, False, nf=4, act="linear")
    params, state = net.init(KEY)
    a = jnp.zeros((2, 64, 64, 1))
    b = jnp.zeros((2, 64, 64, 3))
    out, _ = net.apply(params, state, a, b, train=True)
    assert out.shape == (2, 2, 2, 1)


def test_patchgan_bn_variants():
    d1 = unet.discriminator(64, True, False, nf=4, bn=True)
    p1, s1 = d1.init(KEY)
    assert "bn" in p1["blocks"][0][0]
    d2 = unet.discriminator2(64, True, False, nf=4)
    p2, s2 = d2.init(KEY)
    assert "bn" not in p2["blocks"][0][0]  # first block skips BN (p2p.py:303)
    assert "bn" in p2["blocks"][1][0]
    a = jnp.ones((2, 64, 64, 1))
    b = jnp.ones((2, 64, 64, 3))
    out, ns = d2.apply(p2, s2, a, b, train=True)
    assert out.shape == (2, 2, 2, 1)


def test_fake_networks():
    g = unet.fake_generator(True, False, in_shp=16)
    gp, gs = g.init(KEY)
    out, _ = g.apply(gp, gs, jnp.zeros((1, 16, 16, 1)))
    assert out.shape == (1, 16, 16, 3)
    d = unet.fake_discriminator(True, False, in_shp=16)
    dp, ds = d.init(KEY)
    out, _ = d.apply(dp, ds, jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 8, 8, 1)


def test_generator_dropout_and_bilinear_paths():
    net = dcgan.default_generator(
        latent_dim=8, is_a_grayscale=True, nch=16, h=3, initial_size=4,
        final_size=16, div=[2, 2], dropout_p=0.5, bilinear_upsample=True,
    )
    params, state = net.init(KEY)
    z = jax.random.uniform(jax.random.PRNGKey(7), (2, 8))
    out1, _ = net.apply(params, state, z, train=True, rng=jax.random.PRNGKey(1))
    out2, _ = net.apply(params, state, z, train=True, rng=jax.random.PRNGKey(2))
    # different dropout keys -> different outputs
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    det1, _ = net.apply(params, state, z, train=False)
    det2, _ = net.apply(params, state, z, train=False)
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det2))


def test_dcgan_discriminator_conv_out_nonlinearity_knob():
    # The reference leaves lasagne's default rectify on the final conv
    # (dcgan.py:50); conv_out_nonlinearity="linear" is our opt-in stability
    # knob that removes that dead zone.  Same params, pre-pool map railed
    # negative: relu variant outputs exactly act(0) with zero gradient,
    # linear variant stays alive.
    kw = dict(in_shp=16, is_a_grayscale=True, nch=16, h=3, div=[4, 2],
              nonlinearity="linear")
    relu_net = dcgan.default_discriminator(**kw)  # default = reference quirk
    lin_net = dcgan.default_discriminator(conv_out_nonlinearity="linear", **kw)
    assert relu_net.config["conv_out_nonlinearity"] == "relu"
    params, state = relu_net.init(KEY)
    params["conv_out"]["b"] = params["conv_out"]["b"] - 100.0
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1), jnp.float32)
    out_r, _ = relu_net.apply(params, state, x)
    out_l, _ = lin_net.apply(params, state, x)
    np.testing.assert_array_equal(np.asarray(out_r), 0.0)
    assert np.all(np.asarray(out_l) < 0)

    def _maxabs(tree):
        return max(jax.tree.leaves(jax.tree.map(
            lambda a: float(jnp.max(jnp.abs(a))), tree)))

    g_r = jax.grad(lambda p: relu_net.apply(p, state, x)[0].sum())(params)
    g_l = jax.grad(lambda p: lin_net.apply(p, state, x)[0].sum())(params)
    assert _maxabs(g_r) == 0.0, "hidden rectify should be dead here"
    assert _maxabs(g_l) > 0.0, "linear conv_out must keep gradients alive"
