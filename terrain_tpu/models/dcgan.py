"""DCGAN generator/discriminator factories (stage 1: z -> heightmap).

Behavioral parity with reference architectures/dcgan.py:14-58, rebuilt NHWC:

  default_generator (dcgan.py:14-33):
    z(latent_dim) -> Dense(nch*s0*s0, linear) -> BN -> reshape (s0,s0,nch)
    -> per stage in div: (num_repeats+1) x [Conv(h)same linear -> BN ->
       LeakyReLU(0.2) -> optional dropout], then x2 upsample (repeat, or
       bilinear when bilinear_upsample=True)
    -> Conv(h) -> out_ch -> sigmoid.   Output in [0,1].

  default_discriminator (dcgan.py:35-58):
    image -> per stage in div: (num_repeats+1) x [Conv(h)same linear ->
       optional BN -> LeakyReLU(0.2)], then 2x2 pool (max or average)
    -> Conv(h)->1ch with **ReLU** (the lasagne Conv2DLayer default
       nonlinearity — a reference quirk at dcgan.py:50 we reproduce)
    -> AvgPool(nch // 2**len(div)) -> reshape (N,1) -> output nonlinearity.

    Note the avg-pool window is derived from `nch`, not the spatial size
    (dcgan.py:51) — it only matches the remaining spatial extent when
    nch == in_shp (true for the shipped experiments, experiments.py:34,
    nch=512, in_shp=512).  We assert that so misconfigurations fail loudly.

Per-stage channel counts are nch//div[i], e.g. the shipped generator div
[2,2,4,4,8,8,8] -> (256,256,128,128,64,64,64) rising 4px -> 512px
(experiments.py:105).
"""

import jax
import jax.numpy as jnp

from terrain_tpu.models.core import (
    Network,
    bn_init,
    conv_init,
    dense_init,
    dropout,
)
from terrain_tpu.ops import (
    avg_pool2d,
    batch_norm,
    conv2d,
    conv2d_leaky,
    dense,
    get_activation,
    leaky_relu,
    max_pool2d,
    upsample_bilinear_2x,
    upsample_nearest_2x,
)
from terrain_tpu.ops.fused import upsample2x_nearest_conv


def default_generator(
    latent_dim,
    is_a_grayscale,
    nch=512,
    h=5,
    initial_size=4,
    final_size=512,
    div=(2, 2, 4, 4, 8, 8, 16),
    num_repeats=0,
    dropout_p=0.0,
    bilinear_upsample=False,
    compute_dtype=None,
):
    """DCGAN generator factory (reference architectures/dcgan.py:14-33)."""
    div = tuple(div)
    out_ch = 1 if is_a_grayscale else 3
    channels = [nch // d for d in div]
    assert initial_size * (2 ** len(div)) == final_size, (
        f"initial_size {initial_size} x 2^{len(div)} != final_size {final_size}"
    )
    cd = compute_dtype or jnp.float32

    def init(key):
        keys = jax.random.split(key, 2 + len(div) * (num_repeats + 1))
        ki = iter(keys)
        params, state = {}, {}
        params["dense"] = dense_init(next(ki), latent_dim, nch * initial_size**2)
        params["bn_in"], state["bn_in"] = bn_init(nch * initial_size**2)
        stages_p, stages_s = [], []
        cin = nch
        for n in channels:
            reps_p, reps_s = [], []
            for _ in range(num_repeats + 1):
                p = {"conv": conv_init(next(ki), h, cin, n)}
                p["bn"], s = bn_init(n)
                reps_p.append(p)
                reps_s.append({"bn": s})
                cin = n
            stages_p.append(reps_p)
            stages_s.append(reps_s)
        params["stages"] = stages_p
        state["stages"] = stages_s
        params["conv_out"] = conv_init(next(ki), h, cin, out_ch)
        return params, state

    def apply(params, state, z, *, train=False, rng=None):
        # Each stage is [conv -> BN -> LReLU]xR then x2 upsample; with the
        # (shipped) nearest upsample the following stage's first conv fuses
        # into one low-res phase-decomposed conv (ops/fused.py) — exact same
        # math, ~2.8x fewer conv FLOPs for h=5, no 2x-res intermediate.
        new_state = {"stages": []}
        x = dense(z.astype(cd), params["dense"]["w"], params["dense"]["b"], compute_dtype=cd)
        x, new_state["bn_in"] = batch_norm(x, params["bn_in"], state["bn_in"], train=train)
        n = x.shape[0]
        x = x.reshape(n, initial_size, initial_size, nch)
        fuse = (not bilinear_upsample) and h % 2 == 1
        pending_up = False

        def _conv(x, p, pending):
            if pending:
                if fuse:
                    return upsample2x_nearest_conv(
                        x, p["w"], p["b"], compute_dtype=cd)
                x = (upsample_bilinear_2x(x) if bilinear_upsample
                     else upsample_nearest_2x(x))
            return conv2d(x, p["w"], p["b"], stride=1, padding="same",
                          compute_dtype=cd)

        li = 0
        for si, ch in enumerate(channels):
            reps_s = []
            for ri in range(num_repeats + 1):
                p = params["stages"][si][ri]
                s = state["stages"][si][ri]
                x = _conv(x, p["conv"], pending_up)
                pending_up = False
                x, ns = batch_norm(x, p["bn"], s["bn"], train=train)
                x = leaky_relu(x, 0.2)
                if dropout_p > 0.0:
                    x = dropout(x, dropout_p, jax.random.fold_in(rng, li) if rng is not None else None, train)
                reps_s.append({"bn": ns})
                li += 1
            new_state["stages"].append(reps_s)
            pending_up = True
        x = _conv(x, params["conv_out"], pending_up)
        return jax.nn.sigmoid(x.astype(jnp.float32)), new_state

    return Network(
        name="dcgan_generator",
        init=init,
        apply=apply,
        n_inputs=1,
        config=dict(
            latent_dim=latent_dim, out_ch=out_ch, nch=nch, h=h,
            initial_size=initial_size, final_size=final_size, div=div,
            num_repeats=num_repeats, dropout_p=dropout_p,
            bilinear_upsample=bilinear_upsample,
        ),
    )


def default_discriminator(
    in_shp,
    is_a_grayscale,
    nch=512,
    h=5,
    div=(8, 4, 4, 2, 2, 1, 1),
    num_repeats=0,
    bn=False,
    pool_mode="max",
    nonlinearity="sigmoid",
    conv_out_nonlinearity="relu",
    compute_dtype=None,
):
    """DCGAN discriminator factory (reference architectures/dcgan.py:35-58).

    conv_out_nonlinearity: activation after the final 1-channel conv, BEFORE
    the avg-pool.  The reference leaves lasagne's Conv2DLayer default
    (rectify) there — dcgan.py:50 — which can rail the pre-pool map to zero
    and kill the discriminator's gradient (observed: training collapses on a
    knife edge, seed-dependent).  "relu" (default) reproduces the reference;
    "linear" is the stability knob that removes the dead zone.
    """
    div = tuple(div)
    in_ch = 1 if is_a_grayscale else 3
    channels = [nch // d for d in div]
    reduction_factor = nch // (2 ** len(div))
    final_spatial = in_shp // (2 ** len(div))
    assert reduction_factor == final_spatial, (
        f"avg-pool window nch//2^len(div)={reduction_factor} must equal the "
        f"remaining spatial extent in_shp//2^len(div)={final_spatial} "
        "(reference quirk dcgan.py:51 requires nch == in_shp)"
    )
    act = get_activation(nonlinearity)
    conv_out_act = get_activation(conv_out_nonlinearity)
    cd = compute_dtype or jnp.float32

    def init(key):
        keys = jax.random.split(key, 1 + len(div) * (num_repeats + 1))
        ki = iter(keys)
        params, state = {"stages": []}, {"stages": []}
        cin = in_ch
        for n in channels:
            reps_p, reps_s = [], []
            for _ in range(num_repeats + 1):
                p = {"conv": conv_init(next(ki), h, cin, n)}
                s = {}
                if bn:
                    p["bn"], s["bn"] = bn_init(n)
                reps_p.append(p)
                reps_s.append(s)
                cin = n
            params["stages"].append(reps_p)
            state["stages"].append(reps_s)
        params["conv_out"] = conv_init(next(ki), h, cin, 1)
        return params, state

    def apply(params, state, x, *, train=False, rng=None):
        new_state = {"stages": []}
        x = x.astype(cd)
        for si in range(len(channels)):
            reps_s = []
            for ri in range(num_repeats + 1):
                p = params["stages"][si][ri]
                s = state["stages"][si][ri]
                ns = {}
                if bn:
                    x = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=1, padding="same", compute_dtype=cd)
                    x, ns["bn"] = batch_norm(x, p["bn"], s["bn"], train=train)
                    x = leaky_relu(x, 0.2)
                else:
                    # conv+leaky in one op: lets the Pallas stem kernel fuse
                    # the activation epilogue (ops/conv.py conv2d_leaky)
                    x = conv2d_leaky(x, p["conv"]["w"], p["conv"]["b"],
                                     slope=0.2, stride=1, padding="same",
                                     compute_dtype=cd)
                reps_s.append(ns)
            new_state["stages"].append(reps_s)
            x = max_pool2d(x, 2) if pool_mode == "max" else avg_pool2d(x, 2)
        x = conv2d(x, params["conv_out"]["w"], params["conv_out"]["b"], stride=1, padding="same", compute_dtype=cd)
        x = conv_out_act(x)  # default relu = lasagne Conv2DLayer rectify, dcgan.py:50
        x = avg_pool2d(x, reduction_factor)
        x = x.reshape(x.shape[0], 1).astype(jnp.float32)
        return act(x), new_state

    return Network(
        name="dcgan_discriminator",
        init=init,
        apply=apply,
        n_inputs=1,
        config=dict(
            in_shp=in_shp, in_ch=in_ch, nch=nch, h=h, div=div,
            num_repeats=num_repeats, bn=bn, pool_mode=pool_mode,
            nonlinearity=nonlinearity,
            conv_out_nonlinearity=conv_out_nonlinearity,
        ),
    )
