"""pix2pix U-Net generator + PatchGAN discriminator (stage 2: A -> B).

Behavioral parity with reference architectures/p2p.py, rebuilt NHWC and
generalized over input resolution (the reference asserts 512 at p2p.py:137;
we allow any power of two >= 8 so tiny configs drive tests and the
multi-chip dry run — in_shp=512 reproduces `g_unet` exactly and in_shp=256
reproduces `g_unet_256`).

Topology (p2p.py:126-276), for n_down = log2(in_shp) - 1 stride-2 stages:
  encoder: conv_i = Conv k3 s2 'same' -> BN, channels nf*[1,2,4,8,8,...][i];
           activations are lasagne `leaky_rectify` (leakiness 0.01);
           skip connections tap the *BN output, pre-activation* (conv1..);
           optional `num_repeats` stride-1 conv blocks after each stage;
  bottleneck: conv k2 s1 VALID -> 1x1 (p2p.py:193);
  decoder: dconv1 = Deconv k2 s1 (1->2), then per stage either Deconv k2 s2
           or BilinearUpsample x2 + Conv k3 s1 (`bilinear_upsample`,
           p2p.py:205-267); BN, 0.5 dropout on the first 3 dconvs when
           `dropout`, concat with the mirror encoder BN output, leaky_rectify;
  output: Deconv k2 s2 -> out_ch -> act (tanh), in [-1,1].

PatchGAN (p2p.py:278-308): concat(A,B) on channels, blocks of
Conv k3 s2 'same' (stride 1 for repeats) + leaky_rectify (+ BN *after* the
activation — reference order), then a final Conv k3 **s2** -> 1ch -> act:
a 16x16 patch score map for 512px inputs; losses take the mean over patches
(pix2pix.py:107-121).
"""

import math

import jax
import jax.numpy as jnp

from terrain_tpu.models.core import (
    Network,
    bn_init,
    conv_init,
    deconv_init,
    dropout,
)
from terrain_tpu.ops import (
    batch_norm,
    bilinear2x_conv3x3,
    conv2d,
    conv2d_leaky,
    conv2d_transpose,
    get_activation,
    leaky_relu,
    upsample_bilinear_2x,
)


def _enc_mults(n_down):
    return [min(2**i, 8) for i in range(n_down)]


def g_unet(
    in_shp,
    is_a_grayscale,
    is_b_grayscale,
    nf=64,
    act="tanh",
    dropout_p=False,
    num_repeats=0,
    bilinear_upsample=False,
    compute_dtype=None,
    dropout=None,  # reference kwarg name (p2p.py:126); alias of dropout_p
):
    """U-Net generator factory (reference architectures/p2p.py:126-276)."""
    if dropout is not None:
        dropout_p = dropout
    if isinstance(dropout_p, bool):
        dropout_p = 0.5 if dropout_p else 0.0
    n_down = int(math.log2(in_shp)) - 1
    assert 2 ** (n_down + 1) == in_shp and n_down >= 2, f"in_shp {in_shp} must be a power of two >= 8"
    in_ch = 1 if is_a_grayscale else 3
    out_ch = 1 if is_b_grayscale else 3
    mults = _enc_mults(n_down)
    act_fn = get_activation(act)
    cd = compute_dtype or jnp.float32
    # the factory kwarg `dropout` shadows the core helper inside this scope
    from terrain_tpu.models.core import dropout as _drop

    def init(key):
        n_keys = n_down * (1 + num_repeats) + 1 + n_down + 1
        keys = jax.random.split(key, n_keys)
        ki = iter(keys)
        params, state = {}, {}
        # encoder
        enc_p, enc_s = [], []
        cin = in_ch
        for m in mults:
            cout = nf * m
            blk_p = {"conv": conv_init(next(ki), 3, cin, cout)}
            blk_p["bn"], bn_s = bn_init(cout)
            blk_s = {"bn": bn_s}
            reps_p, reps_s = [], []
            for _ in range(num_repeats):
                rp = {"conv": conv_init(next(ki), 3, cout, cout)}
                rp["bn"], rs = bn_init(cout)
                reps_p.append(rp)
                reps_s.append({"bn": rs})
            blk_p["repeats"] = reps_p
            blk_s["repeats"] = reps_s
            enc_p.append(blk_p)
            enc_s.append(blk_s)
            cin = cout
        params["enc"] = enc_p
        state["enc"] = enc_s
        # bottleneck (conv9 for 512px): k2 s1 valid
        cb = nf * mults[-1]
        params["bottleneck"] = {"conv": conv_init(next(ki), 2, cin, cb)}
        params["bottleneck"]["bn"], bn_s = bn_init(cb)
        state["bottleneck"] = {"bn": bn_s}
        # decoder
        dec_p, dec_s = [], []
        cin = cb
        for j in range(n_down):
            cout = nf * mults[n_down - 1 - j]
            blk_p = {}
            if j == 0 or not bilinear_upsample:
                k = 2
                blk_p["deconv"] = deconv_init(next(ki), k, cin, cout)
            else:
                blk_p["conv"] = conv_init(next(ki), 3, cin, cout)
            blk_p["bn"], bn_s = bn_init(cout)
            dec_p.append(blk_p)
            dec_s.append({"bn": bn_s})
            cin = cout + nf * mults[n_down - 1 - j]  # concat with mirror skip
        params["dec"] = dec_p
        state["dec"] = dec_s
        params["deconv_out"] = deconv_init(next(ki), 2, cin, out_ch)
        return params, state

    def apply(params, state, x, *, train=False, rng=None):
        new_state = {"enc": [], "dec": []}
        x = x.astype(cd)
        skips = []
        li = 0
        for i in range(n_down):
            p, s = params["enc"][i], state["enc"][i]
            x = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2, padding="same", compute_dtype=cd)
            x, ns_bn = batch_norm(x, p["bn"], s["bn"], train=train)
            skips.append(x)  # skip = BN output, pre-activation (p2p.py:145-147)
            x = leaky_relu(x, 0.01)
            reps_s = []
            for r in range(num_repeats):
                rp, rs = p["repeats"][r], s["repeats"][r]
                x = conv2d(x, rp["conv"]["w"], rp["conv"]["b"], stride=1, padding="same", compute_dtype=cd)
                x, nrs = batch_norm(x, rp["bn"], rs["bn"], train=train)
                x = leaky_relu(x, 0.01)
                reps_s.append({"bn": nrs})
            new_state["enc"].append({"bn": ns_bn, "repeats": reps_s})
        p, s = params["bottleneck"], state["bottleneck"]
        x = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=1, padding="valid", compute_dtype=cd)
        x, ns_bn = batch_norm(x, p["bn"], s["bn"], train=train)
        new_state["bottleneck"] = {"bn": ns_bn}
        x = leaky_relu(x, 0.01)
        for j in range(n_down):
            p, s = params["dec"][j], state["dec"][j]
            if j == 0:
                x = conv2d_transpose(x, p["deconv"]["w"], p["deconv"]["b"], stride=1, compute_dtype=cd)
            elif bilinear_upsample:
                # fused upsample+conv (Pallas on TPU in-regime, exact
                # composite elsewhere) — see ops/fused.bilinear2x_conv3x3
                x = bilinear2x_conv3x3(x, p["conv"]["w"], p["conv"]["b"],
                                       compute_dtype=cd)
            else:
                x = conv2d_transpose(x, p["deconv"]["w"], p["deconv"]["b"], stride=2, compute_dtype=cd)
            x, ns_bn = batch_norm(x, p["bn"], s["bn"], train=train)
            new_state["dec"].append({"bn": ns_bn})
            if dropout_p > 0.0 and j < 3:
                x = _drop(x, dropout_p, jax.random.fold_in(rng, li) if rng is not None else None, train)
            li += 1
            x = jnp.concatenate([x, skips[n_down - 1 - j]], axis=-1)
            x = leaky_relu(x, 0.01)
        x = conv2d_transpose(x, params["deconv_out"]["w"], params["deconv_out"]["b"], stride=2, compute_dtype=cd)
        return act_fn(x.astype(jnp.float32)), new_state

    return Network(
        name="unet_generator",
        init=init,
        apply=apply,
        n_inputs=1,
        config=dict(
            in_shp=in_shp, in_ch=in_ch, out_ch=out_ch, nf=nf, act=act,
            dropout_p=dropout_p, num_repeats=num_repeats,
            bilinear_upsample=bilinear_upsample, n_down=n_down,
        ),
    )


def g_unet_256(in_shp, is_a_grayscale, is_b_grayscale, nf=64, act="tanh", dropout=0.0, compute_dtype=None):
    """256px variant (reference architectures/p2p.py:29-122): same topology
    with 7 stride-2 stages, deconv-only decoder, float dropout on the first
    3 decoder blocks."""
    assert in_shp == 256, "g_unet_256 requires in_shp == 256 (p2p.py:40)"
    return g_unet(
        in_shp, is_a_grayscale, is_b_grayscale, nf=nf, act=act,
        dropout_p=float(dropout), num_repeats=0, bilinear_upsample=False,
        compute_dtype=compute_dtype,
    )


def _patchgan(name, in_shp, is_a_grayscale, is_b_grayscale, nf, act, mul_factor,
              num_repeats, bn_rule, compute_dtype):
    mul_factor = tuple(mul_factor)
    a_ch = 1 if is_a_grayscale else 3
    b_ch = 1 if is_b_grayscale else 3
    act_fn = get_activation(act)
    cd = compute_dtype or jnp.float32

    def init(key):
        keys = jax.random.split(key, len(mul_factor) * (num_repeats + 1) + 1)
        ki = iter(keys)
        params, state = {"blocks": []}, {"blocks": []}
        cin = a_ch + b_ch
        for idx, m in enumerate(mul_factor):
            reps_p, reps_s = [], []
            for r in range(num_repeats + 1):
                cout = nf * m
                p = {"conv": conv_init(next(ki), 3, cin, cout)}
                s = {}
                if bn_rule(idx):
                    p["bn"], s["bn"] = bn_init(cout)
                reps_p.append(p)
                reps_s.append(s)
                cin = cout
            params["blocks"].append(reps_p)
            state["blocks"].append(reps_s)
        params["conv_out"] = conv_init(next(ki), 3, cin, 1)
        return params, state

    def apply(params, state, a, b, *, train=False, rng=None):
        new_state = {"blocks": []}
        x = jnp.concatenate([a.astype(cd), b.astype(cd)], axis=-1)
        for idx in range(len(mul_factor)):
            reps_s = []
            for r in range(num_repeats + 1):
                p = params["blocks"][idx][r]
                s = state["blocks"][idx][r]
                # conv2d_leaky lets the small-cin Pallas first-layer kernel
                # fuse the activation into its epilogue (like the DCGAN
                # disc stem); identical to conv2d + leaky_relu otherwise
                x = conv2d_leaky(x, p["conv"]["w"], p["conv"]["b"],
                                 slope=0.01, stride=2 if r == 0 else 1,
                                 padding="same", compute_dtype=cd)
                ns = {}
                if bn_rule(idx):
                    # reference order: BN *after* the activation (p2p.py:285-288)
                    x, ns["bn"] = batch_norm(x, p["bn"], s["bn"], train=train)
                reps_s.append(ns)
            new_state["blocks"].append(reps_s)
        # final conv keeps the wrapper's default stride 2 (p2p.py:20, 289)
        x = conv2d(x, params["conv_out"]["w"], params["conv_out"]["b"], stride=2, padding="same", compute_dtype=cd)
        return act_fn(x.astype(jnp.float32)), new_state

    return Network(
        name=name,
        init=init,
        apply=apply,
        n_inputs=2,
        config=dict(
            in_shp=in_shp, a_ch=a_ch, b_ch=b_ch, nf=nf, act=act,
            mul_factor=mul_factor, num_repeats=num_repeats,
        ),
    )


def discriminator(in_shp, is_a_grayscale, is_b_grayscale, nf=32, act="sigmoid",
                  mul_factor=(1, 2, 4, 8), num_repeats=0, bn=False, compute_dtype=None):
    """PatchGAN over concat(A, B) (reference architectures/p2p.py:278-292)."""
    return _patchgan(
        "patchgan_discriminator", in_shp, is_a_grayscale, is_b_grayscale,
        nf, act, mul_factor, num_repeats, (lambda idx: bn), compute_dtype,
    )


def discriminator2(in_shp, is_a_grayscale, is_b_grayscale, nf=32, act="sigmoid",
                   mul_factor=(1, 2, 4, 8), num_repeats=0, compute_dtype=None):
    """PatchGAN variant with BN on every block except the first
    (reference architectures/p2p.py:294-308)."""
    return _patchgan(
        "patchgan_discriminator2", in_shp, is_a_grayscale, is_b_grayscale,
        nf, act, mul_factor, num_repeats, (lambda idx: idx != 0), compute_dtype,
    )


def fake_generator(is_a_grayscale, is_b_grayscale, act="tanh", in_shp=512, compute_dtype=None):
    """1-conv debug generator (reference architectures/p2p.py:314-318)."""
    in_ch = 1 if is_a_grayscale else 3
    out_ch = 1 if is_b_grayscale else 3
    act_fn = get_activation(act)
    cd = compute_dtype or jnp.float32

    def init(key):
        return {"conv": conv_init(key, 3, in_ch, out_ch)}, {}

    def apply(params, state, x, *, train=False, rng=None):
        x = conv2d(x.astype(cd), params["conv"]["w"], params["conv"]["b"], stride=1, padding="same", compute_dtype=cd)
        return act_fn(x.astype(jnp.float32)), {}

    return Network("fake_generator", init, apply, 1, dict(in_shp=in_shp))


def fake_discriminator(is_a_grayscale, is_b_grayscale, in_shp=512, compute_dtype=None):
    """1-conv debug discriminator (reference architectures/p2p.py:320-325).
    Keeps the wrapper's default stride 2, linear output."""
    a_ch = 1 if is_a_grayscale else 3
    b_ch = 1 if is_b_grayscale else 3
    cd = compute_dtype or jnp.float32

    def init(key):
        return {"conv": conv_init(key, 3, a_ch + b_ch, 1)}, {}

    def apply(params, state, a, b, *, train=False, rng=None):
        x = jnp.concatenate([a.astype(cd), b.astype(cd)], axis=-1)
        x = conv2d(x, params["conv"]["w"], params["conv"]["b"], stride=2, padding="same", compute_dtype=cd)
        return x.astype(jnp.float32), {}

    return Network("fake_discriminator", init, apply, 2, dict(in_shp=in_shp))
