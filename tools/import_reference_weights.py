"""Import reference (Theano/Lasagne) checkpoints into terrain_tpu trees.

The reference saves gzip-pickles of
{'dcgan': {'gen': [...], 'disc': [...]}, 'p2p': {'gen': [...], 'disc': [...]}}
where each list is lasagne.layers.get_all_param_values(net) — every param
(trainable + BN running stats) in topological layer order (pix2pix.py:158-166).

Per-layer lasagne orders and the conversions to our NHWC trees:
  DenseLayer           [W (din,dout), b]          -> as-is (but see below)
  Conv2DLayer          [W (cout,cin,kh,kw), b]    -> transpose (2,3,1,0) and
      flip both spatial axes: lasagne's flip_filters=True performs true
      convolution while XLA correlates.
  TransposedConv2D     [W (cin,cout,kh,kw), b]    -> transpose (2,3,0,1) and
      flip both spatial axes: lasagne's deconv scatters the *unflipped*
      kernel (gradient of correlation), while lax.conv_transpose scatters
      the flipped one (verified in tests/test_ops.py).
  BatchNormLayer       [beta, gamma, mean, inv_std] -> params {gamma, beta},
      state {mean, inv_std} (identical representation by design, ops/norm.py).

DCGAN generator special case: the reference reshapes the dense output to NCHW
(N, nch, s, s) (dcgan.py:18) while we reshape to (N, s, s, nch), so the dense
W columns / b / following-BN vectors are permuted from (nch, s, s) C-order to
(s, s, nch) C-order.

Run:  python tools/import_reference_weights.py ref.model out.model \
          [--experiment test1_nobn_bilin_both]
"""

import argparse
import gzip
import pickle

import numpy as np


# ------------------------------------------------------------- conversions
def conv_w_from_ref(W):
    """(cout,cin,kh,kw) true-conv -> (kh,kw,cin,cout) correlation."""
    return np.ascontiguousarray(np.transpose(W, (2, 3, 1, 0))[::-1, ::-1])


def conv_w_to_ref(w):
    return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (3, 2, 0, 1)))


def deconv_w_from_ref(W):
    """(cin,cout,kh,kw) unflipped-scatter -> (kh,kw,cin,cout) flipped-scatter."""
    return np.ascontiguousarray(np.transpose(W, (2, 3, 0, 1))[::-1, ::-1])


def deconv_w_to_ref(w):
    return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))


def dense_feats_from_ref(v, nch, s):
    """Permute a per-feature vector (or W columns) from (nch,s,s) C-order to
    (s,s,nch) C-order."""
    v = np.asarray(v)
    if v.ndim == 1:
        return v.reshape(nch, s, s).transpose(1, 2, 0).reshape(-1)
    return v.reshape(v.shape[0], nch, s, s).transpose(0, 2, 3, 1).reshape(v.shape[0], -1)


def dense_feats_to_ref(v, nch, s):
    v = np.asarray(v)
    if v.ndim == 1:
        return v.reshape(s, s, nch).transpose(2, 0, 1).reshape(-1)
    return v.reshape(v.shape[0], s, s, nch).transpose(0, 3, 1, 2).reshape(v.shape[0], -1)


class _Reader:
    def __init__(self, vals):
        self.vals = list(vals)
        self.i = 0

    def take(self, n=1):
        out = self.vals[self.i:self.i + n]
        assert len(out) == n, (
            f"reference list exhausted at {self.i} (+{n} of {len(self.vals)})")
        self.i += n
        return out if n > 1 else out[0]

    def done(self):
        assert self.i == len(self.vals), (
            f"unconsumed reference params: {self.i}/{len(self.vals)}")


class _Writer:
    def __init__(self):
        self.vals = []

    def put(self, *arrs):
        self.vals.extend(np.asarray(a, np.float32) for a in arrs)


# ----------------------------------------------------------- per-net walks
def _bn_from(reader, p_bn, s_bn, perm=None):
    beta, gamma, mean, inv_std = reader.take(4)
    f = perm or (lambda v: v)
    p_bn["beta"] = np.asarray(f(beta), np.float32)
    p_bn["gamma"] = np.asarray(f(gamma), np.float32)
    s_bn["mean"] = np.asarray(f(mean), np.float32)
    s_bn["inv_std"] = np.asarray(f(inv_std), np.float32)


def _bn_to(writer, p_bn, s_bn, perm=None):
    f = perm or (lambda v: v)
    writer.put(f(p_bn["beta"]), f(p_bn["gamma"]), f(s_bn["mean"]), f(s_bn["inv_std"]))


def _conv_from(reader, p_conv):
    W, b = reader.take(2)
    p_conv["w"] = conv_w_from_ref(W).astype(np.float32)
    p_conv["b"] = np.asarray(b, np.float32)


def _conv_to(writer, p_conv):
    writer.put(conv_w_to_ref(np.asarray(p_conv["w"])), p_conv["b"])


def _deconv_from(reader, p):
    W, b = reader.take(2)
    p["w"] = deconv_w_from_ref(W).astype(np.float32)
    p["b"] = np.asarray(b, np.float32)


def _deconv_to(writer, p):
    writer.put(deconv_w_to_ref(np.asarray(p["w"])), p["b"])


def dcgan_gen_from_ref(vals, params, state, cfg):
    r = _Reader(vals)
    nch, s = cfg["nch"], cfg["initial_size"]
    perm = lambda v: dense_feats_from_ref(v, nch, s)
    W, b = r.take(2)
    params["dense"]["w"] = dense_feats_from_ref(W, nch, s).astype(np.float32)
    params["dense"]["b"] = perm(b).astype(np.float32)
    _bn_from(r, params["bn_in"], state["bn_in"], perm)
    for si in range(len(cfg["div"])):
        for ri in range(cfg["num_repeats"] + 1):
            _conv_from(r, params["stages"][si][ri]["conv"])
            _bn_from(r, params["stages"][si][ri]["bn"],
                     state["stages"][si][ri]["bn"])
    _conv_from(r, params["conv_out"])
    r.done()


def dcgan_gen_to_ref(params, state, cfg):
    w = _Writer()
    nch, s = cfg["nch"], cfg["initial_size"]
    perm = lambda v: dense_feats_to_ref(np.asarray(v), nch, s)
    w.put(dense_feats_to_ref(np.asarray(params["dense"]["w"]), nch, s),
          perm(params["dense"]["b"]))
    _bn_to(w, params["bn_in"], state["bn_in"], perm)
    for si in range(len(cfg["div"])):
        for ri in range(cfg["num_repeats"] + 1):
            _conv_to(w, params["stages"][si][ri]["conv"])
            _bn_to(w, params["stages"][si][ri]["bn"],
                   state["stages"][si][ri]["bn"])
    _conv_to(w, params["conv_out"])
    return w.vals


def dcgan_disc_from_ref(vals, params, state, cfg):
    r = _Reader(vals)
    for si in range(len(cfg["div"])):
        for ri in range(cfg["num_repeats"] + 1):
            _conv_from(r, params["stages"][si][ri]["conv"])
            if cfg["bn"]:
                _bn_from(r, params["stages"][si][ri]["bn"],
                         state["stages"][si][ri]["bn"])
    _conv_from(r, params["conv_out"])
    r.done()


def dcgan_disc_to_ref(params, state, cfg):
    w = _Writer()
    for si in range(len(cfg["div"])):
        for ri in range(cfg["num_repeats"] + 1):
            _conv_to(w, params["stages"][si][ri]["conv"])
            if cfg["bn"]:
                _bn_to(w, params["stages"][si][ri]["bn"],
                       state["stages"][si][ri]["bn"])
    _conv_to(w, params["conv_out"])
    return w.vals


def unet_from_ref(vals, params, state, cfg):
    r = _Reader(vals)
    n_down = cfg["n_down"]
    for i in range(n_down):
        _conv_from(r, params["enc"][i]["conv"])
        _bn_from(r, params["enc"][i]["bn"], state["enc"][i]["bn"])
        for rep in range(cfg["num_repeats"]):
            _conv_from(r, params["enc"][i]["repeats"][rep]["conv"])
            _bn_from(r, params["enc"][i]["repeats"][rep]["bn"],
                     state["enc"][i]["repeats"][rep]["bn"])
    _conv_from(r, params["bottleneck"]["conv"])
    _bn_from(r, params["bottleneck"]["bn"], state["bottleneck"]["bn"])
    for j in range(n_down):
        blk = params["dec"][j]
        if "deconv" in blk:
            _deconv_from(r, blk["deconv"])
        else:  # bilinear upsample (no params) + conv
            _conv_from(r, blk["conv"])
        _bn_from(r, blk["bn"], state["dec"][j]["bn"])
    _deconv_from(r, params["deconv_out"])
    r.done()


def unet_to_ref(params, state, cfg):
    w = _Writer()
    n_down = cfg["n_down"]
    for i in range(n_down):
        _conv_to(w, params["enc"][i]["conv"])
        _bn_to(w, params["enc"][i]["bn"], state["enc"][i]["bn"])
        for rep in range(cfg["num_repeats"]):
            _conv_to(w, params["enc"][i]["repeats"][rep]["conv"])
            _bn_to(w, params["enc"][i]["repeats"][rep]["bn"],
                   state["enc"][i]["repeats"][rep]["bn"])
    _conv_to(w, params["bottleneck"]["conv"])
    _bn_to(w, params["bottleneck"]["bn"], state["bottleneck"]["bn"])
    for j in range(n_down):
        blk = params["dec"][j]
        if "deconv" in blk:
            _deconv_to(w, blk["deconv"])
        else:
            _conv_to(w, blk["conv"])
        _bn_to(w, blk["bn"], state["dec"][j]["bn"])
    _deconv_to(w, params["deconv_out"])
    return w.vals


def patchgan_from_ref(vals, params, state, cfg, bn_rule):
    r = _Reader(vals)
    for idx in range(len(cfg["mul_factor"])):
        for rep in range(cfg["num_repeats"] + 1):
            _conv_from(r, params["blocks"][idx][rep]["conv"])
            if bn_rule(idx):
                _bn_from(r, params["blocks"][idx][rep]["bn"],
                         state["blocks"][idx][rep]["bn"])
    _conv_from(r, params["conv_out"])
    r.done()


def patchgan_to_ref(params, state, cfg, bn_rule):
    w = _Writer()
    for idx in range(len(cfg["mul_factor"])):
        for rep in range(cfg["num_repeats"] + 1):
            _conv_to(w, params["blocks"][idx][rep]["conv"])
            if bn_rule(idx):
                _bn_to(w, params["blocks"][idx][rep]["bn"],
                       state["blocks"][idx][rep]["bn"])
    _conv_to(w, params["conv_out"])
    return w.vals


# --------------------------------------------------------------- top level
def import_into_model(ref_payload, model, patchgan_bn_rule=None):
    """Fill a TwoStageGAN's params/states in place from a reference pickle
    payload.  `patchgan_bn_rule(idx) -> bool` defaults to the p2p disc's
    `bn` config flag on every block (reference `discriminator`)."""
    cfgs = {n: model.nets[n].config for n in model.nets}
    if patchgan_bn_rule is None:
        has_bn = "bn" in model.params["p2p_disc"]["blocks"][0][0]
        patchgan_bn_rule = lambda idx: has_bn
    dcgan_gen_from_ref(ref_payload["dcgan"]["gen"], model.params["dcgan_gen"],
                       model.states["dcgan_gen"], cfgs["dcgan_gen"])
    dcgan_disc_from_ref(ref_payload["dcgan"]["disc"], model.params["dcgan_disc"],
                        model.states["dcgan_disc"], cfgs["dcgan_disc"])
    unet_from_ref(ref_payload["p2p"]["gen"], model.params["p2p_gen"],
                  model.states["p2p_gen"], cfgs["p2p_gen"])
    patchgan_from_ref(ref_payload["p2p"]["disc"], model.params["p2p_disc"],
                      model.states["p2p_disc"], cfgs["p2p_disc"],
                      patchgan_bn_rule)
    return model


def export_from_model(model, patchgan_bn_rule=None):
    """Inverse of import_into_model — produce a reference-format payload."""
    cfgs = {n: model.nets[n].config for n in model.nets}
    if patchgan_bn_rule is None:
        has_bn = "bn" in model.params["p2p_disc"]["blocks"][0][0]
        patchgan_bn_rule = lambda idx: has_bn
    import jax

    P = jax.tree.map(np.asarray, model.params)
    S = jax.tree.map(np.asarray, model.states)
    return {
        "dcgan": {
            "gen": dcgan_gen_to_ref(P["dcgan_gen"], S["dcgan_gen"], cfgs["dcgan_gen"]),
            "disc": dcgan_disc_to_ref(P["dcgan_disc"], S["dcgan_disc"], cfgs["dcgan_disc"]),
        },
        "p2p": {
            "gen": unet_to_ref(P["p2p_gen"], S["p2p_gen"], cfgs["p2p_gen"]),
            "disc": patchgan_to_ref(P["p2p_disc"], S["p2p_disc"], cfgs["p2p_disc"],
                                    patchgan_bn_rule),
        },
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref_model", help="reference gzip-pickle checkpoint")
    ap.add_argument("out_model", help="terrain_tpu checkpoint to write")
    ap.add_argument("--experiment", default="test1_nobn_bilin_both")
    args = ap.parse_args()
    from terrain_tpu.experiments import _build_test1
    from terrain_tpu.train import checkpoint as ckpt

    bilin = "bilin" in args.experiment
    model = _build_test1(train_mode="both", p2p_bilinear=bilin, verbose=False)
    with gzip.open(args.ref_model, "rb") as f:
        payload = pickle.load(f, encoding="latin1")  # py2 pickle
    import_into_model(payload, model)
    ckpt.save_model(args.out_model, model.params, model.states)
    print(f"imported {args.ref_model} -> {args.out_model}")


if __name__ == "__main__":
    main()
