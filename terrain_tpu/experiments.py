"""Named experiments + registry (reference experiments.py:10-131).

The reference dispatches `python experiments.py <name> <mode>` via
locals()[argv[1]](argv[2]) with mode in {train, interp, gen}; we keep the
same names, modes and hyperparameters through an explicit registry (the CLI
lives in terrain_tpu/cli.py).

Runtime knobs come from the environment instead of editing source:
  TERRAIN_DATA       path to the paired h5 (default data/textures_v2_brown500.h5)
  TERRAIN_SYNTHETIC  "1" -> use in-memory synthetic terrain pairs
  TERRAIN_N          synthetic train-set size (default 240, like brown500)
  TERRAIN_EPOCHS     override num_epochs (default 1000, pix2pix.py usage)
  TERRAIN_BS         batch size (default 4, experiments.py:43)
  TERRAIN_QUICK      "1" -> quick_run (1 minibatch per loop, pix2pix.py:198)
  TERRAIN_FAST       "1" -> device-resident dataset (HBM cache) input path
  TERRAIN_DTYPE      "bf16" -> bfloat16 compute (fp32 params/accum)
  TERRAIN_OUT/TERRAIN_MODELS  artifact roots (default output/, models/)
  TERRAIN_DISC_OUT   opt-in stability knob: DCGAN disc final-conv activation
                     (e.g. "linear"; default keeps the reference's rectify —
                     or use the test1_nobn_bilin_both_stable experiment)
  TERRAIN_LR_MULTS   opt-in TTUR lr multipliers, e.g. "dcgan_disc=0.5"
  TERRAIN_PREFETCH   "0" -> disable the background host->device prefetcher
                     that the trainer wraps around host iterators
  TERRAIN_CHECK_NANS "1" -> host-side non-finite loss check per epoch;
                     "2" -> checkify float checks compiled into the step
                     (a NaN raises at the producing op, debug-only cost)
  TERRAIN_DEVICE_DATA "arg" -> pass the HBM-cached dataset to the compiled
                     step as jit arguments (dataset-independent executable)
                     instead of HLO constants; default "const" — the right
                     trade on the axon relay (see data/device_cache.py)
"""

import glob
import os

import numpy as np

from terrain_tpu.data import DeviceDataset, Hdf5Iterator
from terrain_tpu.models import dcgan, p2p
from terrain_tpu.train.trainer import TwoStageGAN

EXPERIMENTS = {}


def experiment(fn):
    EXPERIMENTS[fn.__name__] = fn
    return fn


def _env(name, default=None):
    return os.environ.get(name, default)


def _compute_dtype():
    if _env("TERRAIN_DTYPE", "").lower() in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        return jnp.bfloat16
    return None


def get_iterators(dataset, batch_size, is_a_grayscale, is_b_grayscale, da=True):
    """Host-iterator pair over an h5 file (reference experiments.py:10-18).
    Augmentation (`da`) is applied on device by the trainer, not here."""
    import h5py

    f = h5py.File(dataset, "r")
    it_train = Hdf5Iterator(f["xt"], f["yt"], batch_size,
                            is_a_grayscale=is_a_grayscale,
                            is_b_grayscale=is_b_grayscale)
    it_val = Hdf5Iterator(f["xv"], f["yv"], batch_size,
                          is_a_grayscale=is_a_grayscale,
                          is_b_grayscale=is_b_grayscale)
    return it_train, it_val


def get_device_datasets(dataset, is_a_grayscale, is_b_grayscale):
    """Device-resident dataset pair (TPU-native input path)."""
    import h5py

    with h5py.File(dataset, "r") as f:
        tr = DeviceDataset(f["xt"][:], f["yt"][:], is_a_grayscale, is_b_grayscale)
        va = DeviceDataset(f["xv"][:], f["yv"][:], is_a_grayscale, is_b_grayscale)
    return tr, va


def _shard_hosts(pair):
    """Multi-host: give each process a disjoint slice of every global batch
    (host iterators only; the device-resident path is single-host)."""
    import jax

    if jax.process_count() <= 1:
        return pair
    from terrain_tpu.parallel import HostShardIterator

    return tuple(HostShardIterator(it) for it in pair)


def _get_data(in_shp, is_a_grayscale=True, is_b_grayscale=False):
    """Resolve train/valid inputs from the environment (h5, synthetic,
    on-the-fly raster crops, or device-resident), for any experiment.
    Host-iterator paths are per-host sharded when running multi-process."""
    fast = _env("TERRAIN_FAST") == "1"
    raster = _env("TERRAIN_RASTER")  # "heightmap.png,texture.jpg"
    if raster:
        import imageio.v3 as iio

        from terrain_tpu.data.crops import RasterCropIterator

        hm_path, tex_path = raster.split(",")
        hm = np.asarray(iio.imread(hm_path))
        if hm.ndim == 3:
            hm = hm[..., 0]
        tex = np.asarray(iio.imread(tex_path))[..., :3]
        bs = int(_env("TERRAIN_BS", "4"))
        n = int(_env("TERRAIN_EPOCH_CROPS", "240"))
        tr = RasterCropIterator(hm, tex, bs, crop=in_shp, epoch_size=n, seed=0,
                                is_a_grayscale=is_a_grayscale,
                                is_b_grayscale=is_b_grayscale)
        va = RasterCropIterator(hm, tex, bs, crop=in_shp,
                                epoch_size=max(n // 10, bs), seed=1,
                                is_a_grayscale=is_a_grayscale,
                                is_b_grayscale=is_b_grayscale)
        return _shard_hosts((tr, va))
    if _env("TERRAIN_SYNTHETIC") == "1":
        from terrain_tpu.data.synthetic import make_pairs

        n = int(_env("TERRAIN_N", "240"))
        xt, yt = make_pairs(n, in_shp, seed=0)
        xv, yv = make_pairs(max(n // 10, 4), in_shp, seed=1)
        if fast:
            return (DeviceDataset(xt, yt, is_a_grayscale, is_b_grayscale),
                    DeviceDataset(xv, yv, is_a_grayscale, is_b_grayscale))
        bs = int(_env("TERRAIN_BS", "4"))
        return _shard_hosts(
            (Hdf5Iterator(xt, yt, bs, is_a_grayscale=is_a_grayscale,
                          is_b_grayscale=is_b_grayscale),
             Hdf5Iterator(xv, yv, bs, is_a_grayscale=is_a_grayscale,
                          is_b_grayscale=is_b_grayscale)))
    path = _env("TERRAIN_DATA", "data/textures_v2_brown500.h5")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"dataset {path!r} not found — set TERRAIN_DATA to a paired h5 "
            "(xt/yt/xv/yv, uint8 NHWC; build one with tools/build_dataset.py) "
            "or set TERRAIN_SYNTHETIC=1")
    if fast:
        return get_device_datasets(path, is_a_grayscale, is_b_grayscale)
    bs = int(_env("TERRAIN_BS", "4"))
    return _shard_hosts(get_iterators(path, bs, is_a_grayscale, is_b_grayscale))


def _resolve_model(model_dir, preferred=None, out_dir=None,
                   metric="swd_mean"):
    """Resolve the checkpoint for gen/interp modes.

    Default (TERRAIN_PICK=swd): pick the quality-BEST epoch from the run's
    swd.txt trend — the reference's own publication practice (README.md:48-61
    ships ~e593 of 1000, dump_a_bakup_593ish/), and our 512px trajectories
    show the same late SWD drift (RESULTS_r4.md §2b).  TERRAIN_PICK=name
    restores the previous behavior: the reference's hardcoded checkpoint
    name when present, else the latest epoch.  TERRAIN_PICK=<epoch> loads
    exactly that saved checkpoint (the escape hatch when an external
    target, not the run's own swd, decides the epoch — RESULTS_r5 §5).
    """
    pick = _env("TERRAIN_PICK", "swd")
    if pick.isdigit():
        cand = os.path.join(model_dir, f"{int(pick)}.model")
        if not os.path.exists(cand):
            raise FileNotFoundError(
                f"TERRAIN_PICK={pick}: no {cand}; saved epochs: "
                + ", ".join(sorted(
                    (os.path.basename(p).split(".")[0]
                     for p in glob.glob(os.path.join(model_dir, "*.model"))),
                    key=int)))
        return cand
    if out_dir is not None and pick == "swd":
        from terrain_tpu.train.checkpoint import pick_best_epoch

        pick = pick_best_epoch(out_dir, model_dir, metric=metric)
        if pick is not None:
            path, ckpt_epoch, best_epoch, value = pick
            print(f"[pick] {metric} best @e{best_epoch} ({value:.4f}) -> "
                  f"checkpoint {os.path.basename(path)} "
                  f"(TERRAIN_PICK=name for the reference's fixed name)")
            return path
    if preferred:
        cand = os.path.join(model_dir, preferred)
        if os.path.exists(cand):
            return cand
    models = glob.glob(os.path.join(model_dir, "*.model"))
    if not models:
        raise FileNotFoundError(f"no checkpoints under {model_dir}")
    return max(models, key=lambda p: int(os.path.basename(p).split(".")[0]))


def _out_dir(name):
    """The run's output dir (where the trainer writes swd.txt)."""
    return os.path.join(_env("TERRAIN_OUT", "output"), name)


def _run(model, name, mode, bs):
    out_root = _env("TERRAIN_OUT", "output")
    model_root = _env("TERRAIN_MODELS", "models")
    out_dir = os.path.join(out_root, name)
    model_dir = os.path.join(model_root, name)
    it_train, it_val = _get_data(model.in_shp, model.is_a_grayscale,
                                 model.is_b_grayscale)
    model.train(it_train, it_val, batch_size=bs,
                num_epochs=int(_env("TERRAIN_EPOCHS", "1000")),
                out_dir=out_dir, model_dir=model_dir,
                save_every=int(_env("TERRAIN_SAVE_EVERY", "10")),
                resume=_env("TERRAIN_RESUME", False),
                quick_run=_env("TERRAIN_QUICK") == "1")


def _stability_overrides():
    """Opt-in GAN stability knobs (reference-compatible defaults: both off).

    TERRAIN_DISC_OUT   activation for the DCGAN disc's final conv, replacing
                       the reference's hidden rectify (dcgan.py:50) — e.g.
                       "linear" removes the dead zone that can collapse
                       training (see docs/RESULTS_r1.md).
    TERRAIN_LR_MULTS   TTUR per-net lr multipliers, "net=f,net=f" — e.g.
                       "dcgan_disc=0.5,p2p_disc=0.5".
    """
    disc_kw, lr_mults = {}, None
    v = _env("TERRAIN_DISC_OUT")
    if v:
        disc_kw["conv_out_nonlinearity"] = v
    v = _env("TERRAIN_LR_MULTS")
    if v:
        lr_mults = {}
        for pair in v.split(","):
            name, eq, mult = pair.partition("=")
            if not eq or not name.strip():
                raise ValueError(
                    f"TERRAIN_LR_MULTS entry {pair!r}: expected name=float, "
                    'e.g. "dcgan_disc=0.5,p2p_disc=0.5"')
            lr_mults[name.strip()] = float(mult)
    return disc_kw, lr_mults


def _build_test1(train_mode, p2p_bilinear, verbose=True, disc_out=None):
    """The shared test1 configuration (reference experiments.py:22-119):
    LSGAN, rmsprop lr=1e-4, latent 1000, 512px, DCGAN div [2,2,4,4,8,8,8] /
    [8,4,4,4,2,2,2], U-Net nf=64 (optionally bilinear decoder), PatchGAN
    nf=64 with linear output.

    `disc_out` overrides the DCGAN discriminator's final-conv activation
    (the reference's hidden rectify, dcgan.py:50) — the `_stable` variant
    passes "linear"; the TERRAIN_DISC_OUT env knob still wins if set."""
    disc_kw, lr_mults = _stability_overrides()
    if disc_out is not None:
        disc_kw.setdefault("conv_out_nonlinearity", disc_out)
    return TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"num_repeats": 0, "div": [2, 2, 4, 4, 8, 8, 8]},
        disc_params_dcgan={"num_repeats": 0, "bn": False,
                           "nonlinearity": "linear",
                           "div": [8, 4, 4, 4, 2, 2, 2], **disc_kw},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 64, "act": "tanh", "num_repeats": 0,
                        **({"bilinear_upsample": True} if p2p_bilinear else {})},
        disc_params_p2p={"nf": 64, "bn": False, "num_repeats": 0,
                         "act": "linear", "mul_factor": [1, 2, 4, 8]},
        in_shp=512,
        latent_dim=1000,
        is_a_grayscale=True,
        is_b_grayscale=False,
        lsgan=True,
        opt="rmsprop",
        opt_args={"learning_rate": 1e-4},
        train_mode=train_mode,
        compute_dtype=_compute_dtype(),
        verbose=verbose,
        lr_mults=lr_mults,
    )


def _build_smoke(verbose=True):
    """Tiny 64px two-stage config for CPU smoke runs (see smoke_synthetic)."""
    disc_kw, lr_mults = _stability_overrides()
    return TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 64, "h": 3, "initial_size": 4,
                          "final_size": 64, "div": [2, 2, 4, 4]},
        disc_params_dcgan={"nch": 64, "h": 3, "div": [4, 2, 2, 1], "bn": False,
                           "nonlinearity": "linear", **disc_kw},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 8, "act": "tanh", "bilinear_upsample": True},
        disc_params_p2p={"nf": 8, "bn": False, "act": "linear"},
        in_shp=64,
        latent_dim=32,
        is_a_grayscale=True,
        is_b_grayscale=False,
        lsgan=True,
        opt="rmsprop",
        opt_args={"learning_rate": 1e-4},
        train_mode="both",
        compute_dtype=_compute_dtype(),
        verbose=verbose,
        lr_mults=lr_mults,
    )


def _build_earth256(train_mode="both", verbose=True, disc_out=None):
    """The test1 recipe scaled to 256px — the max resolution the bundled
    NASA rasters support (400x800; reference md/earth_heightmap.png +
    md/earth_texture.jpg).  Identical hyperparameters to _build_test1
    (LSGAN, rmsprop 1e-4, latent 1000, nch=512 DCGAN, nf=64 U-Net with
    bilinear decoder, nf=64 PatchGAN) with one fewer up/down stage:
    DCGAN div [2,2,4,4,8,8] / [8,4,4,4,2,2] (the 512 config's schedule
    minus its last stage), disc nch=256 so the reference's avg-pool-window
    quirk (nch//2^len(div), dcgan.py:52) still yields 4."""
    disc_kw, lr_mults = _stability_overrides()
    if disc_out is not None:
        disc_kw.setdefault("conv_out_nonlinearity", disc_out)
    return TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"num_repeats": 0, "final_size": 256,
                          "div": [2, 2, 4, 4, 8, 8]},
        disc_params_dcgan={"num_repeats": 0, "bn": False, "nch": 256,
                           "nonlinearity": "linear",
                           "div": [8, 4, 4, 4, 2, 2], **disc_kw},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 64, "act": "tanh", "num_repeats": 0,
                        "bilinear_upsample": True},
        disc_params_p2p={"nf": 64, "bn": False, "num_repeats": 0,
                         "act": "linear", "mul_factor": [1, 2, 4, 8]},
        in_shp=256,
        latent_dim=1000,
        is_a_grayscale=True,
        is_b_grayscale=False,
        lsgan=True,
        opt="rmsprop",
        opt_args={"learning_rate": 1e-4},
        train_mode=train_mode,
        compute_dtype=_compute_dtype(),
        verbose=verbose,
        lr_mults=lr_mults,
    )


def _build_earth(verbose=True):
    """128px real-raster demo config (see earth_demo)."""
    disc_kw, lr_mults = _stability_overrides()
    return TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 128, "h": 5, "initial_size": 4,
                          "final_size": 128, "div": [2, 2, 4, 4, 8]},
        disc_params_dcgan={"nch": 128, "h": 5, "div": [8, 4, 4, 2, 2],
                           "bn": False, "nonlinearity": "linear", **disc_kw},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 32, "act": "tanh", "bilinear_upsample": True},
        disc_params_p2p={"nf": 32, "bn": False, "act": "linear"},
        in_shp=128,
        latent_dim=256,
        is_a_grayscale=True,
        is_b_grayscale=False,
        lsgan=True,
        opt="rmsprop",
        opt_args={"learning_rate": 1e-4},
        train_mode="both",
        compute_dtype=_compute_dtype(),
        verbose=verbose,
        lr_mults=lr_mults,
    )


# experiment name -> (model, artifact dir name); used by the serving CLI
# (terrain_tpu/serve/__main__.py) to construct a model without training
_MODEL_BUILDERS = {
    "test1_nobn": lambda v: (
        _build_test1("both", False, verbose=v), "test1_repeatnod_fixp2p_nobn"),
    "test1_nobn_finetunep2p_bilin": lambda v: (
        _build_test1("p2p", True, verbose=v),
        "test1_repeatnod_fixp2p_nobn_finetunep2p_bilin"),
    "test1_nobn_bilin_both": lambda v: (
        _build_test1("both", True, verbose=v), "test1_nobn_bilin_both"),
    "test1_nobn_bilin_both_stable": lambda v: (
        _build_test1("both", True, verbose=v, disc_out="linear"),
        "test1_nobn_bilin_both_stable"),
    "smoke_synthetic": lambda v: (_build_smoke(verbose=v), "smoke_synthetic"),
    "earth_demo": lambda v: (_build_earth(verbose=v), "earth_demo"),
    "earth256": lambda v: (_build_earth256(verbose=v), "earth256"),
    "earth256_stable": lambda v: (
        _build_earth256(verbose=v, disc_out="linear"), "earth256_stable"),
    "earth256_finetunep2p": lambda v: (
        _build_earth256(train_mode="p2p", verbose=v, disc_out="linear"),
        "earth256_finetunep2p"),
}


def build_model(experiment, verbose=True):
    """Construct the (untrained) model + artifact-dir name for a registered
    experiment.  Raises KeyError for unknown names."""
    try:
        builder = _MODEL_BUILDERS[experiment]
    except KeyError:
        raise KeyError(
            f"no model builder for experiment {experiment!r}; one of "
            f"{sorted(_MODEL_BUILDERS)}") from None
    return builder(verbose)


@experiment
def test1_nobn(mode):
    """Reference experiments.py:22-55 (name test1_repeatnod_fixp2p_nobn)."""
    assert mode in ("train", "interp", "gen")
    model = _build_test1(train_mode="both", p2p_bilinear=False)
    name = "test1_repeatnod_fixp2p_nobn"
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name)))
        zs = model.sampler(2, model.latent_dim)
        model.generate_interpolation("/tmp/test.png", zs[0], zs[1], mode="matrix")
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name)))
        model.generate_gz(100, 10, "deleteme")


@experiment
def test1_nobn_finetunep2p_bilin(mode):
    """Reference experiments.py:58-92: freeze the DCGAN (load its weights),
    fine-tune only the p2p stage with a bilinear-upsample decoder."""
    assert mode in ("train", "interp", "gen")
    model = _build_test1(train_mode="p2p", p2p_bilinear=True)
    base = "test1_repeatnod_fixp2p_nobn"
    name = "test1_repeatnod_fixp2p_nobn_finetunep2p_bilin"
    bs = int(_env("TERRAIN_BS", "4"))
    models_root = _env("TERRAIN_MODELS", "models")
    if mode == "train":
        model.load_model(
            _resolve_model(os.path.join(models_root, base), "1000.model",
                           out_dir=_out_dir(base)),
            mode="dcgan")
        _run(model, name, mode, bs)
    elif mode == "interp":
        model.load_model(
            _resolve_model(os.path.join(models_root, base), "1000.model",
                           out_dir=_out_dir(base)),
            mode="dcgan")
        model.load_model(
            _resolve_model(os.path.join(models_root, name), "1000.model",
                           out_dir=_out_dir(name), metric="p2p_swd_mean"),
            mode="p2p")
        out = os.path.join(_env("TERRAIN_OUT", "output"), name,
                           "interp_clip_600_concat_bothdet")
        model.generate_interpolation_clip(100, 4, out, concat=True,
                                          deterministic=True)


@experiment
def test1_nobn_bilin_both(mode):
    """Reference experiments.py:98-125: both stages trained together, p2p
    decoder uses bilinear upsampling.  This is the flagship configuration."""
    assert mode in ("train", "interp", "gen")
    model = _build_test1(train_mode="both", p2p_bilinear=True)
    name = "test1_nobn_bilin_both"
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name)))
        model.generate_gz(100, 10, os.path.join(_env("TERRAIN_OUT", "output"),
                                                name, "gen"))
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name),
                                        metric="both"))
        out = os.path.join(_env("TERRAIN_OUT", "output"), name, "interp_clip")
        model.generate_interpolation_clip(10, 4, out, concat=True)


@experiment
def test1_nobn_bilin_both_stable(mode):
    """The flagship configuration with the one-knob stabilization, shipped
    as a first-class experiment: identical to test1_nobn_bilin_both except
    the DCGAN discriminator's final conv is linear instead of the
    reference's hidden rectify (dcgan.py:50).  That rectify sits *before*
    the global average pool, so if every pre-pool activation goes negative
    the discriminator output is exactly 0 with zero gradient — both LSGAN
    losses pin to 1.0 and stage 1 is dead (observed at ~e41 in the parity
    long run; see docs/RESULTS_r1.md and docs/RESULTS_r2.md).  A linear
    final conv removes the dead region while keeping every other
    hyperparameter at reference values."""
    assert mode in ("train", "interp", "gen")
    model = _build_test1(train_mode="both", p2p_bilinear=True,
                         disc_out="linear")
    name = "test1_nobn_bilin_both_stable"
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name)))
        model.generate_gz(100, 10, os.path.join(_env("TERRAIN_OUT", "output"),
                                                name, "gen"))
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name),
                                        metric="both"))
        out = os.path.join(_env("TERRAIN_OUT", "output"), name, "interp_clip")
        model.generate_interpolation_clip(10, 4, out, concat=True)


@experiment
def smoke_synthetic(mode):
    """Tiny end-to-end smoke config (64px, small nets, synthetic data) for
    fast verification on CPU; exercises the full train/interp/gen surface."""
    assert mode in ("train", "interp", "gen")
    os.environ.setdefault("TERRAIN_SYNTHETIC", "1")
    os.environ.setdefault("TERRAIN_N", "16")
    os.environ.setdefault("TERRAIN_EPOCHS", "2")
    # default save cadence (10) would outlive the 2-epoch run, leaving no
    # checkpoint for this experiment's own gen/interp modes
    os.environ.setdefault("TERRAIN_SAVE_EVERY", "2")
    model = _build_smoke()
    name = "smoke_synthetic"
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "2.model"))
        model.generate_gz(8, 4, os.path.join(_env("TERRAIN_OUT", "output"),
                                             name, "gen"))
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "2.model"))
        out = os.path.join(_env("TERRAIN_OUT", "output"), name, "interp_clip")
        model.generate_interpolation_clip(3, 4, out, concat=True)


def _earth256_impl(mode, disc_out, name):
    assert mode in ("train", "interp", "gen")
    # real-data defaults: the bundled-raster crop h5 (tools/build_dataset.py
    # over reference md/earth_heightmap.png at --crop 256 --stride 16),
    # device-resident, 600 epochs like the reference's published evidence
    os.environ.setdefault("TERRAIN_DATA", "data/earth256.h5")
    os.environ.setdefault("TERRAIN_FAST", "1")
    os.environ.setdefault("TERRAIN_EPOCHS", "600")
    model = _build_earth256(disc_out=disc_out)
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name)))
        model.generate_gz(100, 10, os.path.join(_env("TERRAIN_OUT", "output"),
                                                name, "gen"))
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "600.model",
                                        out_dir=_out_dir(name),
                                        metric="both"))
        out = os.path.join(_env("TERRAIN_OUT", "output"), name, "interp_clip")
        model.generate_interpolation_clip(10, 4, out, concat=True)


@experiment
def earth256(mode):
    """Real-NASA-data run of the test1 recipe at 256px — the closest
    achievable analog of the reference's published 512px real-data result
    (README.md:48-61) given the bundled 400x800 rasters.  Reference-exact
    config (hidden pre-pool rectify kept, dcgan.py:50)."""
    _earth256_impl(mode, disc_out=None, name="earth256")


@experiment
def earth256_stable(mode):
    """earth256 with the one-knob stabilization (linear DCGAN-disc final
    conv; see test1_nobn_bilin_both_stable) — the headline quality config."""
    _earth256_impl(mode, disc_out="linear", name="earth256_stable")


@experiment
def earth256_finetunep2p(mode):
    """The reference's two-phase publication workflow
    (experiments.py:58-92: freeze the DCGAN, fine-tune only the p2p stage,
    then render the latent-interpolation clip) applied to the real-data
    256px recipe: DCGAN weights come from earth256_stable's 600-epoch
    checkpoint."""
    assert mode in ("train", "interp", "gen")
    os.environ.setdefault("TERRAIN_DATA", "data/earth256.h5")
    os.environ.setdefault("TERRAIN_FAST", "1")
    os.environ.setdefault("TERRAIN_EPOCHS", "600")
    model = _build_earth256(train_mode="p2p", disc_out="linear")
    base = "earth256_stable"
    name = "earth256_finetunep2p"
    bs = int(_env("TERRAIN_BS", "4"))
    models_root = _env("TERRAIN_MODELS", "models")
    if mode == "train":
        model.load_model(
            _resolve_model(os.path.join(models_root, base), "600.model",
                           out_dir=_out_dir(base)),
            mode="dcgan")
        _run(model, name, mode, bs)
    elif mode == "interp":
        model.load_model(
            _resolve_model(os.path.join(models_root, base), "600.model",
                           out_dir=_out_dir(base)),
            mode="dcgan")
        model.load_model(
            _resolve_model(os.path.join(models_root, name), "600.model",
                           out_dir=_out_dir(name), metric="p2p_swd_mean"),
            mode="p2p")
        out = os.path.join(_env("TERRAIN_OUT", "output"), name,
                           "interp_clip_concat_bothdet")
        model.generate_interpolation_clip(100, 4, out, concat=True,
                                          deterministic=True)
    elif mode == "gen":
        model.load_model(
            _resolve_model(os.path.join(models_root, base), "600.model",
                           out_dir=_out_dir(base)),
            mode="dcgan")
        model.load_model(
            _resolve_model(os.path.join(models_root, name), "600.model",
                           out_dir=_out_dir(name), metric="p2p_swd_mean"),
            mode="p2p")
        model.generate_gz(100, 10, os.path.join(
            _env("TERRAIN_OUT", "output"), name, "gen"))


@experiment
def earth_demo(mode):
    """Real-terrain demo at 128px: trains on random crops of an actual
    NASA-derived heightmap/texture raster pair via the on-the-fly crop
    pipeline (TERRAIN_RASTER="heightmap.png,texture.jpg"; the reference
    repo bundles downsampled versions of the real rasters as
    md/earth_heightmap.png + md/earth_texture.jpg).  Same recipe as test1
    (LSGAN, rmsprop 1e-4, simultaneous update), scaled to 128px."""
    assert mode in ("train", "interp", "gen")
    model = _build_earth()
    name = "earth_demo"
    bs = int(_env("TERRAIN_BS", "4"))
    model_dir = os.path.join(_env("TERRAIN_MODELS", "models"), name)
    if mode == "train":
        _run(model, name, mode, bs)
    elif mode == "gen":
        model.load_model(_resolve_model(model_dir, "100.model"))
        model.generate_gz(32, 8, os.path.join(_env("TERRAIN_OUT", "output"),
                                              name, "gen"))
    elif mode == "interp":
        model.load_model(_resolve_model(model_dir, "100.model"))
        out = os.path.join(_env("TERRAIN_OUT", "output"), name, "interp_clip")
        model.generate_interpolation_clip(4, 4, out, concat=True)
