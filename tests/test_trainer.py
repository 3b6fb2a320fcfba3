"""End-to-end trainer tests on tiny configs: full epochs with artifacts,
checkpoint partial restore, device-cache path, samplers, CSV schema."""

import os

import jax
import numpy as np
import pytest

from terrain_tpu.data import DeviceDataset, Hdf5Iterator
from terrain_tpu.data.synthetic import make_pairs
from terrain_tpu.models import dcgan, p2p
from terrain_tpu.train.trainer import TwoStageGAN

IN = 16
LAT = 8


def tiny_model(train_mode="both", **kw):
    return TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 8, "h": 3, "initial_size": 4,
                          "final_size": IN, "div": [2, 2]},
        disc_params_dcgan={"nch": IN, "h": 3, "div": [4, 2], "bn": False,
                           "nonlinearity": "linear"},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 4, "act": "tanh"},
        disc_params_p2p={"nf": 4, "bn": False, "act": "linear"},
        in_shp=IN, latent_dim=LAT,
        is_a_grayscale=True, is_b_grayscale=False,
        lsgan=True, opt="rmsprop", opt_args={"learning_rate": 1e-4},
        train_mode=train_mode, verbose=False, **kw)


def _iters(n=8, bs=4):
    x, y = make_pairs(n, IN, seed=0)
    xv, yv = make_pairs(4, IN, seed=1)
    return (Hdf5Iterator(x, y, bs), Hdf5Iterator(xv, yv, bs))


def test_train_writes_csv_and_artifacts(tmp_path):
    m = tiny_model()
    it_train, it_val = _iters()
    out = str(tmp_path / "out")
    mdl = str(tmp_path / "models")
    m.train(it_train, it_val, batch_size=4, num_epochs=2, out_dir=out,
            model_dir=mdl, save_every=1, quick_run=True)
    lines = open(os.path.join(out, "results.txt")).read().strip().split("\n")
    header = lines[0].split(",")
    assert header == (
        ["epoch"]
        + [f"train_{k}" for k in m.train_keys]
        + [f"valid_{k}" for k in m.train_keys]
        + ["lr", "time", "mode"])
    assert len(lines) == 3  # header + 2 epochs
    row = lines[1].split(",")
    assert row[0] == "1" and row[-1] == "both"
    assert all(np.isfinite(float(v)) for v in row[1:-1])
    # artifacts: epoch grids, atob dumps, dcgan dumps, checkpoints
    assert os.path.exists(os.path.join(out, "out_1.png"))
    assert os.path.exists(os.path.join(out, "dump_train", "0.a.png"))
    assert os.path.exists(os.path.join(out, "dump_valid", "0.b.png"))
    assert os.path.exists(os.path.join(out, "dump_a", "0.png"))
    assert os.path.exists(os.path.join(mdl, "1.model"))
    assert os.path.exists(os.path.join(mdl, "2.model"))


def test_train_device_cache_path(tmp_path):
    m = tiny_model()
    x, y = make_pairs(8, IN, seed=0)
    xv, yv = make_pairs(4, IN, seed=1)
    tr = DeviceDataset(x, y)
    va = DeviceDataset(xv, yv)
    out = str(tmp_path / "out")
    m.train(tr, va, batch_size=4, num_epochs=1, out_dir=out, model_dir=None,
            quick_run=True)
    lines = open(os.path.join(out, "results.txt")).read().strip().split("\n")
    assert len(lines) == 2
    vals = [float(v) for v in lines[1].split(",")[1:-1]]
    assert all(np.isfinite(vals))


def test_checkpoint_partial_restore(tmp_path):
    m = tiny_model()
    path = str(tmp_path / "10.model")
    m.save_model(path)
    m2 = tiny_model()
    # all four nets initialised differently? same seed -> identical; perturb
    m2.params["dcgan_gen"]["dense"]["w"] = m2.params["dcgan_gen"]["dense"]["w"] + 1.0
    m2.params["p2p_gen"]["enc"][0]["conv"]["w"] = (
        m2.params["p2p_gen"]["enc"][0]["conv"]["w"] + 1.0)
    m2.load_model(path, mode="dcgan")
    # dcgan restored to m's values...
    np.testing.assert_allclose(np.asarray(m2.params["dcgan_gen"]["dense"]["w"]),
                               np.asarray(m.params["dcgan_gen"]["dense"]["w"]))
    # ...p2p untouched (still perturbed)
    diff = np.abs(np.asarray(m2.params["p2p_gen"]["enc"][0]["conv"]["w"])
                  - np.asarray(m.params["p2p_gen"]["enc"][0]["conv"]["w"])).max()
    assert diff > 0.5


def test_resume_appends_and_loads(tmp_path):
    m = tiny_model()
    it_train, it_val = _iters()
    out = str(tmp_path / "out")
    mdl = str(tmp_path / "models")
    m.train(it_train, it_val, 4, 1, out, mdl, save_every=1, quick_run=True)
    ckpt = os.path.join(mdl, "1.model")
    m2 = tiny_model()
    m2.train(it_train, it_val, 4, 1, out, mdl, save_every=1, quick_run=True,
             resume=ckpt)
    lines = open(os.path.join(out, "results.txt")).read().strip().split("\n")
    assert len(lines) == 3  # header + epoch + appended epoch (no 2nd header)
    assert lines[2].split(",")[0] == "1"


def test_generate_gz_and_interpolation(tmp_path):
    m = tiny_model()
    d = str(tmp_path / "gz")
    m.generate_gz(num_examples=4, batch_size=2, out_dir=d)
    assert sorted(os.listdir(d)) == ["0.png", "1.png", "2.png", "3.png"]
    grid = str(tmp_path / "interp.png")
    m.generate_interpolation(grid, mode="row")
    assert os.path.exists(grid)
    m.generate_interpolation(str(tmp_path / "interp_mat.png"), mode="matrix")


def test_two_stage_stoch_sampler_splits_rng():
    """Stage-1 and stage-2 stochasticity must be independent inside the
    fused two-stage sampler — the reference ran the stages as separate
    function calls (pix2pix.py:405-408), so their dropout draws were never
    correlated.  The fused program must split the key, not reuse it."""
    from terrain_tpu.sample import make_two_stage_sampler

    m = TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 8, "h": 3, "initial_size": 4,
                          "final_size": IN, "div": [2, 2], "dropout_p": 0.5},
        disc_params_dcgan={"nch": IN, "h": 3, "div": [4, 2], "bn": False,
                           "nonlinearity": "linear"},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 4, "act": "tanh"},
        disc_params_p2p={"nf": 4, "bn": False, "act": "linear"},
        in_shp=IN, latent_dim=LAT,
        is_a_grayscale=True, is_b_grayscale=False,
        lsgan=True, opt="rmsprop", opt_args={"learning_rate": 1e-4},
        train_mode="both", verbose=False)
    _, stoch = make_two_stage_sampler(m.nets["dcgan_gen"], m.nets["p2p_gen"])
    rng = jax.random.PRNGKey(3)
    z = np.random.RandomState(0).rand(2, LAT).astype(np.float32)
    a, b = stoch(m.params["dcgan_gen"], m.states["dcgan_gen"],
                 m.params["p2p_gen"], m.states["p2p_gen"], z, rng)
    # correlated-rng (old bug) reconstruction: both stages fed `rng` raw
    a_raw, _ = m.nets["dcgan_gen"].apply(
        m.params["dcgan_gen"], m.states["dcgan_gen"], z, train=True, rng=rng)
    b_raw, _ = m.nets["p2p_gen"].apply(
        m.params["p2p_gen"], m.states["p2p_gen"], a_raw, train=True, rng=rng)
    assert not np.allclose(np.asarray(a), np.asarray(a_raw))
    assert not np.allclose(np.asarray(b), np.asarray(b_raw))
    # and the fused program must equal the split-key two-call composition
    r1, r2 = jax.random.split(rng)
    a_ref, _ = m.nets["dcgan_gen"].apply(
        m.params["dcgan_gen"], m.states["dcgan_gen"], z, train=True, rng=r1)
    b_ref, _ = m.nets["p2p_gen"].apply(
        m.params["p2p_gen"], m.states["p2p_gen"], a_ref, train=True, rng=r2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref),
                               rtol=1e-5, atol=1e-6)


def test_generate_interpolation_clip_two_stage(tmp_path):
    m = tiny_model()
    d = str(tmp_path / "clip")
    m.generate_interpolation_clip(2, batch_size=5, out_dir=d, concat=True)
    files = sorted(os.listdir(d))
    # 1 pair x 25 coefs // bs 5 -> 5 batches -> 25 frames
    assert len(files) == 25 and files[0] == "concat_0000.png"


def test_generate_atob_dont_predict(tmp_path):
    m = tiny_model()
    it_train, _ = _iters()
    d = str(tmp_path / "atob")
    m.generate_atob(it_train, 1, d, dont_predict=True, batch_size=4)
    assert os.path.exists(os.path.join(d, "3.b.png"))


def test_p2p_mode_trains_without_dcgan_updates(tmp_path):
    m = tiny_model(train_mode="p2p")
    before = np.asarray(m.params["dcgan_gen"]["dense"]["w"]).copy()
    it_train, it_val = _iters()
    m.train(it_train, it_val, 4, 1, str(tmp_path / "o"), None, quick_run=True)
    np.testing.assert_array_equal(
        before, np.asarray(m.params["dcgan_gen"]["dense"]["w"]))


def test_auto_resume_from_latest(tmp_path):
    m = tiny_model()
    it_train, it_val = _iters()
    out = str(tmp_path / "out")
    mdl = str(tmp_path / "models")
    m.train(it_train, it_val, 4, 2, out, mdl, save_every=1, quick_run=True)
    # auto-resume: picks up 2.model and continues from epoch 3
    m2 = tiny_model()
    m2.train(it_train, it_val, 4, 3, out, mdl, save_every=1, quick_run=True,
             resume="auto")
    lines = open(os.path.join(out, "results.txt")).read().strip().split("\n")
    assert lines[-1].split(",")[0] == "3"
    # fresh dir: auto-resume degrades to a fresh run with a header
    m3 = tiny_model()
    out2, mdl2 = str(tmp_path / "o2"), str(tmp_path / "m2")
    m3.train(it_train, it_val, 4, 1, out2, mdl2, save_every=1,
             quick_run=True, resume="auto")
    lines = open(os.path.join(out2, "results.txt")).read().strip().split("\n")
    assert lines[0].startswith("epoch,") and len(lines) == 2


def test_nan_guard(tmp_path, monkeypatch):
    monkeypatch.setenv("TERRAIN_CHECK_NANS", "1")
    m = tiny_model()
    # poison the params so the first step produces NaNs
    import jax.numpy as jnp
    m.params["p2p_gen"]["enc"][0]["conv"]["w"] = (
        m.params["p2p_gen"]["enc"][0]["conv"]["w"] * jnp.nan)
    it_train, it_val = _iters()
    with pytest.raises(FloatingPointError):
        m.train(it_train, it_val, 4, 1, str(tmp_path / "o"), None,
                quick_run=True)


def test_checkify_nan_guard_localizes(tmp_path, monkeypatch):
    """TERRAIN_CHECK_NANS=2 compiles the step under checkify float checks:
    a poisoned parameter raises at the producing op (with a source
    location), not as a non-finite epoch loss."""
    monkeypatch.setenv("TERRAIN_CHECK_NANS", "2")
    import jax.numpy as jnp

    m = tiny_model()
    m.params["p2p_gen"]["enc"][0]["conv"]["w"] = (
        m.params["p2p_gen"]["enc"][0]["conv"]["w"] * jnp.nan)
    it_train, it_val = _iters()
    with pytest.raises(Exception, match="(?i)nan"):
        m.train(it_train, it_val, 4, 1, str(tmp_path / "o"), None,
                quick_run=True)


def test_swd_tracking_hook(tmp_path, monkeypatch):
    monkeypatch.setenv("TERRAIN_SWD", "1")
    m = tiny_model()
    it_train, it_val = _iters()
    out = str(tmp_path / "o")
    m.train(it_train, it_val, 4, 1, out, None, quick_run=True)
    lines = open(os.path.join(out, "swd.txt")).read().strip().split("\n")
    header = lines[0].split(",")
    # both stages get a quality trend: stage-1 heightmap SWD + stage-2
    # texture SWD (real B vs G_p2p(A))
    assert header[0] == "epoch" and "swd_level0" in header
    assert "swd_mean" in header and "p2p_swd_mean" in header
    assert "p2p_swd_level0" in header
    # terrain-domain realism metrics ride the same hook (heightmap stage)
    assert "elev_w1" in header and "slope_w1" in header
    assert lines[1].split(",")[0] == "1"
    assert all(np.isfinite(float(v)) for v in lines[1].split(",")[1:])


def test_swd_p2p_only_mode(tmp_path, monkeypatch):
    monkeypatch.setenv("TERRAIN_SWD", "1")
    m = tiny_model(train_mode="p2p")
    it_train, it_val = _iters()
    out = str(tmp_path / "o")
    m.train(it_train, it_val, 4, 1, out, None, quick_run=True)
    header = open(os.path.join(out, "swd.txt")).readline().strip().split(",")
    assert "p2p_swd_mean" in header and "swd_mean" not in header


def _device_sets(n=8):
    x, y = make_pairs(n, IN, seed=0)
    xv, yv = make_pairs(4, IN, seed=1)
    return DeviceDataset(x, y), DeviceDataset(xv, yv)


def test_exact_resume_matches_uninterrupted(tmp_path):
    """Train 4 epochs straight vs train 2 + exact resume for 2 more: the
    resumed run must land on the same trajectory (params, optimizer
    accumulators, RNG streams) — VERDICT r1 weak#1 / SURVEY.md §5 'params +
    opt state + epoch + RNG key'."""
    np.random.seed(123)
    m = tiny_model()
    tr, va = _device_sets()
    m.train(tr, va, 4, 4, str(tmp_path / "oa"), str(tmp_path / "ma"),
            save_every=2)

    np.random.seed(123)
    m1 = tiny_model()
    tr2, va2 = _device_sets()
    outb, mdlb = str(tmp_path / "ob"), str(tmp_path / "mb")
    m1.train(tr2, va2, 4, 2, outb, mdlb, save_every=2)
    m2 = tiny_model()  # fresh process stand-in: brand-new model object
    m2.train(tr2, va2, 4, 4, outb, mdlb, save_every=2, resume="auto")

    assert m2._step_counter == m._step_counter
    assert m2.lr == m.lr
    for n in m.params:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            m.params[n], m2.params[n])
    for n in m.opt_states:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            m.opt_states[n], m2.opt_states[n])


def test_plain_load_does_not_restore_optimizer(tmp_path):
    """load_model without exact=True keeps the reference semantics: weights
    only, optimizer state re-initialised (the freeze/fine-tune workflow must
    not inherit stale accumulators)."""
    m = tiny_model()
    tr, va = _device_sets()
    m.train(tr, va, 4, 1, str(tmp_path / "o"), str(tmp_path / "m"),
            save_every=1, quick_run=True)
    path = os.path.join(str(tmp_path / "m"), "1.model")
    m2 = tiny_model()
    m2.lr = 0.5
    m2.load_model(path)
    assert m2.lr == 0.5  # untouched
    accu = np.asarray(m2.opt_states["dcgan_gen"]["accu"]["dense"]["w"])
    assert accu.max() == 0.0  # fresh rmsprop accumulator


def test_eval_steps_cap(tmp_path, monkeypatch):
    monkeypatch.setenv("TERRAIN_EVAL_STEPS", "1")
    m = tiny_model()
    it_train, it_val = _iters(n=16, bs=4)  # 4 steps/epoch normally
    calls = {"n": 0}
    orig = m._eval_step

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    m._eval_step = counting
    m.train(it_train, it_val, 4, 1, str(tmp_path / "o"), None)
    assert calls["n"] == 1  # capped, train pass unaffected


def test_fake_network_plumbing(tmp_path):
    """The reference's 1-conv debug nets (p2p.py:314-325) smoke-test the
    trainer plumbing cheaply; adapters map their (is_a, is_b) signatures to
    the factory contract."""
    from terrain_tpu.models.unet import fake_discriminator, fake_generator

    m = TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 8, "h": 3, "initial_size": 4,
                          "final_size": IN, "div": [2, 2]},
        disc_params_dcgan={"nch": IN, "h": 3, "div": [4, 2], "bn": False,
                           "nonlinearity": "linear"},
        gen_fn_p2p=lambda in_shp, a, b, **kw: fake_generator(a, b, in_shp=in_shp, **kw),
        disc_fn_p2p=lambda in_shp, a, b, **kw: fake_discriminator(a, b, in_shp=in_shp, **kw),
        gen_params_p2p={}, disc_params_p2p={},
        in_shp=IN, latent_dim=LAT, is_a_grayscale=True, is_b_grayscale=False,
        lsgan=True, opt="rmsprop", opt_args={"learning_rate": 1e-4},
        train_mode="p2p", verbose=False)
    it_train, it_val = _iters()
    m.train(it_train, it_val, 4, 1, str(tmp_path / "o"), None, quick_run=True)


def test_training_convergence_regression(tmp_path):
    """50 quick steps must cut p2p reconstruction loss by a third — a
    regression catcher for anything that silently breaks the training
    dynamics (gradient routing, optimizer math, normalization)."""
    m = tiny_model()
    x, y = make_pairs(16, IN, seed=0)
    ds = DeviceDataset(x, y)
    tr_step, _ = m._get_cache_steps(ds)
    import jax.numpy as jnp

    first = last = None
    for t in range(50):
        idx = np.arange(t * 4 % 16, t * 4 % 16 + 4, dtype=np.int32) % 16
        Z = m._sample_z(4)
        m.params, m.states, m.opt_states, losses = tr_step(
            m.params, m.states, m.opt_states, ds.batch_args(Z, jnp.asarray(idx)),
            jax.random.PRNGKey(t), jnp.float32(1e-3))
        v = float(losses["p2p_recon"])
        if first is None:
            first = v
        last = v
    assert last < 0.7 * first, f"recon {first:.4f} -> {last:.4f}: no learning"
