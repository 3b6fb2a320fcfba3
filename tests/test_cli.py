"""CLI surface tests (registry + argument handling, no training)."""

import pytest

from terrain_tpu.cli import main
from terrain_tpu.experiments import EXPERIMENTS


def test_registry_has_reference_experiments():
    # the reference's named experiments (experiments.py:22-125)
    for name in ("test1_nobn", "test1_nobn_finetunep2p_bilin",
                 "test1_nobn_bilin_both", "smoke_synthetic"):
        assert name in EXPERIMENTS


def test_usage_errors(capsys):
    assert main([]) == 2
    assert main(["nope", "train"]) == 2
    assert main(["test1_nobn", "frobnicate"]) == 2
    err = capsys.readouterr().err
    assert "usage" in err and "unknown mode" in err


def test_missing_dataset_raises(monkeypatch, tmp_path):
    monkeypatch.delenv("TERRAIN_SYNTHETIC", raising=False)
    monkeypatch.delenv("TERRAIN_RASTER", raising=False)
    monkeypatch.setenv("TERRAIN_DATA", str(tmp_path / "nope.h5"))
    from terrain_tpu.experiments import _get_data

    with pytest.raises(FileNotFoundError, match="TERRAIN_DATA"):
        _get_data(64)


def test_get_data_synthetic_paths(monkeypatch):
    from terrain_tpu.data import DeviceDataset, Hdf5Iterator
    from terrain_tpu.experiments import _get_data

    monkeypatch.setenv("TERRAIN_SYNTHETIC", "1")
    monkeypatch.setenv("TERRAIN_N", "8")
    monkeypatch.delenv("TERRAIN_FAST", raising=False)
    tr, va = _get_data(16)
    assert isinstance(tr, Hdf5Iterator) and tr.N == 8
    monkeypatch.setenv("TERRAIN_FAST", "1")
    tr, va = _get_data(16)
    assert isinstance(tr, DeviceDataset) and tr.N == 8 and va.N >= 4


def test_get_data_raster_path(monkeypatch, tmp_path):
    import imageio.v3 as iio
    import numpy as np

    hm = np.random.RandomState(0).randint(1, 255, (128, 256)).astype(np.uint8)
    tex = np.random.RandomState(1).randint(0, 255, (128, 256, 3)).astype(np.uint8)
    hp, tp = str(tmp_path / "h.png"), str(tmp_path / "t.png")
    iio.imwrite(hp, hm)
    iio.imwrite(tp, tex)
    monkeypatch.delenv("TERRAIN_SYNTHETIC", raising=False)
    monkeypatch.setenv("TERRAIN_RASTER", f"{hp},{tp}")
    monkeypatch.setenv("TERRAIN_BS", "2")
    monkeypatch.setenv("TERRAIN_EPOCH_CROPS", "4")
    from terrain_tpu.experiments import _get_data

    tr, va = _get_data(64)
    X, Y = next(tr)
    assert X.shape == (2, 64, 64, 1) and Y.shape == (2, 64, 64, 3)


def test_stability_overrides_parsing(monkeypatch):
    from terrain_tpu.experiments import _stability_overrides

    monkeypatch.delenv("TERRAIN_DISC_OUT", raising=False)
    monkeypatch.delenv("TERRAIN_LR_MULTS", raising=False)
    assert _stability_overrides() == ({}, None)  # reference defaults
    monkeypatch.setenv("TERRAIN_DISC_OUT", "linear")
    monkeypatch.setenv("TERRAIN_LR_MULTS", "dcgan_disc=0.5, p2p_disc=2")
    disc_kw, lr_mults = _stability_overrides()
    assert disc_kw == {"conv_out_nonlinearity": "linear"}
    assert lr_mults == {"dcgan_disc": 0.5, "p2p_disc": 2.0}


def test_stability_overrides_malformed_lr_mults(monkeypatch):
    from terrain_tpu.experiments import _stability_overrides

    monkeypatch.setenv("TERRAIN_LR_MULTS", "dcgan_disc")
    with pytest.raises(ValueError, match="TERRAIN_LR_MULTS"):
        _stability_overrides()


def _write_run(tmp_path, epochs_metrics, ckpt_epochs, name="run"):
    """Make a fake run: out dir with swd.txt + model dir with empty ckpts."""
    out = tmp_path / "output" / name
    mdl = tmp_path / "models" / name
    out.mkdir(parents=True)
    mdl.mkdir(parents=True)
    hdr = "epoch,swd_mean,p2p_swd_mean"
    rows = [f"{e},{s},{p}" for e, s, p in epochs_metrics]
    (out / "swd.txt").write_text("\n".join([hdr] + rows) + "\n")
    for e in ckpt_epochs:
        (mdl / f"{e}.model").write_bytes(b"")
    return str(out), str(mdl)


def test_pick_best_epoch_snaps_to_nearest_checkpoint(tmp_path):
    from terrain_tpu.train.checkpoint import pick_best_epoch

    out, mdl = _write_run(
        tmp_path,
        [(25, 0.5, 0.9), (50, 0.1, 0.8), (75, 0.3, 0.2)],
        ckpt_epochs=(40, 60, 80))
    # swd_mean best @e50 -> nearest saved is 40/60 tie -> later epoch wins
    path, ce, be, val = pick_best_epoch(out, mdl, metric="swd_mean")
    assert (ce, be) == (60, 50) and abs(val - 0.1) < 1e-9
    # p2p metric best @e75 -> snaps to 80
    path, ce, be, _ = pick_best_epoch(out, mdl, metric="p2p_swd_mean")
    assert (ce, be) == (80, 75)
    # "both" sums the two columns: 1.4, 0.9, 0.5 -> e75
    path, ce, be, val = pick_best_epoch(out, mdl, metric="both")
    assert (ce, be) == (80, 75) and abs(val - 0.5) < 1e-9


def test_pick_best_epoch_resume_dedupe_and_torn_rows(tmp_path):
    from terrain_tpu.train.checkpoint import pick_best_epoch

    out, mdl = _write_run(
        tmp_path, [(25, 0.5, 0.9)], ckpt_epochs=(25, 50))
    with open(f"{out}/swd.txt", "a") as f:
        f.write("50,0.4,0.9\n")
        f.write("25,0.05,0.9\n")      # resume overwrote e25 -> last wins
        f.write("75,0.0\n")           # torn row (killed run) -> skipped
    path, ce, be, val = pick_best_epoch(out, mdl, metric="swd_mean")
    assert (ce, be) == (25, 25) and abs(val - 0.05) < 1e-9


def test_pick_best_epoch_missing_inputs(tmp_path):
    from terrain_tpu.train.checkpoint import pick_best_epoch

    out, mdl = _write_run(tmp_path, [(25, 0.5, 0.9)], ckpt_epochs=())
    assert pick_best_epoch(out, mdl) is None            # no checkpoints
    assert pick_best_epoch(str(tmp_path / "nope"), mdl) is None  # no swd.txt


def test_resolve_model_swd_pick_and_name_fallback(tmp_path, monkeypatch,
                                                  capsys):
    from terrain_tpu.experiments import _resolve_model

    out, mdl = _write_run(
        tmp_path, [(25, 0.5, 0.9), (50, 0.1, 0.8)], ckpt_epochs=(25, 50))
    monkeypatch.delenv("TERRAIN_PICK", raising=False)
    # default: swd-driven pick (the reference published ~e593, not e1000)
    got = _resolve_model(mdl, "25.model", out_dir=out)
    assert got.endswith("50.model")
    assert "[pick]" in capsys.readouterr().out
    # TERRAIN_PICK=name restores the fixed-name behavior
    monkeypatch.setenv("TERRAIN_PICK", "name")
    assert _resolve_model(mdl, "25.model", out_dir=out).endswith("25.model")
    # no out_dir (train-mode base loads keep working) -> name behavior
    monkeypatch.delenv("TERRAIN_PICK", raising=False)
    assert _resolve_model(mdl, "25.model").endswith("25.model")


def test_resolve_model_explicit_epoch(tmp_path, monkeypatch):
    # TERRAIN_PICK=<epoch>: exact saved checkpoint, loud error otherwise
    # (the external-target escape hatch, RESULTS_r5 §5)
    import pytest

    from terrain_tpu.experiments import _resolve_model

    out, mdl = _write_run(
        tmp_path, [(25, 0.5, 0.9), (50, 0.1, 0.8)], ckpt_epochs=(25, 50))
    monkeypatch.setenv("TERRAIN_PICK", "25")
    assert _resolve_model(mdl, "50.model", out_dir=out).endswith("25.model")
    monkeypatch.setenv("TERRAIN_PICK", "75")
    with pytest.raises(FileNotFoundError, match="saved epochs: 25, 50"):
        _resolve_model(mdl, "50.model", out_dir=out)
