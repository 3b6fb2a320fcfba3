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
