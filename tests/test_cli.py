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
