"""Offline dataset builder tests (tools/build_dataset.py): the crop slide,
ocean comparator, 90/10 split, and color-similarity subsetting."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from build_dataset import (  # noqa: E402
    build,
    build_subset,
    comparator,
    get_chunks,
    get_idxs_close_to_img,
)


def test_comparator_ocean_filter():
    ocean = np.zeros((64, 64, 1), np.uint8)
    assert not comparator(ocean)
    land = np.full((64, 64, 1), 100, np.uint8)
    assert comparator(land)
    # exactly at the threshold (90% zeros) is kept (cell 11: > 0.9 discards)
    mixed = np.zeros((100, 100, 1), np.uint8)
    mixed[:10] = 1  # 10% nonzero -> frac_black = 0.9
    assert comparator(mixed)


def test_get_chunks_slides_and_filters(rng):
    tex = rng.randint(0, 255, (200, 300, 3)).astype(np.uint8)
    hm = np.zeros((200, 300), np.uint8)
    hm[:, 150:] = rng.randint(1, 255, (200, 150)).astype(np.uint8)
    crops = list(get_chunks(tex, hm, crop_size=100, stride=100))
    # left-half crops are ocean; only windows overlapping land survive
    assert 0 < len(crops) < 6
    for t, h in crops:
        assert t.shape == (100, 100, 3) and h.shape == (100, 100, 1)
        assert comparator(h)


def test_build_writes_reference_layout(tmp_path, rng):
    import h5py
    import imageio.v3 as iio

    hm = rng.randint(1, 255, (200, 200)).astype(np.uint8)
    tex = rng.randint(0, 255, (200, 200, 3)).astype(np.uint8)
    hp, tp = str(tmp_path / "h.png"), str(tmp_path / "t.png")
    iio.imwrite(hp, hm)
    iio.imwrite(tp, tex)
    out = str(tmp_path / "ds.h5")
    build(hp, tp, out, crop_size=64, stride=64)
    with h5py.File(out, "r") as f:
        assert set(f.keys()) == {"xt", "yt", "xv", "yv"}
        assert f["xt"].dtype == np.uint8
        assert f["xt"].shape[1:] == (64, 64, 1)
        assert f["yt"].shape[1:] == (64, 64, 3)
        n = f["xt"].shape[0] + f["xv"].shape[0]
        assert f["xt"].shape[0] == int(n * 0.9)


def test_color_subset_ranking(rng):
    # db of 6 crops: 3 greenish, 3 brownish; ranking vs a brown reference
    green = np.zeros((3, 8, 8, 3), np.uint8)
    green[..., 1] = 200
    brown = np.zeros((3, 8, 8, 3), np.uint8)
    brown[..., 0] = 150
    brown[..., 1] = 100
    db = np.concatenate([green, brown])
    ref = np.zeros((8, 8, 3), np.uint8)
    ref[..., 0] = 150
    ref[..., 1] = 100
    dists, order = get_idxs_close_to_img(ref, db)
    assert set(order[:3].tolist()) == {3, 4, 5}  # brown crops rank first


def test_build_subset_brown500_quirk(tmp_path, rng):
    import h5py

    out_src = str(tmp_path / "src.h5")
    with h5py.File(out_src, "w") as f:
        f.create_dataset("xt", data=rng.randint(0, 255, (10, 8, 8, 1)).astype(np.uint8))
        f.create_dataset("yt", data=rng.randint(0, 255, (10, 8, 8, 3)).astype(np.uint8))
    import imageio.v3 as iio

    ref = str(tmp_path / "ref.png")
    iio.imwrite(ref, rng.randint(0, 255, (8, 8, 3)).astype(np.uint8))
    out = str(tmp_path / "subset.h5")
    build_subset(out_src, ref, out, top_k=4)
    with h5py.File(out, "r") as f:
        # reproduces the brown500 xv == xt quirk (notebook cell 43)
        np.testing.assert_array_equal(f["xt"][:], f["xv"][:])
        assert f["xt"].shape[0] == 4
    out2 = str(tmp_path / "subset_valid.h5")
    build_subset(out_src, ref, out2, top_k=4, valid_split=True)
    with h5py.File(out2, "r") as f:
        assert f["xt"].shape[0] == 3 and f["xv"].shape[0] == 1
