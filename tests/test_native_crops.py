"""Native host data-path kernels + on-the-fly raster crop pipeline."""

import numpy as np
import pytest

from terrain_tpu.data import native
from terrain_tpu.data.crops import RasterCropIterator


def test_native_crop_matches_numpy(rng):
    raster = rng.randint(0, 255, size=(300, 400, 3)).astype(np.uint8)
    ys = rng.randint(0, 300 - 64, 8).astype(np.int64)
    xs = rng.randint(0, 400 - 64, 8).astype(np.int64)
    got = native.crop_batch_u8(raster, ys, xs, 64)
    want = np.stack([raster[y:y + 64, x:x + 64] for y, x in zip(ys, xs)])
    np.testing.assert_array_equal(got, want)


def test_native_crop_rejects_out_of_range(rng):
    raster = rng.randint(0, 255, size=(100, 100, 1)).astype(np.uint8)
    with pytest.raises(AssertionError):
        native.crop_batch_u8(raster, np.array([50]), np.array([0]), 64)


def test_native_normalize(rng):
    x = rng.randint(0, 255, size=(2, 8, 8, 3)).astype(np.uint8)
    np.testing.assert_allclose(native.normalize_u8_f32(x, True), x / 255.0,
                               rtol=1e-6)
    np.testing.assert_allclose(native.normalize_u8_f32(x, False),
                               (x - 127.5) / 127.5, rtol=1e-5, atol=1e-6)


def test_native_zero_fraction(rng):
    x = (rng.rand(4, 16, 16, 1) > 0.7).astype(np.uint8)
    got = native.zero_fraction(x)
    want = (x.reshape(4, -1) == 0).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("shape,dtype", [
    ((64, 48, 1), np.uint8),     # 8-bit grayscale (artifact dumps)
    ((33, 57, 3), np.uint8),     # 8-bit RGB (texture dumps; odd dims)
    ((40, 40, 1), np.uint16),    # 16-bit grayscale (serve heightmap wire)
])
def test_encode_png_roundtrip(rng, shape, dtype):
    import imageio.v3 as iio

    hi = np.iinfo(dtype).max + 1
    img = rng.randint(0, hi, size=shape).astype(dtype)
    data = native.encode_png(img, level=3)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = iio.imread(data, extension=".png")
    want = img[:, :, 0] if shape[-1] == 1 else img
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, want)


def test_encode_png_2d_and_level_sizes(rng):
    import imageio.v3 as iio

    img = (rng.rand(32, 32) * 255).astype(np.uint8)  # smooth-ish field
    d0 = native.encode_png(img, level=0)
    d9 = native.encode_png(img, level=9)
    assert len(d9) <= len(d0)
    np.testing.assert_array_equal(iio.imread(d9, extension=".png"), img)


def test_encode_png_rejects_bad_args(rng):
    with pytest.raises(ValueError):
        native.encode_png(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        native.encode_png(np.zeros((4, 4, 1), np.float32))
    with pytest.raises(ValueError):
        native.encode_png(np.zeros((4, 4, 1), np.uint8), level=10)


def test_raster_iterator_applies_ocean_filter(rng):
    # left half ocean (zeros); crops must all come from the right half
    hm = np.zeros((600, 600), np.uint8)
    hm[:, 300:] = rng.randint(1, 255, size=(600, 300)).astype(np.uint8)
    tex = rng.randint(0, 255, size=(600, 600, 3)).astype(np.uint8)
    it = RasterCropIterator(hm, tex, bs=4, crop=128, epoch_size=8, seed=0)
    X, Y = next(it)
    assert X.shape == (4, 128, 128, 1) and Y.shape == (4, 128, 128, 3)
    assert X.dtype == np.float32
    # every accepted crop must pass the comparator (<= 90% zeros)
    frac_zero = (X == 0).reshape(4, -1).mean(axis=1)
    assert (frac_zero <= 0.9).all()
    assert 0.0 <= X.min() and X.max() <= 1.0
    assert -1.0 <= Y.min() and Y.max() <= 1.0


def test_raster_iterator_all_ocean_raises():
    hm = np.zeros((300, 300), np.uint8)
    tex = np.zeros((300, 300, 3), np.uint8)
    it = RasterCropIterator(hm, tex, bs=2, crop=64, epoch_size=4, max_tries=3)
    with pytest.raises(RuntimeError):
        next(it)
