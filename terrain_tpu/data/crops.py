"""On-the-fly raster crop pipeline — the north-star input path.

Instead of pre-cutting crops offline into h5 (the reference's notebook
pipeline) the full NASA raster pair stays RAM-resident and each batch is a
set of random 512px windows, rejection-sampled through the ocean filter
(>90% zero heightmap discards the crop — prototype_cropping_code.ipynb
cell 11).  Window gathers and the filter run in native C++
(terrain_tpu/native via data/native.py), normalization and the paired
augmentation stay on device.

Exposes the Hdf5Iterator interface (.N, .next()) so the trainer consumes it
unchanged; `.N` is the nominal epoch size (crops per epoch).
"""

import numpy as np

from terrain_tpu.data import native
from terrain_tpu.data.hdf5 import normalize_pair


class RasterCropIterator:
    """Infinite iterator of random paired crops from one raster pair.

    heightmap: (H, W) or (H, W, 1) uint8; texture: (H, W, 3) uint8.
    Yields normalized float32 NHWC (X, Y) batches.
    """

    def __init__(self, heightmap, texture, bs, crop=512, epoch_size=240,
                 ocean_threshold=0.9, seed=0, is_a_grayscale=True,
                 is_b_grayscale=False, max_tries=64):
        heightmap = np.asarray(heightmap, np.uint8)
        if heightmap.ndim == 2:
            heightmap = heightmap[:, :, None]
        texture = np.asarray(texture, np.uint8)
        assert heightmap.shape[:2] == texture.shape[:2]
        assert heightmap.shape[0] >= crop and heightmap.shape[1] >= crop
        self.hm = heightmap
        self.tex = texture
        self.bs = bs
        self.crop = crop
        self.N = epoch_size
        self.ocean_threshold = ocean_threshold
        self.max_tries = max_tries
        self.is_a_grayscale = is_a_grayscale
        self.is_b_grayscale = is_b_grayscale
        self._rnd = np.random.RandomState(seed)

    def _sample_offsets(self, n):
        h, w = self.hm.shape[0], self.hm.shape[1]
        ys = self._rnd.randint(0, h - self.crop + 1, size=n).astype(np.int64)
        xs = self._rnd.randint(0, w - self.crop + 1, size=n).astype(np.int64)
        return ys, xs

    def next_uint8(self):
        """One batch of accepted crops, uint8: (X (bs,c,c,1), Y (bs,c,c,3))."""
        got_h, got_t = [], []
        need = self.bs
        for _ in range(self.max_tries):
            ys, xs = self._sample_offsets(max(need * 2, 4))
            hms = native.crop_batch_u8(self.hm, ys, xs, self.crop)
            keep = native.zero_fraction(hms) <= self.ocean_threshold
            if keep.any():
                idx = np.nonzero(keep)[0][:need]
                got_h.append(hms[idx])
                got_t.append(native.crop_batch_u8(self.tex, ys[idx], xs[idx],
                                                  self.crop))
                need -= len(idx)
            if need <= 0:
                break
        if need > 0:
            raise RuntimeError(
                f"could not find {self.bs} non-ocean crops in "
                f"{self.max_tries} tries (threshold {self.ocean_threshold})")
        return np.concatenate(got_h), np.concatenate(got_t)

    def __iter__(self):
        return self

    def __next__(self):
        x, y = self.next_uint8()
        return normalize_pair(x, y, self.is_a_grayscale, self.is_b_grayscale)

    next = __next__
