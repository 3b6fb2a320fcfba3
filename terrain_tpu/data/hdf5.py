"""Host-side paired-batch iterator with reference-parity semantics.

Mirrors util.py:10-62 of the reference: an infinite iterator over paired
arrays that (a) builds contiguous batch slices, (b) shuffles the *slice
order* each pass with a np.random.RandomState (seed 0 by default,
util.py:21-26), (c) casts to float32, (d) normalizes grayscale to [0,1]
(x/255) and color to [-1,1] ((x-127.5)/127.5) (util.py:33-35).

Differences from the reference (TPU-first):
  * batches stay NHWC — no NCHW swap;
  * augmentation does NOT happen here: the trainer applies the paired
    random transform on device inside the jitted step (data/augment.py);
  * h5 datasets are staged into host RAM once by default (`cache=True`) —
    the shipped datasets are ~240 MB, and per-step synchronous h5 reads were
    the reference's main input bottleneck (SURVEY.md §6).
"""

import numpy as np


def get_slices(length, bs):
    """Contiguous batch slices, incl. a ragged tail slice (util.py:10-18)."""
    slices = []
    b = 0
    while b * bs < length:
        slices.append(slice(b * bs, (b + 1) * bs))
        b += 1
    return slices


def normalize_pair(x, y, is_a_grayscale, is_b_grayscale, is_uint8=True):
    x = np.asarray(x, dtype=np.float32)
    y = np.asarray(y, dtype=np.float32)
    if is_uint8:
        x = x / 255.0 if is_a_grayscale else (x - 127.5) / 127.5
        y = y / 255.0 if is_b_grayscale else (y - 127.5) / 127.5
    return x, y


class Hdf5Iterator:
    """Infinite (X, Y) float32 NHWC batch iterator (util.py:45-62).

    X, y: h5py datasets or numpy arrays of shape (N, H, W, C), uint8.
    Exposes `.N` (dataset length) and `.next()` like the reference.
    """

    def __init__(self, X, y, bs, imgen=None, is_a_grayscale=True,
                 is_b_grayscale=False, is_uint8=True, seed=0, cache=True):
        assert X.shape[0] == y.shape[0]
        if cache and not isinstance(X, np.ndarray):
            X = X[:]
            y = y[:]
        self._X, self._y = X, y
        self.N = X.shape[0]
        self.bs = bs
        self.is_a_grayscale = is_a_grayscale
        self.is_b_grayscale = is_b_grayscale
        self.is_uint8 = is_uint8
        self.imgen = imgen  # optional host-side (rng, X, Y) -> (X, Y) hook
        self._rnd = np.random.RandomState(seed)
        self._gen = self._iterate()

    def _iterate(self):
        while True:
            slices = get_slices(self.N, self.bs)
            self._rnd.shuffle(slices)
            for sl in slices:
                x, y = normalize_pair(
                    self._X[sl], self._y[sl],
                    self.is_a_grayscale, self.is_b_grayscale, self.is_uint8)
                if self.imgen is not None:
                    seed = self._rnd.randint(0, 100000)
                    x, y = self.imgen(seed, x, y)
                yield x, y

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._gen)

    next = __next__  # reference py2 spelling (util.py:61-62)


def epoch_index_schedule(n, bs, rnd):
    """Index-vector variant of the slice shuffle, for the device-cache path:
    returns a list of int32 index arrays (one per step of an epoch), in the
    same shuffled-contiguous-slice order as Hdf5Iterator.  Ragged tail slices
    are skipped (the reference's train loop runs N // bs steps anyway,
    pix2pix.py:203)."""
    slices = get_slices(n, bs)
    rnd.shuffle(slices)
    out = []
    for sl in slices:
        idx = np.arange(sl.start, min(sl.stop, n), dtype=np.int32)
        if idx.size == bs:
            out.append(idx)
    return out
