"""ctypes binding to the native host data-path kernels (terrain_tpu/native),
with transparent NumPy fallbacks.

The native library accelerates the host side of the on-the-fly raster crop
pipeline (data/crops.py): windowed gathers from the 21600x10800 NASA rasters,
uint8->float32 normalization, and the ocean filter.  Build it with
`make -C terrain_tpu/native` (or `python -m terrain_tpu.data.native`).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_DIR, "libterrain_io.so"))
_lib = None


def build(quiet=True):
    """Compile the shared library in-tree; returns True on success."""
    try:
        subprocess.run(["make", "-C", os.path.abspath(_DIR)],
                       check=True, capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build()
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.crop_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        lib.normalize_u8_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int]
        lib.zero_fraction.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int]
        lib.terrain_io_abi_version.restype = ctypes.c_int
        assert lib.terrain_io_abi_version() == 1
        _lib = lib
    else:
        _lib = False
    return _lib


def available():
    return bool(_load())


def _threads():
    return max(os.cpu_count() or 1, 1)


def crop_batch_u8(src, ys, xs, crop):
    """Gather windows: src (H,W,C) uint8, ys/xs (n,) -> (n,crop,crop,C)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    ys = np.ascontiguousarray(ys, dtype=np.int64)
    xs = np.ascontiguousarray(xs, dtype=np.int64)
    n = ys.shape[0]
    assert (ys >= 0).all() and (ys <= h - crop).all()
    assert (xs >= 0).all() and (xs <= w - crop).all()
    out = np.empty((n, crop, crop, c), np.uint8)
    lib = _load()
    if lib:
        lib.crop_batch_u8(src.ctypes.data, h, w, c, ys.ctypes.data,
                          xs.ctypes.data, n, crop, out.ctypes.data, _threads())
    else:
        for i in range(n):
            out[i] = src[ys[i]:ys[i] + crop, xs[i]:xs[i] + crop]
    return out


def normalize_u8_f32(src, gray):
    """uint8 -> float32: x/255 (gray) or (x-127.5)/127.5 (color)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.empty(src.shape, np.float32)
    lib = _load()
    if lib:
        lib.normalize_u8_f32(src.ctypes.data, src.size, int(bool(gray)),
                             out.ctypes.data, _threads())
    else:
        out[...] = (src / 255.0 if gray else (src - 127.5) / 127.5)
    return out


def zero_fraction(crops):
    """Per-crop fraction of zero bytes; crops (n, ...) uint8 -> (n,) f32."""
    crops = np.ascontiguousarray(crops, dtype=np.uint8)
    n = crops.shape[0]
    out = np.empty((n,), np.float32)
    lib = _load()
    if lib:
        lib.zero_fraction(crops.ctypes.data, n, crops.size // max(n, 1),
                          out.ctypes.data, _threads())
    else:
        out[...] = (crops.reshape(n, -1) == 0).mean(axis=1)
    return out


if __name__ == "__main__":
    ok = build(quiet=False)
    print("libterrain_io.so:", "built" if ok else "BUILD FAILED")
