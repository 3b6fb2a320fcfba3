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
_ABI = 2  # bump when extern "C" surface changes (terrain_io.cpp)
_lib = None


def build(quiet=True, force=False):
    """Compile the shared library in-tree; returns True on success."""
    try:
        cmd = ["make", "-C", os.path.abspath(_DIR)]
        if force:
            cmd.insert(1, "-B")
        subprocess.run(cmd, check=True, capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _bind(path):
    lib = ctypes.CDLL(path)
    lib.terrain_io_abi_version.restype = ctypes.c_int
    if lib.terrain_io_abi_version() != _ABI:
        return None
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
    lib.encode_png.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64]
    lib.encode_png.restype = ctypes.c_int64
    return lib


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build()
    lib = None
    if os.path.exists(_LIB_PATH):
        try:
            lib = _bind(_LIB_PATH)
        except OSError:
            lib = None
        if lib is None and build(force=True):
            # Stale binary from an older ABI: `g++ -o` truncates in place
            # (same inode), and the loader caches by (dev, inode) — load
            # the rebuilt library through a fresh temp copy instead.
            import shutil
            import tempfile
            tmp = tempfile.NamedTemporaryFile(
                suffix=".so", delete=False)
            tmp.close()
            shutil.copy2(_LIB_PATH, tmp.name)
            try:
                lib = _bind(tmp.name)
            except OSError:
                lib = None
    _lib = lib if lib is not None else False
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


def encode_png(img, level=3):
    """Encode one image as PNG bytes (native zlib+Paeth; imageio fallback).

    img: (H, W, 1|3) or (H, W) — uint8 (8-bit gray/RGB) or uint16 (16-bit
    gray/RGB, the serve heightmap wire format).  The Python PNG encoders
    cost ~25 ms per 512px frame on this single host core (serve/protocol.py,
    artifact dumps); the native path is zlib-bound (~3-6 ms at level 3).
    """
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[-1] not in (1, 3):
        raise ValueError(f"expected (H, W, 1|3), got shape {arr.shape}")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"expected uint8 or uint16, got {arr.dtype}")
    level = int(level)
    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be in [0, 9], got {level}")
    h, w, c = arr.shape
    lib = _load()
    if lib:
        arr = np.ascontiguousarray(arr)
        raw = h * (1 + w * c * (depth // 8))
        cap = raw + raw // 8 + 4096  # > zlib worst case + chunk framing
        out = np.empty((cap,), np.uint8)
        n = lib.encode_png(arr.ctypes.data, h, w, c, depth, level,
                           out.ctypes.data, cap)
        if n > 0:
            return out[:n].tobytes()
    import imageio.v3 as iio

    return iio.imwrite("<bytes>", np.squeeze(arr, -1) if c == 1 else arr,
                       extension=".png", plugin="pillow",
                       compress_level=level)


if __name__ == "__main__":
    ok = build(quiet=False)
    print("libterrain_io.so:", "built" if ok else "BUILD FAILED")
