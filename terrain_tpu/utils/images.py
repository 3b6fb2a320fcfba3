"""Image post-processing + grid plotting (reference util.py:69-116,
image_grid.py:6-29), adapted to NHWC.

The normalization asymmetry is undone here exactly like the reference:
grayscale lives in [0,1] (sigmoid / x/255), color in [-1,1] (tanh /
(x-127.5)/127.5) — convert_to_rgb maps both to [0,1] RGB (util.py:69-84).
"""

import os

import numpy as np


def convert_to_rgb(img, is_grayscale=False):
    """(H, W, C) float -> (H, W, 3) float in [0, 1] (util.py:69-84)."""
    img = np.asarray(img)
    if img.ndim != 3:
        raise ValueError(f"image must be HWC, got shape {img.shape}")
    ch = img.shape[-1]
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}, must be 1 or 3")
    out = np.repeat(img, 3, axis=-1) if ch == 1 else img
    if not is_grayscale:
        out = (out * 127.5 + 127.5) / 255.0
    return np.clip(out, 0.0, 1.0)


def compose_imgs(a, b, is_a_grayscale=True, is_b_grayscale=False):
    """Place A and B side by side (util.py:87-99)."""
    ap = convert_to_rgb(a, is_grayscale=is_a_grayscale)
    bp = convert_to_rgb(b, is_grayscale=is_b_grayscale)
    if ap.shape != bp.shape:
        raise ValueError(f"A and B must match: {ap.shape} != {bp.shape}")
    h, w, c = ap.shape
    out = np.zeros((h, 2 * w, c), ap.dtype)
    out[:, :w] = ap
    out[:, w:] = bp
    return out


def save_png(path, img01):
    """Save a float [0,1] (H, W, 3) image as PNG.

    Goes through the native C++ encoder (data/native.py encode_png) —
    the Python encoders cost ~25 ms per 512px frame on this single-core
    host and artifact epochs write dozens of frames.
    """
    from terrain_tpu.data.native import encode_png

    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(encode_png(arr))


def to_u8_device(x, is_grayscale, scale=1):
    """Quantize a float device image batch to uint8 ON DEVICE — the
    convert_to_rgb + save_png math fused in-graph, run BEFORE the host
    fetch.  On the axon relay runtime, image fetch bandwidth dominates
    artifact epochs; uint8 is 4x smaller than fp32 and grayscale stays
    1-channel (the host repeats to RGB at write time).  Bit-identical to
    convert_to_rgb -> save_png: color maps [-1,1] -> [0,1] via (x+1)/2
    (= (x*127.5+127.5)/255), then floor(v*255 + 0.5) clipped to [0,255].

    scale > 1 box-averages scale x scale blocks on device first (a
    downscaled *preview*, scale^2 fewer fetched bytes — the per-epoch
    artifact knob TERRAIN_ARTIFACT_SCALE, docs/ROADMAP.md item 2); no-op
    unless both spatial dims divide by it."""
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    s = int(scale)
    if s > 1 and x.ndim == 4 and x.shape[1] % s == 0 and x.shape[2] % s == 0:
        n, h, w, c = x.shape
        x = x.reshape(n, h // s, s, w // s, s, c).mean(axis=(2, 4))
    if not is_grayscale:
        x = x * 0.5 + 0.5
    return jnp.clip(jnp.floor(x * 255.0 + 0.5), 0, 255).astype(jnp.uint8)


def save_png_u8(path, img_u8):
    """Save a uint8 (H, W, 1|3) image (from `to_u8_device`) as PNG.

    1-channel input is written as grayscale PNG directly (viewers render
    it identically to the repeated-RGB form and it is 3x fewer bytes to
    filter/deflate on this single-core host)."""
    from terrain_tpu.data.native import encode_png

    with open(path, "wb") as f:
        f.write(encode_png(np.asarray(img_u8)))


def plot_grid(out_filename, itr, out_fn, is_a_grayscale, is_b_grayscale, N=4):
    """NxN grid of [A, f(A)] pairs pulled from an iterator (util.py:101-116)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 6))
    for i in range(N * N):
        a, b = next(itr)
        bp = out_fn(a) if out_fn is not None else b
        img = compose_imgs(np.asarray(a[0]), np.asarray(bp[0]),
                           is_a_grayscale=is_a_grayscale,
                           is_b_grayscale=is_b_grayscale)
        plt.subplot(N, N, i + 1)
        plt.imshow(img)
        plt.axis("off")
    plt.savefig(out_filename)
    plt.clf()
    plt.close("all")


def write_image_grid(filepath, imgs, figsize=None, cmap="gray"):
    """(n, m, H, W, C) tensor -> PNG grid (reference image_grid.py:6-29)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import gridspec
    from matplotlib import pyplot as plt

    directory = os.path.dirname(os.path.abspath(filepath))
    os.makedirs(directory, exist_ok=True)
    n, m = imgs.shape[0], imgs.shape[1]
    fig = plt.figure(figsize=figsize or (n, m))
    gs1 = gridspec.GridSpec(n, m)
    gs1.update(wspace=0.025, hspace=0.025)
    for i in range(n):
        for j in range(m):
            ax = plt.subplot(gs1[i, j])
            ax.imshow(imgs[i, j], cmap=cmap)
            ax.axis("off")
    fig.savefig(filepath)
    plt.close(fig)
