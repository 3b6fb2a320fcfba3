"""Fixed-kernel Gaussian blur (NHWC, separable, depthwise).

The reference prototyped a fixed-Gaussian-kernel conv layer for heightmap
smoothing (lasagne/notebooks/gaussian_blur.ipynb, `gkern` + the
BilinearUpsample2DLayer prototype) but never shipped it; here it's a proper
op: two depthwise 1-D convs (separable), symmetric 'same' padding, fp32
kernel generated from sigma.
"""

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel_1d(ksize, sigma):
    """Normalized 1-D Gaussian taps (the notebook's gkern, separably)."""
    assert ksize % 2 == 1, "kernel size must be odd"
    r = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (r / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x, sigma=1.0, ksize=None):
    """Blur (N, H, W, C) with a separable Gaussian; per-channel (depthwise)."""
    if ksize is None:
        ksize = int(2 * np.ceil(3 * sigma) + 1)
    k = gaussian_kernel_1d(ksize, sigma)
    c = x.shape[-1]
    pad = (ksize - 1) // 2
    orig = x.dtype
    xf = x.astype(jnp.float32)
    kv = jnp.asarray(k).reshape(ksize, 1, 1, 1)
    kv = jnp.broadcast_to(kv, (ksize, 1, 1, c))
    kh = kv.reshape(1, ksize, 1, c)
    out = lax.conv_general_dilated(
        xf, kv, (1, 1), ((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = lax.conv_general_dilated(
        out, kh, (1, 1), ((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out.astype(orig)
