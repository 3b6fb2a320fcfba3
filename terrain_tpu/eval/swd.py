"""Sample-quality metrics without pretrained networks.

The reference publishes no quantitative quality metric (qualitative README
grids only, SURVEY.md §6); the north star asks for sample-quality parity.
This container has no egress, so FID's pretrained InceptionV3 is
unavailable — instead we ship the Sliced Wasserstein Distance over a
Laplacian pyramid of patch descriptors (the ProGAN evaluation protocol,
Karras et al. 2018): resolution-localized, weight-free, and sensitive to
both texture statistics and structure.  Lower is better; identical
distributions give ~0.

Pure JAX; jit-compiled; runs on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _downsample2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h // 2, w // 2, c), method="bilinear")


def _upsample2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def laplacian_pyramid(x, n_levels):
    """List of n_levels band-pass images + the final low-pass residual."""
    levels = []
    cur = x
    for _ in range(n_levels):
        down = _downsample2x(cur)
        levels.append(cur - _upsample2x(down))
        cur = down
    levels.append(cur)
    return levels


def extract_patches(x, key, patch=7, n_per_img=64):
    """Random patch descriptors, channel-normalized: (N*n, patch*patch*C)."""
    n, h, w, c = x.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (n, n_per_img), 0, h - patch + 1)
    xs = jax.random.randint(kx, (n, n_per_img), 0, w - patch + 1)

    def per_img(img, ys, xs):
        def one(y, x0):
            return jax.lax.dynamic_slice(img, (y, x0, 0), (patch, patch, c))
        return jax.vmap(one)(ys, xs)

    patches = jax.vmap(per_img)(x, ys, xs)  # (N, n, p, p, c)
    d = patches.reshape(-1, patch * patch * c)
    mu = d.mean(axis=0, keepdims=True)
    sd = d.std(axis=0, keepdims=True) + 1e-8
    return (d - mu) / sd


def sliced_wasserstein(a, b, key, n_proj=128):
    """SWD between two point sets (n, d) via random 1-D projections."""
    d = a.shape[1]
    proj = jax.random.normal(key, (d, n_proj))
    proj = proj / (jnp.linalg.norm(proj, axis=0, keepdims=True) + 1e-8)
    pa = jnp.sort(a @ proj, axis=0)
    pb = jnp.sort(b @ proj, axis=0)
    m = min(pa.shape[0], pb.shape[0])
    return jnp.mean(jnp.abs(pa[:m] - pb[:m]))


from functools import partial


@partial(jax.jit, static_argnames=("n_levels", "patch", "n_per_img", "n_proj"))
def _swd_all_levels(real, fake, key, n_levels, patch, n_per_img, n_proj):
    """All pyramid levels in ONE compiled graph.  Unjitted, the ~50 eager
    ops here each cost a device round-trip — on the axon relay runtime that
    made the per-epoch SWD hook ~45 s of wall-clock (measured, round 2);
    jitted it is one dispatch + one fetch."""
    real_p = laplacian_pyramid(real, n_levels)
    fake_p = laplacian_pyramid(fake, n_levels)
    vals = []
    for r, f in zip(real_p, fake_p):
        k1, k2, key = jax.random.split(key, 3)
        pr = extract_patches(r, k1, patch, n_per_img)
        pf = extract_patches(f, k1, patch, n_per_img)
        vals.append(sliced_wasserstein(pr, pf, k2, n_proj))
    return jnp.stack(vals)


def swd_pyramid(real, fake, seed=0, n_levels=3, patch=7, n_per_img=64,
                n_proj=128):
    """Per-level SWD dict + mean.  real/fake: (N, H, W, C) float in the same
    value range (use heightmaps in [0,1] or textures in [-1,1])."""
    key = jax.random.PRNGKey(seed)
    v = np.asarray(_swd_all_levels(
        jnp.asarray(real, jnp.float32), jnp.asarray(fake, jnp.float32),
        key, n_levels, patch, n_per_img, n_proj))
    out = {f"swd_level{lvl}": float(v[lvl]) for lvl in range(v.shape[0])}
    out["swd_mean"] = float(v.mean())
    return out
