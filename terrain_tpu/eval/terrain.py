"""Terrain-domain realism metrics: elevation and slope distribution W1.

The SWD pyramid (eval/swd.py) measures generic image statistics; these two
metrics measure whether generated heightmaps are plausible *terrain* in the
geomorphometry sense the reference's paper discusses qualitatively
(reference README.md sample grids; the reference itself publishes no
quantitative metric, SURVEY.md §6):

* ``elev_w1`` — Wasserstein-1 distance between the real and generated
  elevation distributions.  The elevation CDF is the classical hypsometric
  curve, so this is a hypsometric-mismatch score (e.g. a generator that
  never produces oceans or overshoots peaks scores high).
* ``slope_w1`` — W1 between gradient-magnitude (slope) distributions,
  central differences at unit grid spacing.  Sensitive to over-smoothed or
  noise-rough outputs that elevation statistics alone cannot see.

Both are exact quantile couplings of equal-size samples (sort + mean abs
diff) — no histogram binning to tune.  One jitted program computes both
(eager per-op dispatch costs a relay round-trip each, CLAUDE.md), with a
fixed subsample seed so the per-epoch trend is comparable across epochs.
Lower is better; identical distributions give ~0.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _slope(x):
    """Gradient magnitude via central differences, (N,H,W,C) -> flat."""
    dy = (x[:, 2:, 1:-1, :] - x[:, :-2, 1:-1, :]) * 0.5
    dx = (x[:, 1:-1, 2:, :] - x[:, 1:-1, :-2, :]) * 0.5
    return jnp.sqrt(dx * dx + dy * dy).reshape(-1)


@partial(jax.jit, static_argnames=("n_sample",))
def _terrain_w1(real, fake, key, n_sample):
    def descriptors(x, key):
        elev = x.reshape(-1)
        slope = _slope(x)
        ke, ks = jax.random.split(key)
        ei = jax.random.randint(ke, (n_sample,), 0, elev.shape[0])
        si = jax.random.randint(ks, (n_sample,), 0, slope.shape[0])
        return jnp.sort(elev[ei]), jnp.sort(slope[si])

    # common random indices for both sets (the batches are the same shape):
    # identical distributions score exactly 0 and the coupling variance
    # drops (common-random-numbers), same trick as swd.py's shared patch key
    elev_r, slope_r = descriptors(real, key)
    elev_f, slope_f = descriptors(fake, key)
    return (jnp.mean(jnp.abs(elev_r - elev_f)),
            jnp.mean(jnp.abs(slope_r - slope_f)))


def terrain_stats(real, fake, seed=0, n_sample=65536):
    """Dict of terrain-realism W1 scores for heightmap batches.

    real/fake: (N, H, W, C) float heightmaps in the same value range
    (the pipeline's A-side convention is [0, 1], data/hdf5.py).
    """
    e, s = _terrain_w1(jnp.asarray(real, jnp.float32),
                       jnp.asarray(fake, jnp.float32),
                       jax.random.PRNGKey(seed), n_sample)
    return {"elev_w1": float(e), "slope_w1": float(s)}
