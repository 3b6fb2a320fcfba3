"""Real-Mosaic compile check for TERRAIN_ACT_BWD=1 — the leaky-backward
select fused into the Pallas dW kernels (conv_stem + conv_s2), which adds
a second blocked (1, TH, W, F) VMEM input to each dW kernel.  The VMEM
budget is the risk (stem dW at TH=16 already runs near the in-step scoped
limit; round-2 lesson: interpret mode does not model Mosaic).  Runs tiny
regime shapes first, then the flagship ones, fetch-fenced, and prints one
JSON line.
"""

import json
import os

os.environ.setdefault("TERRAIN_DTYPE", "bf16")
os.environ["TERRAIN_ACT_BWD"] = "1"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

from terrain_tpu.ops.pallas import conv_s2 as c2
from terrain_tpu.ops.pallas import conv_stem as cs


def _grad_check(conv, xla_ref, x, w, b, slope, cot):
    """max rel-err of (dx, dw, db) for the fused-bwd kernel vs f32 XLA."""
    def loss(x, w, b):
        return jnp.sum((conv(x, w, b, slope) * cot).astype(jnp.float32))

    gx, gw, gb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, b)

    def loss_ref(x, w, b):
        y = xla_ref(x, w, b)
        y = jnp.maximum(y, slope * y)
        return jnp.sum(y * cot.astype(jnp.float32))

    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(
        x.astype(jnp.float32), w.astype(jnp.float32), b.astype(jnp.float32))
    out = {}
    for name, g, r in (("dx", gx, rx), ("dw", gw, rw), ("db", gb, rb)):
        scale = float(jnp.max(jnp.abs(r))) or 1.0
        err = float(jnp.max(jnp.abs(g.astype(jnp.float32) - r))) / scale
        out[f"{name}_rel_err"] = round(err, 5)
        assert err < 0.05, (name, err)
    return out


def check_stem(shape, f, slope=0.2):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(5, 5, 1, f).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    b = jnp.asarray(rng.randn(f).astype(np.float32), jnp.bfloat16)
    assert cs.supported(x.shape, w.shape, (1, 1), "same", backend="tpu"), \
        (shape, f)
    cot = jnp.asarray(
        rng.randn(shape[0], shape[1], shape[2], f).astype(np.float32),
        jnp.bfloat16)

    def xla_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    return _grad_check(cs.conv_stem, xla_ref, x, w, b, slope, cot)


def check_s2(shape, f, slope=0.01):
    rng = np.random.RandomState(0)
    cin = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, cin, f).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    b = jnp.asarray(rng.randn(f).astype(np.float32), jnp.bfloat16)
    assert c2.supported(x.shape, w.shape, (2, 2), "same", backend="tpu"), \
        (shape, f)
    cot = jnp.asarray(
        rng.randn(shape[0], shape[1] // 2, shape[2] // 2, f)
        .astype(np.float32), jnp.bfloat16)

    def xla_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    return _grad_check(c2.conv_s2, xla_ref, x, w, b, slope, cot)


def main():
    res = {"backend": jax.default_backend()}
    res["stem_tiny"] = check_stem((1, 256, 256, 1), 8)
    res["stem_flagship"] = check_stem((4, 512, 512, 1), 64)  # VMEM stressor
    res["s2_tiny"] = check_s2((2, 64, 256, 4), 8)
    res["s2_patchgan"] = check_s2((8, 512, 512, 4), 64)
    print(json.dumps(res))


if __name__ == "__main__":
    main()


