"""Real-Mosaic compile check for ops/pallas/conv_thin.py (round-2 lesson:
interpret mode does not model Mosaic — compile-check tiny shapes on the
chip BEFORE any tiling work or in-context A/B).  Runs the smallest
supported regime shape and the two flagship shapes (512px gen output,
earth256 gen output), fwd + grads, fetch-fenced; prints one JSON line.
"""

import json
import os

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

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

from terrain_tpu.ops.pallas import conv_thin as ct


def check(shape, f, grads=True):
    rng = np.random.RandomState(0)
    cin = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, cin, f).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    assert ct.supported(x.shape, w.shape, (1, 1), "same"), (shape, f)

    got = jax.jit(ct.conv_thin)(x, w)
    want = ct._xla_conv(x.astype(jnp.float32), w.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    out = {"fwd_max_err": round(err, 5)}
    assert err < 0.1, err  # bf16 kernel vs f32 reference

    if grads:
        cot = jnp.asarray(rng.randn(*shape[:3], f).astype(np.float32),
                          jnp.bfloat16)

        def loss(x, w):
            return jnp.sum((ct.conv_thin(x, w) * cot).astype(jnp.float32))

        gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)

        def loss_ref(x, w):
            return jnp.sum(ct._xla_conv(x, w) * cot.astype(jnp.float32))

        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(
            x.astype(jnp.float32), w.astype(jnp.float32))
        sw = float(jnp.max(jnp.abs(rw))) or 1.0
        sx = float(jnp.max(jnp.abs(rx))) or 1.0
        ew = float(jnp.max(jnp.abs(gw.astype(jnp.float32) - rw))) / sw
        ex = float(jnp.max(jnp.abs(gx.astype(jnp.float32) - rx))) / sx
        out["dw_rel_err"] = round(ew, 5)
        out["dx_rel_err"] = round(ex, 5)
        assert ew < 0.05 and ex < 0.05, (ew, ex)
    return out


def main():
    res = {"backend": jax.default_backend()}
    res["tiny"] = check((2, 64, 128, 8), 4)
    # flagship: DCGAN gen output phase conv at 512px and earth256
    res["gen_out_512"] = check((4, 256, 256, 32), 4)
    res["gen_out_256"] = check((4, 128, 128, 32), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
