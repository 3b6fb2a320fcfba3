"""Real-Mosaic compile check for ops/pallas/conv_s2.py (round-2 lesson:
interpret mode does not model Mosaic — stack minor-axis, concat lane
offsets, dynamic lane starts and the scoped-VMEM budget all fail only on
chip).  Runs the smallest supported regime shapes (fwd, fwd+leaky, grads)
and one flagship-sized shape, fetch-fenced, and prints one JSON line.
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

from terrain_tpu.ops.pallas import conv_s2 as c2


def check(shape, f, slope=None, grads=True):
    rng = np.random.RandomState(0)
    cin = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, cin, f).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    b = jnp.asarray(rng.randn(f).astype(np.float32), jnp.bfloat16)
    assert c2.supported(x.shape, w.shape, (2, 2), "same"), (shape, f)

    got = jax.jit(lambda *a: c2.conv_s2(*a, slope))(x, w, b)
    want = c2._xla_conv(x.astype(jnp.float32), w.astype(jnp.float32),
                        b.astype(jnp.float32))
    if slope is not None:
        want = jnp.maximum(want, slope * want)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    out = {"fwd_max_err": round(err, 5)}
    assert err < 0.1, err  # bf16 kernel vs f32 reference

    if grads:
        cot = jnp.asarray(
            rng.randn(shape[0], shape[1] // 2, shape[2] // 2, f)
            .astype(np.float32), jnp.bfloat16)

        def loss(x, w, b):
            return jnp.sum((c2.conv_s2(x, w, b, slope) * cot)
                           .astype(jnp.float32))

        gx, gw, gb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, b)

        def loss_ref(x, w, b):
            y = c2._xla_conv(x, w, b)
            if slope is not None:
                y = jnp.maximum(y, slope * y)
            return jnp.sum((y * cot.astype(jnp.float32)))

        rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(
            x.astype(jnp.float32), w.astype(jnp.float32),
            b.astype(jnp.float32))
        scale = float(jnp.max(jnp.abs(rw))) or 1.0
        ew = float(jnp.max(jnp.abs(gw.astype(jnp.float32) - rw))) / scale
        eb = float(jnp.max(jnp.abs(gb.astype(jnp.float32) - rb))) / (
            float(jnp.max(jnp.abs(rb))) or 1.0)
        out["dw_rel_err"] = round(ew, 5)
        out["db_rel_err"] = round(eb, 5)
        assert ew < 0.05 and eb < 0.05, (ew, eb)
    return out


def main():
    res = {"backend": jax.default_backend()}
    res["tiny_cin1"] = check((2, 64, 256, 1), 8)
    res["tiny_cin4_leaky"] = check((2, 64, 256, 4), 8, slope=0.01)
    # flagship shapes: U-Net enc conv1 and PatchGAN conv1
    res["unet_enc1"] = check((4, 512, 512, 1), 64, grads=True)
    res["patchgan1"] = check((8, 512, 512, 4), 64, slope=0.01, grads=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
