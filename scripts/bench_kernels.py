"""Real-chip microbenchmarks for the round-2 Pallas kernels.

Validates exactness on hardware (interpret-mode tests only prove semantics)
and measures fetch-fenced wall times vs the XLA paths for:

  1. ops/pallas/conv_stem.py  — the cin=1 5x5 s1 DCGAN-disc stem
     (reference dcgan.py:46-50), fwd + full vjp;
  2. ops/pallas/bilinear_conv.py — the fused bilinear-x2 + conv3x3 U-Net
     decoder stage (reference p2p.py:205-267), fwd, at the flagship's
     actual decoder shapes.

Axon-runtime rule (CLAUDE.md): only value fetches fence; every timing below
ends in a scalar/ndarray fetch.

Usage: python scripts/bench_kernels.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

from terrain_tpu.ops.pallas import bilinear_conv as bc
from terrain_tpu.ops.pallas import conv_stem as cs


def _fence(x):
    return float(jnp.asarray(x).ravel()[0])


def _time(fn, *args, steps=20):
    out = fn(*args)  # compile
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def bench_conv_stem(steps, dtype):
    print(f"== conv_stem (5x5 s1 cin=1), dtype={dtype} ==")
    rows = []
    for (n, h, w, f) in [(4, 512, 512, 64), (8, 512, 512, 64)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, h, w, 1), dtype)
        wt = (jax.random.normal(jax.random.PRNGKey(1), (5, 5, 1, f),
                                jnp.float32) * 0.05).astype(dtype)
        b = jnp.zeros((f,), dtype)

        pall = jax.jit(cs.conv_stem)
        xla = jax.jit(lambda x, w, b: cs._xla_conv(x, w, b))

        y_p = pall(x, wt, b)
        y_x = xla(x, wt, b)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                    - y_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_x.astype(jnp.float32)))) or 1.0
        t_p = _time(pall, x, wt, b, steps=steps)
        t_x = _time(xla, x, wt, b, steps=steps)

        # full vjp (fwd + dX + dW + db)
        def loss_p(x, w, b):
            return jnp.sum(cs.conv_stem(x, w, b).astype(jnp.float32))

        def loss_x(x, w, b):
            return jnp.sum(cs._xla_conv(x, w, b).astype(jnp.float32))

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        gpv = gp(x, wt, b)
        gxv = gx(x, wt, b)
        gerr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b2.astype(jnp.float32))))
                   for a, b2 in zip(gpv, gxv))
        tg_p = _time(lambda *a: gp(*a)[1], x, wt, b, steps=steps)
        tg_x = _time(lambda *a: gx(*a)[1], x, wt, b, steps=steps)
        row = dict(shape=[n, h, w, f], fwd_rel_err=err / scale,
                   grad_abs_err=gerr, fwd_ms_pallas=round(t_p, 2),
                   fwd_ms_xla=round(t_x, 2), vjp_ms_pallas=round(tg_p, 2),
                   vjp_ms_xla=round(tg_x, 2),
                   fwd_speedup=round(t_x / t_p, 2),
                   vjp_speedup=round(tg_x / tg_p, 2))
        rows.append(row)
        print(json.dumps(row))
    return rows


FLAGSHIP_DECODER_SHAPES = [
    # (spatial, cin, cout) for the U-Net 512 decoder stages that pass the
    # MIN_SPATIAL=32 regime gate (stage input spatial = 2^j, j=5,6,7);
    # cin = concat(dec_out, skip) of the PREVIOUS stage.
    (32, 1024, 256),
    (64, 512, 128),
    (128, 256, 64),
]


def bench_bilinear_conv(steps, dtype):
    print(f"== bilinear2x_conv3x3 (fused decoder), dtype={dtype} ==")
    rows = []
    for (s, cin, cout) in FLAGSHIP_DECODER_SHAPES:
        if not bc.supported((4, s, s, cin), (3, 3, cin, cout)):
            print(f"   skip {s}x{s} c{cin}->{cout}: off-regime")
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (4, s, s, cin), dtype)
        wt = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                                jnp.float32) * 0.02).astype(dtype)
        b = jnp.zeros((cout,), jnp.float32)

        pall = jax.jit(bc.bilinear2x_conv3x3_pallas)
        xla = jax.jit(lambda x, w, b: bc._xla_composite(x, w, b).astype(x.dtype))

        y_p = pall(x, wt, b)
        y_x = xla(x, wt, b)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                    - y_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_x.astype(jnp.float32)))) or 1.0
        t_p = _time(pall, x, wt, b, steps=steps)
        t_x = _time(xla, x, wt, b, steps=steps)
        row = dict(shape=[4, s, s, cin], cout=cout, rel_err=err / scale,
                   fwd_ms_pallas=round(t_p, 2), fwd_ms_xla=round(t_x, 2),
                   fwd_speedup=round(t_x / t_p, 2))
        rows.append(row)
        print(json.dumps(row))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    out = {}
    for name, fn in [("bilinear_conv", bench_bilinear_conv),
                     ("conv_stem", bench_conv_stem)]:
        try:
            out[name] = fn(args.steps, dtype)
        except Exception as e:  # real-Mosaic compile failures land here
            print(f"!! {name} FAILED: {type(e).__name__}: {str(e)[:500]}")
            out[name] = {"error": str(e)[:2000]}
    with open("/tmp/bench_kernels.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /tmp/bench_kernels.json")


if __name__ == "__main__":
    main()
