"""Real-Mosaic compile + numerics check for the Pallas max-pool pair.

Round-2 lesson (docs/RESULTS_r2.md): interpret-mode Pallas does NOT model
Mosaic's layout rules — lane-offset stores, minor-most stack axes, and the
scoped-VMEM budget all fail only on chip.  So before any in-context arm,
compile and run ops/pallas/pool2.py on the real chip across the regime of
shapes the flagship step actually uses, checking fwd/bwd against the XLA
reduce-window reference.  Prints ONE JSON line consumed by the chain's
tagit/land pipeline.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from terrain_tpu.ops.pallas import pool2
from terrain_tpu.ops.pool import _reduce_window_max

ok = {}
for shape in [(1, 8, 16, 8), (1, 16, 32, 64), (2, 64, 64, 64),
              (4, 512, 512, 64), (4, 16, 16, 256)]:
    try:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        n, h, w, c = shape
        cot = jnp.ones((n, h // 2, w // 2, c), jnp.bfloat16)
        y = jax.jit(pool2.max_pool2_pallas)(x)
        g = jax.jit(jax.grad(lambda a: jnp.sum(
            (pool2.max_pool2_pallas(a) * cot).astype(jnp.float32))))(x)
        y_ref = _reduce_window_max(x, 2, 2)
        g_ref = jax.grad(lambda a: jnp.sum(
            (_reduce_window_max(a, 2, 2) * cot).astype(jnp.float32)))(x)
        fe = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                   - y_ref.astype(jnp.float32))))
        ge = float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                   - g_ref.astype(jnp.float32))))
        ok[str(shape)] = {"fwd_maxerr": fe, "bwd_maxerr": ge}
    except Exception as e:  # noqa: BLE001
        ok[str(shape)] = {"error": str(e)[:300]}
print(json.dumps({"pool2_check": ok}))
