"""jit-compiled samplers (reference z_fn/gen_fn/two-stage, pix2pix.py:144-147).

Each builder returns (det_fn, stoch_fn): 'deterministic' means running BN
statistics + dropout off (Lasagne deterministic=True); the stochastic variant
uses batch statistics and live dropout with an explicit rng, matching the
reference's non-deterministic samplers used for per-epoch dumps
(pix2pix.py:269-273).

The two-stage sampler fuses z -> heightmap -> texture into ONE XLA program —
the reference ran two separate compiled functions with a host round-trip
between the stages (pix2pix.py:405-408).
"""

import jax


def make_z_sampler(gd_net):
    det = jax.jit(lambda p, s, z: gd_net.apply(p, s, z, train=False)[0])
    stoch = jax.jit(lambda p, s, z, r: gd_net.apply(p, s, z, train=True, rng=r)[0])
    return det, stoch


def make_atob_sampler(gp_net):
    det = jax.jit(lambda p, s, x: gp_net.apply(p, s, x, train=False)[0])
    stoch = jax.jit(lambda p, s, x, r: gp_net.apply(p, s, x, train=True, rng=r)[0])
    return det, stoch


def make_two_stage_sampler(gd_net, gp_net):
    def _run(pg, sg, pu, su, z, train, rng):
        # The reference runs the two stages as separate compiled functions
        # (pix2pix.py:405-408), so their dropout/noise draws are independent.
        # Split the key so stage-1 and stage-2 stochasticity stays
        # uncorrelated inside the fused program.
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        a, _ = gd_net.apply(pg, sg, z, train=train, rng=r1)
        b, _ = gp_net.apply(pu, su, a, train=train, rng=r2)
        return a, b

    det = jax.jit(lambda pg, sg, pu, su, z: _run(pg, sg, pu, su, z, False, None))
    stoch = jax.jit(lambda pg, sg, pu, su, z, r: _run(pg, sg, pu, su, z, True, r))
    return det, stoch
