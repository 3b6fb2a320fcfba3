"""CLI: `python -m terrain_tpu <experiment> <mode>` with mode in
{train, interp, gen} — the reference's 2-arg interface
(experiments.py:131: locals()[argv[1]](argv[2]))."""

import faulthandler
import os
import signal
import sys

# Hung-run debuggability: the relay can stall a fetch forever (the process
# sleeps on a futex with no Python-level symptom).  `kill -USR1 <pid>`
# dumps every thread's Python stack to stderr so the block site is
# attributable without py-spy/gdb (neither exists in this image).
if hasattr(signal, "SIGUSR1"):  # not on Windows
    faulthandler.register(signal.SIGUSR1, all_threads=True)

# persistent XLA compilation cache (cold compile of the 512px 4-network
# step takes minutes; warm launches take seconds).  The runtime image's
# sitecustomize imports jax at interpreter startup, so env vars are too
# late here — set it through jax.config.
import jax

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
# TERRAIN_PLATFORM=cpu forces the backend.  The JAX_PLATFORMS env var is
# NOT enough here: this image's sitecustomize register() overrides
# jax.config.jax_platforms to "axon,cpu" at interpreter start, so an
# env-level "cpu" is silently ignored and the process hangs at first
# dispatch whenever the TPU relay is down.
if os.environ.get("TERRAIN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TERRAIN_PLATFORM"])

from terrain_tpu.experiments import EXPERIMENTS


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2 or argv[0] not in EXPERIMENTS:
        names = "\n  ".join(sorted(EXPERIMENTS))
        print(f"usage: python -m terrain_tpu <experiment> <train|interp|gen>\n"
              f"experiments:\n  {names}", file=sys.stderr)
        return 2
    name, mode = argv
    if mode not in ("train", "interp", "gen"):
        print(f"unknown mode {mode!r}: must be train, interp or gen",
              file=sys.stderr)
        return 2
    EXPERIMENTS[name](mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
