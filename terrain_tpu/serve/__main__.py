"""CLI: `python -m terrain_tpu.serve <experiment> [checkpoint] [options]`.

Builds the named experiment's model (same registry as the training CLI),
loads the checkpoint (default: latest in the experiment's model dir), and
serves it.  Options:

  --host H        bind address (default 127.0.0.1)
  --port P        port (default 7642; 0 = ephemeral)
  --max-batch N   device batch ceiling / bucket cap (default 8)
  --wait-ms W     micro-batch coalescing window (default 2.0)
  --no-weights    serve the randomly initialized model (smoke/benchmark)
  --png-level N   zlib effort for "enc": "png" responses (default 3)
"""

import argparse
import os

import jax

# TERRAIN_PLATFORM=cpu forces the backend (same contract as cli.py:24 —
# sitecustomize pins jax_platforms at interpreter start, so the JAX_PLATFORMS
# env var is silently ignored by the time this module runs)
if os.environ.get("TERRAIN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TERRAIN_PLATFORM"])

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m terrain_tpu.serve",
        description="Serve a trained two-stage terrain GAN over TCP.")
    ap.add_argument("experiment")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7642)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--wait-ms", type=float, default=2.0)
    ap.add_argument("--no-weights", action="store_true")
    ap.add_argument("--png-level", type=int, default=3)
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the full-bucket graphs before serving")
    args = ap.parse_args(argv)

    from terrain_tpu.experiments import EXPERIMENTS, _resolve_model, build_model
    from terrain_tpu.serve import TerrainServer

    if args.experiment not in EXPERIMENTS:
        ap.error(f"unknown experiment {args.experiment!r}; "
                 f"one of: {', '.join(sorted(EXPERIMENTS))}")
    model, name = build_model(args.experiment)
    if not args.no_weights:
        model_dir = os.path.join(
            os.environ.get("TERRAIN_MODELS", "models"), name)
        path = args.checkpoint or _resolve_model(model_dir, None)
        print(f"loading weights: {path}")
        model.load_model(path)
    server = TerrainServer(model, args.host, args.port,
                           max_batch=args.max_batch, wait_ms=args.wait_ms,
                           png_level=args.png_level)
    if args.warmup:
        server.warmup(verbose=True)
    print(f"serving {args.experiment} on {server.host}:{server.port} "
          f"(max_batch={args.max_batch})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
