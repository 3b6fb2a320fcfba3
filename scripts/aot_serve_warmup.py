"""Serve bucket-ladder warmup cold-start: time TerrainServer.warmup().

The serving story's cold-start cost is the bucket ladder: warmup()
pre-compiles the deterministic two-stage + atob graphs for every
power-of-two bucket (serve/server.py:101-122), which on the remote-compile
relay costs minutes per 512px program.  With TERRAIN_AOT=<dir> each bucket
loads a serialized executable instead (utils/aot.py AotLazy max_entries
ladder).  One invocation = one fresh process = one honest cold start.

Usage:
  TERRAIN_AOT=store python scripts/aot_serve_warmup.py --xla-cache /tmp/e1
Prints one JSON line: {"aot":..., "build_s":..., "warmup_s":...}.
"""

import argparse
import json
import os
import sys
import time

t_proc = time.perf_counter()

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="test1_nobn_bilin_both_stable")
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--xla-cache", default=None)
    ap.add_argument("--qfetch", default="0",
                    help="TERRAIN_SERVE_QFETCH (0 halves the ladder's "
                         "program count; the A/B cares about relative cost)")
    args = ap.parse_args()
    if args.xla_cache:
        os.makedirs(args.xla_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.xla_cache)
    os.environ["TERRAIN_SERVE_QFETCH"] = args.qfetch

    from terrain_tpu.experiments import build_model
    from terrain_tpu.serve import TerrainServer

    t0 = time.perf_counter()
    model, _ = build_model(args.experiment)
    server = TerrainServer(model, port=0, max_batch=args.max_batch)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    server.warmup(verbose=True)
    t_warm = time.perf_counter() - t0
    # NOT server.shutdown(): ThreadingTCPServer.shutdown() blocks until a
    # running serve_forever() loop acknowledges it, and this script never
    # starts one — close the socket and the batcher workers directly
    server.tcp.server_close()
    server.batcher.shutdown()

    print(json.dumps({
        "aot": bool(os.environ.get("TERRAIN_AOT")),
        "experiment": args.experiment,
        "max_batch": args.max_batch,
        "build_s": round(t_build, 1),
        "warmup_s": round(t_warm, 1),
        "total_s": round(time.perf_counter() - t_proc, 1),
    }))


if __name__ == "__main__":
    main()
