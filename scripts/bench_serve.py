"""Serving benchmark on the real chip: requests/s and latency percentiles.

Starts the serve CLI in-process-group (earth_demo config by default — the
128px two-stage model — or the 512px flagship with --experiment), warms up,
then drives it with N closed-loop client threads issuing `generate`
requests (full two-stage z -> heightmap -> texture) and reports throughput
+ p50/p90/p99 latency as a JSON line for docs/RESULTS_r2.md.

Usage: python scripts/bench_serve.py [--experiment earth_demo]
       [--clients 4] [--requests 80] [--port 7655]
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="earth_demo")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=80)
    ap.add_argument("--port", type=int, default=7655)
    ap.add_argument("--texture", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--max-batch", type=int, default=8,
                    help="server bucket cap; fewer buckets = less warmup "
                         "compile time (matters at 512px on the relay)")
    ap.add_argument("--enc", choices=("npy", "png"), default="npy",
                    help="wire encoding: png trades ~25 ms/frame host CPU "
                         "for ~7x fewer response bytes at 512px")
    args = ap.parse_args()

    # server output goes to a FILE, not a pipe: nobody drains a pipe here,
    # and post-mortem of a warmup hang needs the server's own log (the
    # round-4 serve512_png arm died "never became healthy" with zero
    # server-side evidence because stdout went to an undrained PIPE)
    srv_log_path = os.environ.get(
        "TERRAIN_SERVE_LOG",
        f"/tmp/bench_serve_srv_{args.enc}_{os.getpid()}.log")
    srv_log = open(srv_log_path, "w")
    try:
        srv = subprocess.Popen(
            [sys.executable, "-m", "terrain_tpu.serve", args.experiment,
             "--no-weights", "--warmup", "--port", str(args.port),
             "--max-batch", str(args.max_batch)],
            stdout=srv_log, stderr=subprocess.STDOUT, text=True)
    except BaseException:
        srv_log.close()
        raise
    try:
        from terrain_tpu.serve.client import TerrainClient

        # wait for warmup (compiles every bucket size through the relay;
        # TERRAIN_SERVE_HEALTH_S raises the budget on slow-relay days —
        # a cold 512px ladder can exceed the 1200 s default)
        deadline = time.time() + float(
            os.environ.get("TERRAIN_SERVE_HEALTH_S", "1200"))
        while time.time() < deadline:
            if srv.poll() is not None:
                raise RuntimeError(
                    f"server exited rc={srv.returncode} during warmup "
                    f"(see {srv_log_path})")
            try:
                with TerrainClient(port=args.port, timeout=5) as c:
                    if c.health().get("ok"):
                        break
            except OSError:
                time.sleep(2.0)
        else:
            raise RuntimeError(
                f"server never became healthy (see {srv_log_path})")

        lat = []
        lock = threading.Lock()
        per_client = args.requests // args.clients

        def worker(ci):
            with TerrainClient(port=args.port, timeout=600) as c:
                for r in range(per_client):
                    t0 = time.perf_counter()
                    c.generate(1, seed=ci * 10007 + r, texture=args.texture,
                               enc=args.enc)
                    dt = time.perf_counter() - t0
                    with lock:
                        lat.append(dt)

        # measured section (server already warm from health + warmup)
        with TerrainClient(port=args.port, timeout=600) as c:
            c.generate(1, seed=0, texture=args.texture, enc=args.enc)  # e2e warm check
        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat.sort()
        n = len(lat)
        out = {
            "experiment": args.experiment,
            "enc": args.enc,
            "clients": args.clients,
            "requests": n,
            "req_per_s": round(n / wall, 2),
            "p50_ms": round(lat[n // 2] * 1e3, 1),
            "p90_ms": round(lat[int(n * 0.9)] * 1e3, 1),
            "p99_ms": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 1),
        }
        print(json.dumps(out))
        with open("/tmp/bench_serve.json", "w") as f:
            json.dump(out, f)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()
        srv_log.close()


if __name__ == "__main__":
    main()
