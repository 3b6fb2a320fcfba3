"""Generation-throughput benchmark: two-stage z -> heightmap -> texture.

The reference's only sampling path is Theano function calls with a host
round trip between the stages (pix2pix.py:405-408); here the two stages are
ONE fused XLA program (sample/samplers.py).  Two numbers per batch size:

* compute imgs/s — fetch-fenced on a device scalar: the rate the chip can
  synthesize terrain (what DP scaling multiplies);
* delivered imgs/s — each batch quantized to uint8 ON DEVICE and fetched:
  what a host consumer actually receives through the ~2 MB/s relay fetch
  (the serving bound, RESULTS_r3 §3b).

Weights are randomly initialized — throughput does not depend on values.
Usage: python scripts/bench_gen.py [--bs 8 16] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("TERRAIN_DTYPE", "bf16")

import jax

# TERRAIN_PLATFORM=cpu forces the backend (sitecustomize pins jax_platforms
# at interpreter start, same contract as cli.py)
if os.environ.get("TERRAIN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TERRAIN_PLATFORM"])

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[8])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--enc", choices=("none", "png"), default="none",
                    help="png adds a wire-ready arm: fetched u8 frames are "
                         "encoded with the native PNG encoder (the serve "
                         "wire format) and the byte ratio is reported — the "
                         "fetch itself cannot shrink (device->host is raw "
                         "u8; PNG compresses only the host->client leg)")
    args = ap.parse_args()

    from terrain_tpu.experiments import _build_test1
    from terrain_tpu.sample.samplers import make_two_stage_sampler
    from terrain_tpu.utils import to_u8_device

    model = _build_test1(train_mode="both", p2p_bilinear=True, verbose=False)
    det, _ = make_two_stage_sampler(model.nets["dcgan_gen"],
                                    model.nets["p2p_gen"])
    pg = model.params["dcgan_gen"]
    sg = model.states["dcgan_gen"]
    pu = model.params["p2p_gen"]
    su = model.states["p2p_gen"]

    u8 = jax.jit(lambda a, b: (to_u8_device(a, True), to_u8_device(b, False)))

    out = {"metric": "gen_imgs_per_sec_512px_two_stage",
           "steps": args.steps, "unit": "imgs/s"}
    for bs in args.bs:
        zs = [jnp.asarray(np.random.RandomState(t).rand(
            bs, model.latent_dim).astype(np.float32)) for t in range(4)]
        # warm both programs (fetch-fenced: block_until_ready lies on the
        # relay, CLAUDE.md)
        a, b = det(pg, sg, pu, su, zs[0])
        float(a[0, 0, 0, 0])
        qa, qb = u8(a, b)
        np.asarray(qa)

        t0 = time.perf_counter()
        last = None
        for t in range(args.steps):
            a, b = det(pg, sg, pu, su, zs[t % 4])
            last = a
        float(last[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        out[f"compute_imgs_per_sec_bs{bs}"] = round(bs * args.steps / dt, 2)

        t0 = time.perf_counter()
        for t in range(args.steps):
            a, b = det(pg, sg, pu, su, zs[t % 4])
            qa, qb = u8(a, b)
            np.asarray(qa), np.asarray(qb)  # full uint8 delivery
        dt = time.perf_counter() - t0
        out[f"delivered_imgs_per_sec_bs{bs}"] = round(bs * args.steps / dt, 2)

        # pipelined delivery (VERDICT r4 item 8): the serial loop above
        # waits compute -> fetch A -> fetch B per batch; here batch t+1's
        # device programs are enqueued before batch t's fetch, and the A/B
        # planes fetch on concurrent threads.  If the relay serializes
        # fetches this measures the true fetch-bound ceiling.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as ex:
            def produce(t):
                a, b = det(pg, sg, pu, su, zs[t % 4])
                return u8(a, b)

            t0 = time.perf_counter()
            pend = produce(0)
            for t in range(args.steps):
                cur, pend = pend, (produce(t + 1)
                                   if t + 1 < args.steps else None)
                fa = ex.submit(np.asarray, cur[0])
                fb = ex.submit(np.asarray, cur[1])
                fa.result(), fb.result()
            dt = time.perf_counter() - t0
        out[f"delivered_pipelined_imgs_per_sec_bs{bs}"] = round(
            bs * args.steps / dt, 2)

        if args.enc == "png":
            from terrain_tpu.data.native import encode_png

            raw_bytes = png_bytes = 0
            t0 = time.perf_counter()
            for t in range(args.steps):
                a, b = det(pg, sg, pu, su, zs[t % 4])
                qa, qb = u8(a, b)
                qa, qb = np.asarray(qa), np.asarray(qb)
                for i in range(bs):
                    pa = encode_png(qa[i])
                    pb = encode_png(qb[i])
                    raw_bytes += qa[i].nbytes + qb[i].nbytes
                    png_bytes += len(pa) + len(pb)
            dt = time.perf_counter() - t0
            out[f"wire_png_imgs_per_sec_bs{bs}"] = round(
                bs * args.steps / dt, 2)
            out[f"png_byte_ratio_bs{bs}"] = round(raw_bytes / png_bytes, 2)

            # pipelined wire arm: per-image encodes submitted to a worker
            # pool so host PNG work overlaps the NEXT batch's relay fetch
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as ex:
                def produce(t):
                    a, b = det(pg, sg, pu, su, zs[t % 4])
                    return u8(a, b)

                t0 = time.perf_counter()
                encs = []
                pend = produce(0)
                for t in range(args.steps):
                    cur, pend = pend, (produce(t + 1)
                                       if t + 1 < args.steps else None)
                    fa = ex.submit(np.asarray, cur[0])
                    fb = ex.submit(np.asarray, cur[1])
                    qa, qb = fa.result(), fb.result()
                    encs += [ex.submit(encode_png, qa[i]) for i in range(bs)]
                    encs += [ex.submit(encode_png, qb[i]) for i in range(bs)]
                total = sum(len(e.result()) for e in encs)
                dt = time.perf_counter() - t0
            assert total > 0
            out[f"wire_png_pipelined_imgs_per_sec_bs{bs}"] = round(
                bs * args.steps / dt, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
