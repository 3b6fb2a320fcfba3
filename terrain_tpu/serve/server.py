"""Terrain sampler service: online API around the jit-compiled two-stage GAN.

The reference exposes sampling only as offline CLI dumps
(generate_gz/generate_atob/generate_interpolation, pix2pix.py:276-425);
this server turns the same semantics into a concurrent network service
designed around how TPUs execute:

* the full z -> heightmap -> texture pipeline is ONE compiled XLA program
  (terrain_tpu/sample/samplers.py), so a request costs a single device
  dispatch;
* concurrent requests are coalesced by the MicroBatcher and padded to
  power-of-two bucket sizes — static shapes, so at most a handful of
  executables compile and then every request is a cache hit;
* all padding/slicing happens host-side on numpy; the device only ever
  sees full buckets.

Ops (newline-delimited JSON, see protocol.py):
  {"op": "health"}                          -> {"ok": true, ...}
  {"op": "stats"}                           -> batcher counters
  {"op": "gz", "n": 4, "seed": 1,
   "deterministic": true, "texture": true}  -> heightmaps (+ textures)
  {"op": "atob", "heightmap": <b64 npy>}    -> textures for client arrays
  {"op": "interp", "seed": 7, "steps": 25,
   "deterministic": true}                   -> two-stage frames along a
                                               z-lerp (pix2pix.py:374-425
                                               semantics, one request)

Every sampling op accepts ``"enc": "npy" | "png"`` — png returns per-frame
16-bit-gray / 8-bit-RGB PNGs (~7x smaller on the wire at 512px, documented
quantization in protocol.py) instead of exact-float .npy payloads.
``interp`` additionally accepts ``"stream": true`` to receive one response
per device bucket as frames are computed ({"stream": true, "done": false,
"frame_start": i, ...} chunks, final chunk "done": true) — bounds response
lines to one bucket (a 256-step 512px clip in one line would exceed
MAX_LINE) and cuts time-to-first-frame from the whole clip to one bucket.
"""

import socketserver
import threading

import numpy as np

from terrain_tpu.serve.batcher import MicroBatcher, bucket_size
from terrain_tpu.serve.protocol import (
    decode_array, encode_array, encode_array_png, recv_msg, send_msg)


class TerrainServer:
    """Serves a trained TwoStageGAN.  ``model`` must expose the trainer's
    sampler handles (_two_stage_det/_two_stage_stoch, _g_det/_g_stoch),
    params/states, sampler, latent_dim — i.e. be a
    terrain_tpu.train.trainer.TwoStageGAN."""

    def __init__(self, model, host="127.0.0.1", port=0, *,
                 max_batch=8, wait_ms=2.0, png_level=3):
        import os

        self.model = model
        self.max_batch = int(max_batch)
        self.png_level = int(png_level)
        # png responses fetch DEVICE-quantized u16/u8 (2-4x fewer bytes over
        # the relay's ~2 MB/s device->host fetch path, the measured latency
        # bound at 512px — RESULTS_r3 §3b); TERRAIN_SERVE_QFETCH=0 restores
        # the f32 fetch + host quantization
        self.qfetch = os.environ.get("TERRAIN_SERVE_QFETCH", "1") != "0"
        self._q_handles = None
        self.batcher = MicroBatcher(
            self._run_batch, max_batch=max_batch, wait_ms=wait_ms)
        self._rng_lock = threading.Lock()
        self._global_rng = np.random.RandomState(0)
        self._stoch_counter = 0
        # one device-dispatch lock across ALL ops: the batcher serializes
        # per-op, but two different ops (gz vs atob) could otherwise hit the
        # jitted sampler handles concurrently from their worker threads
        self._dispatch_lock = threading.Lock()
        # relay fetches happen OUTSIDE the dispatch lock (the arrays are
        # already enqueued on device; holding the lock through a ~0.5 s
        # 512px fetch would serialize the next request's dispatch behind
        # it), and the two-stage A/B planes fetch concurrently here
        from concurrent.futures import ThreadPoolExecutor

        self._io_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="terrain-serve-fetch")

        handler = self._make_handler()
        # threaded so slow clients don't starve each other; actual device
        # work is serialized per-op inside the batcher
        self.tcp = socketserver.ThreadingTCPServer((host, port), handler)
        self.tcp.daemon_threads = True
        self.tcp.allow_reuse_address = True
        self.host, self.port = self.tcp.server_address
        self._thread = None

    # ------------------------------------------------------------- lifecycle
    def serve_forever(self):
        self.tcp.serve_forever()

    def start_background(self):
        self._thread = threading.Thread(
            target=self.serve_forever, name="terrain-serve", daemon=True)
        self._thread.start()
        return self

    def shutdown(self):
        self.tcp.shutdown()
        self.tcp.server_close()
        self.batcher.shutdown()
        self._io_pool.shutdown(wait=False)

    def warmup(self, verbose=False):
        """Pre-compile the deterministic graphs for EVERY bucket size
        (1, 2, 4, ..., max_batch) so no first request pays an XLA compile
        (on the TPU remote-compile relay a cold 512px two-stage compile
        costs minutes)."""
        m = self.model
        b = 1
        while True:
            z = np.zeros((b, m.latent_dim), np.float32)
            x = np.zeros((b, m.in_shp, m.in_shp, 1), np.float32)
            if verbose:
                print(f"warmup: compiling gz/atob bucket={b} ...", flush=True)
            self._two_stage(z, True)
            self._atob(x, True)
            if self.qfetch:  # the png path's device-quantized programs
                self._two_stage(z, True, wire="q")
                self._atob(x, True, wire="q")
            if b >= self.max_batch:
                break
            b = min(b * 2, self.max_batch)
        if verbose:
            print("warmup: done", flush=True)

    # ------------------------------------------------------------ device work
    def _sample_z(self, n, seed):
        if seed is not None:
            return np.random.RandomState(int(seed)).rand(
                n, self.model.latent_dim).astype(np.float32)
        with self._rng_lock:
            return self._global_rng.rand(
                n, self.model.latent_dim).astype(np.float32)

    def _next_rng(self):
        import jax

        with self._rng_lock:
            self._stoch_counter += 1
            return jax.random.fold_in(
                jax.random.PRNGKey(0x5e7), self._stoch_counter)

    def _pad(self, arr, bucket):
        n = arr.shape[0]
        if n == bucket:
            return arr
        pad = np.repeat(arr[:1], bucket - n, axis=0)  # repeat row 0: same
        return np.concatenate([arr, pad], axis=0)     # shapes, valid values

    def _quantized(self):
        """Lazily-built jitted sampler wrappers that quantize ON DEVICE
        (u16 heightmap / u8 texture, the exact encode_array_png contract)
        so the host fetches 2-4x fewer bytes.  jit-of-jit inlines the
        sampler, so each is still ONE device dispatch + ONE program."""
        if self._q_handles is None:
            import jax
            import jax.numpy as jnp

            m = self.model

            def q16(a):
                return jnp.rint(jnp.clip(a[..., 0], 0.0, 1.0) * 65535.0) \
                    .astype(jnp.uint16)

            def q8(b):
                return jnp.rint((jnp.clip(b, -1.0, 1.0) + 1.0) * 127.5) \
                    .astype(jnp.uint8)

            self._q_handles = {
                "ts_det": jax.jit(
                    lambda *a: (lambda ab: (q16(ab[0]), q8(ab[1])))(
                        m._two_stage_det(*a))),
                "ts_stoch": jax.jit(
                    lambda *a: (lambda ab: (q16(ab[0]), q8(ab[1])))(
                        m._two_stage_stoch(*a))),
                "g_det": jax.jit(lambda *a: q8(m._g_det(*a))),
                "g_stoch": jax.jit(lambda *a: q8(m._g_stoch(*a))),
            }
        return self._q_handles

    def _two_stage(self, Z, deterministic, wire="f32"):
        m = self.model
        p, s = m.params, m.states
        args = (p["dcgan_gen"], s["dcgan_gen"], p["p2p_gen"], s["p2p_gen"], Z)
        q = self._quantized() if wire == "q" else None
        with self._dispatch_lock:
            if deterministic:
                fn = q["ts_det"] if q else m._two_stage_det
                a, b = fn(*args)
            else:
                fn = q["ts_stoch"] if q else m._two_stage_stoch
                a, b = fn(*args, self._next_rng())
        fa = self._io_pool.submit(np.asarray, a)
        bb = np.asarray(b)
        return fa.result(), bb

    def _atob(self, X, deterministic, wire="f32"):
        m = self.model
        p, s = m.params["p2p_gen"], m.states["p2p_gen"]
        q = self._quantized() if wire == "q" else None
        with self._dispatch_lock:
            if deterministic:
                fn = q["g_det"] if q else m._g_det
                b = fn(p, s, X)
            else:
                fn = q["g_stoch"] if q else m._g_stoch
                b = fn(p, s, X, self._next_rng())
        return np.asarray(b)

    def _run_batch(self, op, requests):
        """Executor for the MicroBatcher: one padded device dispatch for a
        coalesced batch, then split results back per request."""
        kind, deterministic, wire = op
        rows = [r["rows"] for r in requests]
        total = sum(rows)
        bucket = bucket_size(total, self.max_batch)
        if kind == "gz":
            batch = np.concatenate([r["z"] for r in requests], axis=0)
            a, b = self._two_stage(self._pad(batch, bucket), deterministic,
                                   wire)
            payload = list(zip(np.split(a[:total], np.cumsum(rows)[:-1]),
                               np.split(b[:total], np.cumsum(rows)[:-1])))
        elif kind == "atob":
            batch = np.concatenate([r["x"] for r in requests], axis=0)
            b = self._atob(self._pad(batch, bucket), deterministic, wire)
            payload = np.split(b[:total], np.cumsum(rows)[:-1])
        else:
            raise ValueError(f"unknown batch op {kind!r}")
        return payload

    # -------------------------------------------------------------- requests
    def _encode(self, arr, kind, enc):
        if enc == "png":
            return encode_array_png(arr, kind, level=self.png_level)
        return encode_array(arr)

    def handle_request(self, msg, send_partial=None):
        """Handle one request; ``send_partial``, when provided by the
        transport, emits intermediate response objects for streaming ops
        (the returned object is always the FINAL response)."""
        op = msg.get("op")
        if op == "health":
            return {"ok": True, "latent_dim": self.model.latent_dim,
                    "in_shp": self.model.in_shp,
                    "max_batch": self.max_batch}
        if op == "stats":
            return {"ok": True, **self.batcher.snapshot()}
        deterministic = bool(msg.get("deterministic", True))
        enc = msg.get("enc", "npy")
        if enc not in ("npy", "png"):
            raise ValueError(f'enc must be "npy" or "png", got {enc!r}')
        # png responses ride the device-quantized fetch; wire is part of
        # the batch key so exact-npy and quantized requests never coalesce
        # into one dispatch
        wire = "q" if (enc == "png" and self.qfetch) else "f32"
        if op == "gz":
            n = int(msg.get("n", 1))
            if not 1 <= n <= self.max_batch:
                raise ValueError(
                    f"n must be in [1, {self.max_batch}] per request")
            Z = self._sample_z(n, msg.get("seed"))
            a, b = self.batcher.submit(
                ("gz", deterministic, wire), {"z": Z, "rows": n}, n).result()
            out = {"ok": True, "heightmap": self._encode(a, "heightmap", enc)}
            if msg.get("texture", True):
                out["texture"] = self._encode(b, "texture", enc)
            return out
        if op == "atob":
            X = decode_array(msg["heightmap"]).astype(np.float32)
            if X.ndim == 3:
                X = X[None]
            m = self.model
            if X.shape[1:] != (m.in_shp, m.in_shp, 1):
                raise ValueError(
                    f"heightmap must be (n, {m.in_shp}, {m.in_shp}, 1), "
                    f"got {X.shape}")
            n = X.shape[0]
            if n > self.max_batch:
                raise ValueError(
                    f"n must be <= {self.max_batch} per request")
            b = self.batcher.submit(
                ("atob", deterministic, wire), {"x": X, "rows": n}, n).result()
            return {"ok": True, "texture": self._encode(b, "texture", enc)}
        if op == "interp":
            steps = int(msg.get("steps", 25))
            if not 2 <= steps <= 256:
                raise ValueError("steps must be in [2, 256]")
            stream = bool(msg.get("stream", False)) and send_partial is not None
            # z-lerp between two prior samples through the full two-stage
            # pipeline (reference generate_interpolation_clip semantics,
            # pix2pix.py:391-408), chunked into buckets server-side
            Z = self._sample_z(2, msg.get("seed"))
            t = np.linspace(0.0, 1.0, steps, dtype=np.float32)[:, None]
            zs = Z[0][None] * (1 - t) + Z[1][None] * t
            outs_a, outs_b = [], []
            for i in range(0, steps, self.max_batch):
                chunk = zs[i:i + self.max_batch]
                a, b = self.batcher.submit(
                    ("gz", deterministic, wire),
                    {"z": chunk, "rows": len(chunk)}, len(chunk)).result()
                if stream:
                    done = i + len(chunk) >= steps
                    part = {"ok": True, "stream": True, "done": done,
                            "frame_start": i, "frames": len(chunk),
                            "heightmap": self._encode(a, "heightmap", enc),
                            "texture": self._encode(b, "texture", enc)}
                    if done:
                        return part
                    send_partial(part)
                else:
                    outs_a.append(a)
                    outs_b.append(b)
            return {
                "ok": True,
                "heightmap": self._encode(
                    np.concatenate(outs_a), "heightmap", enc),
                "texture": self._encode(
                    np.concatenate(outs_b), "texture", enc)}
        raise ValueError(f"unknown op {op!r}")

    # -------------------------------------------------------------- transport
    def _make_handler(self):
        server = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    try:
                        msg = recv_msg(self.rfile)
                    except Exception as e:  # malformed frame: report, drop conn
                        try:
                            send_msg(self.wfile,
                                     {"ok": False, "error": f"bad request: {e}"})
                        except OSError:
                            pass
                        return
                    if msg is None:
                        return
                    try:
                        resp = server.handle_request(
                            msg,
                            send_partial=lambda obj: send_msg(self.wfile, obj))
                    except Exception as e:  # noqa: BLE001 — per-request isolation
                        # mid-stream failures land here too: the error object
                        # becomes the stream's terminal message
                        resp = {"ok": False,
                                "error": f"{type(e).__name__}: {e}"}
                    try:
                        send_msg(self.wfile, resp)
                    except OSError:
                        return

        return Handler
