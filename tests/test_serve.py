"""Serving tests: protocol roundtrip, micro-batcher coalescing semantics,
and a live end-to-end TCP server around a tiny two-stage model."""

import threading

import numpy as np
import pytest

from terrain_tpu.serve import MicroBatcher, TerrainClient, TerrainServer, bucket_size
from terrain_tpu.serve.protocol import (
    decode_array, decode_array_png, decode_payload, encode_array,
    encode_array_png)


def test_protocol_array_roundtrip():
    for arr in (np.arange(12, dtype=np.float32).reshape(3, 4),
                np.zeros((2, 8, 8, 1), np.uint8),
                np.array(3.5, np.float64)):
        out = decode_array(encode_array(arr))
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_protocol_png_roundtrip_quantization():
    rng = np.random.RandomState(0)
    h = rng.rand(3, 16, 16, 1).astype(np.float32)          # heightmap [0,1]
    t = (rng.rand(2, 16, 16, 3) * 2 - 1).astype(np.float32)  # texture [-1,1]
    ph = encode_array_png(h, "heightmap")
    pt = encode_array_png(t, "texture")
    assert ph["enc"] == "png" and len(ph["frames"]) == 3
    hb = decode_array_png(ph)
    tb = decode_array_png(pt)
    assert hb.shape == h.shape and tb.shape == t.shape
    assert hb.dtype == np.float32 and tb.dtype == np.float32
    # documented quantization bounds: u16 for heightmaps, u8 for textures
    assert np.abs(hb - h).max() <= 0.5 / 65535 + 1e-7
    assert np.abs(tb - t).max() <= 0.5 / 127.5 + 1e-7
    # out-of-range values clip rather than wrap
    spike = np.array([[[[1.5]], [[-0.5]]]], np.float32).reshape(1, 2, 1, 1)
    back = decode_array_png(encode_array_png(spike, "heightmap"))
    assert back[0, 0, 0, 0] == 1.0 and back[0, 1, 0, 0] == 0.0
    # decode_payload dispatches on the wire type
    np.testing.assert_array_equal(decode_payload(encode_array(h)), h)
    np.testing.assert_allclose(decode_payload(ph), hb)
    with pytest.raises(ValueError, match="kind"):
        encode_array_png(h, "nope")
    with pytest.raises(ValueError, match="payload"):
        decode_payload(123)


def test_bucket_size():
    assert [bucket_size(n, 8) for n in (1, 2, 3, 4, 5, 8)] == [1, 2, 4, 4, 8, 8]
    with pytest.raises(ValueError):
        bucket_size(9, 8)


def test_microbatcher_coalesces_and_isolates_errors():
    seen = []

    def run(op, requests):
        seen.append((op, len(requests)))
        if op == "boom":
            raise RuntimeError("kaboom")
        return [r * 10 for r in requests]

    mb = MicroBatcher(run, max_batch=4, wait_ms=200.0)
    # pre-load the queue before the worker spins up so one batch forms
    futs = [mb.submit("mul", i, 1) for i in range(3)]
    assert [f.result(timeout=10) for f in futs] == [0, 10, 20]
    # a failing batch fails those futures, not the batcher
    bad = mb.submit("boom", 1, 1)
    with pytest.raises(RuntimeError, match="kaboom"):
        bad.result(timeout=10)
    ok = mb.submit("mul", 7, 1)
    assert ok.result(timeout=10) == 70
    assert mb.stats["requests"] == 4
    # oversized single request is rejected at submit
    with pytest.raises(ValueError, match="max_batch"):
        mb.submit("mul", 0, 5)
    mb.shutdown()


def test_microbatcher_respects_max_batch_rows():
    sizes = []

    def run(op, requests):
        sizes.append(sum(requests))
        return requests

    mb = MicroBatcher(run, max_batch=4, wait_ms=150.0)
    futs = [mb.submit("op", n, n) for n in (3, 3, 2)]  # 3+3 > 4: must split
    for f in futs:
        f.result(timeout=10)
    assert all(s <= 4 for s in sizes)
    mb.shutdown()


def test_microbatcher_shutdown_fails_pending_futures():
    """shutdown() must not leave queued requests hanging: clients blocked in
    future.result() get a 'shutting down' error instead of waiting forever."""
    entered = threading.Event()
    gate = threading.Event()

    def run(op, requests):
        entered.set()
        gate.wait(timeout=10)  # hold the worker so later submits stay queued
        return requests

    mb = MicroBatcher(run, max_batch=1, wait_ms=0.0)
    f1 = mb.submit("op", 1, 1)
    assert entered.wait(timeout=5)
    f2 = mb.submit("op", 2, 1)  # queued behind the in-flight batch
    mb.shutdown()  # joins (worker still gated), then drains the queue
    with pytest.raises(RuntimeError, match="shutting down"):
        f2.result(timeout=5)
    gate.set()  # release the worker; its in-flight batch still completes
    assert f1.result(timeout=5) == 1


def test_microbatcher_stats_snapshot():
    mb = MicroBatcher(lambda op, rs: rs, max_batch=2, wait_ms=0.0)
    futs = [mb.submit("op", i, 1) for i in range(4)]
    for f in futs:
        f.result(timeout=10)
    snap = mb.snapshot()
    assert snap["requests"] == 4 and snap["rows"] == 4
    mb.shutdown()


# ---------------------------------------------------------------- end-to-end

IN_SHP = 16
LATENT = 8


@pytest.fixture(scope="module")
def server():
    from terrain_tpu.models import dcgan, p2p
    from terrain_tpu.train.trainer import TwoStageGAN

    model = TwoStageGAN(
        gen_fn_dcgan=dcgan.default_generator,
        disc_fn_dcgan=dcgan.default_discriminator,
        gen_params_dcgan={"nch": 16, "h": 3, "initial_size": 4,
                          "final_size": IN_SHP, "div": [2, 2]},
        disc_params_dcgan={"nch": IN_SHP, "h": 3, "div": [4, 2], "bn": False,
                           "nonlinearity": "linear"},
        gen_fn_p2p=p2p.g_unet,
        disc_fn_p2p=p2p.discriminator,
        gen_params_p2p={"nf": 4, "act": "tanh"},
        disc_params_p2p={"nf": 4, "bn": False, "act": "linear"},
        in_shp=IN_SHP, latent_dim=LATENT,
        is_a_grayscale=True, is_b_grayscale=False,
        lsgan=True, opt="rmsprop", train_mode="both", verbose=False,
    )
    srv = TerrainServer(model, port=0, max_batch=4, wait_ms=2.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_serve_health_and_generate(server):
    with TerrainClient(port=server.port) as c:
        assert (c.latent_dim, c.in_shp, c.max_batch) == (LATENT, IN_SHP, 4)
        h, t = c.generate(3, seed=11)
        assert h.shape == (3, IN_SHP, IN_SHP, 1) and t.shape == (3, IN_SHP, IN_SHP, 3)
        assert 0.0 <= h.min() and h.max() <= 1.0  # sigmoid heightmaps
        assert -1.0 <= t.min() and t.max() <= 1.0  # tanh textures
        # same seed -> same samples (deterministic BN path + seeded prior)
        h2, _ = c.generate(3, seed=11)
        np.testing.assert_array_equal(h, h2)
        # heightmap-only response
        h3, t3 = c.generate(1, seed=5, texture=False)
        assert t3 is None and h3.shape == (1, IN_SHP, IN_SHP, 1)


def test_serve_oversized_request_chunks_client_side(server):
    with TerrainClient(port=server.port) as c:
        h, t = c.generate(7, seed=3)  # > max_batch: client splits into 4+3
        assert h.shape[0] == 7 and t.shape[0] == 7


def test_serve_atob_matches_local_sampler(server):
    m = server.model
    x = np.random.RandomState(0).rand(2, IN_SHP, IN_SHP, 1).astype(np.float32)
    with TerrainClient(port=server.port) as c:
        remote = c.texture_for(x)
        single = c.texture_for(x[0])  # (H,W,1) convenience path
    local = np.asarray(m._g_det(m.params["p2p_gen"], m.states["p2p_gen"], x))
    np.testing.assert_allclose(remote, local, atol=1e-5)
    np.testing.assert_allclose(single, local[0], atol=1e-5)


def test_serve_interp_endpoints(server):
    with TerrainClient(port=server.port) as c:
        h, t = c.interpolate(seed=2, steps=6)
        assert h.shape == (6, IN_SHP, IN_SHP, 1) and t.shape == (6, IN_SHP, IN_SHP, 3)
        # endpoints are the two seeded prior samples run through gz
        z2, _ = c.generate(2, seed=2)
        np.testing.assert_allclose(h[0], z2[0], atol=1e-5)
        # lerp endpoint t=1 equals the second prior sample's decode
        stats = c.stats()
        assert stats["ok"] and stats["requests"] >= 1


def test_serve_png_encoding_matches_npy(server):
    with TerrainClient(port=server.port) as c:
        h, t = c.generate(2, seed=21)                       # exact floats
        hp, tp = c.generate(2, seed=21, enc="png")          # quantized PNGs
        assert hp.shape == h.shape and tp.shape == t.shape
        assert np.abs(hp - h).max() <= 0.5 / 65535 + 1e-7
        assert np.abs(tp - t).max() <= 0.5 / 127.5 + 1e-7
        # atob path honors enc too
        x = np.random.RandomState(1).rand(1, IN_SHP, IN_SHP, 1).astype(np.float32)
        ta = c.texture_for(x)
        tb = c.texture_for(x, enc="png")
        assert np.abs(tb - ta).max() <= 0.5 / 127.5 + 1e-7


def test_serve_qfetch_matches_host_quantization(server):
    """Device-side quantized fetch (the png default) == host-side
    quantization of the exact-float fetch, bit-for-bit after decode."""
    assert server.qfetch  # default on
    with TerrainClient(port=server.port) as c:
        h_dev, t_dev = c.generate(2, seed=33, enc="png")
        server.qfetch = False
        try:
            h_host, t_host = c.generate(2, seed=33, enc="png")
        finally:
            server.qfetch = True
    np.testing.assert_array_equal(h_dev, h_host)
    np.testing.assert_array_equal(t_dev, t_host)


def test_serve_interp_streaming(server):
    with TerrainClient(port=server.port) as c:
        h, t = c.interpolate(seed=9, steps=6)
        starts, hs, ts = [], [], []
        for start, hc, tc in c.iter_interpolate(seed=9, steps=6):
            starts.append(start)
            hs.append(hc)
            ts.append(tc)
        # chunks tile the clip in order (max_batch=4 -> buckets of 4+2)
        assert starts == [0, 4]
        np.testing.assert_array_equal(np.concatenate(hs), h)
        np.testing.assert_array_equal(np.concatenate(ts), t)
        # the connection is reusable after a fully-consumed stream
        assert c.health()["ok"]
        # streaming composes with png encoding
        hp = np.concatenate(
            [hc for _, hc, _ in c.iter_interpolate(seed=9, steps=6, enc="png")])
        assert np.abs(hp - h).max() <= 0.5 / 65535 + 1e-7


def test_serve_error_paths(server):
    with TerrainClient(port=server.port) as c:
        with pytest.raises(RuntimeError, match="unknown op"):
            c.request({"op": "nope"})
        with pytest.raises(RuntimeError, match="n must be"):
            c.request({"op": "gz", "n": 99})
        with pytest.raises(RuntimeError, match="heightmap must be"):
            c.request({"op": "atob",
                       "heightmap": encode_array(np.zeros((2, 4, 4, 1), np.float32))})
        with pytest.raises(RuntimeError, match="enc must be"):
            c.request({"op": "gz", "n": 1, "enc": "jpeg"})
        # server survives the errors
        h, _ = c.generate(1, seed=1, texture=False)
        assert h.shape == (1, IN_SHP, IN_SHP, 1)


def test_serve_concurrent_clients_coalesce(server):
    before = dict(server.batcher.stats)
    results = {}

    def one(i):
        with TerrainClient(port=server.port) as c:
            results[i] = c.generate(1, seed=100 + i)[0]

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results[i].shape == (1, IN_SHP, IN_SHP, 1) for i in range(4))
    delta_req = server.batcher.stats["requests"] - before["requests"]
    assert delta_req == 4  # every request was served through the batcher


def test_serve_warmup_compiles_without_touching_stats(server):
    before = dict(server.batcher.stats)
    server.warmup()
    assert server.batcher.stats == before  # bypasses the batcher entirely
    # served requests still work after a warmup
    with TerrainClient(port=server.port) as c:
        h, _ = c.generate(1, seed=0, texture=False)
        assert h.shape == (1, IN_SHP, IN_SHP, 1)
