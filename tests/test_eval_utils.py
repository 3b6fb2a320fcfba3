"""Eval metrics (SWD pyramid) + image utility tests."""

import numpy as np
import pytest

from terrain_tpu.data.synthetic import make_pairs
from terrain_tpu.eval import swd_pyramid
from terrain_tpu.utils import compose_imgs, convert_to_rgb
from terrain_tpu.utils.async_writer import AsyncWriter


def test_swd_zero_for_identical_sets():
    x, _ = make_pairs(8, 32, seed=0)
    a = x.astype(np.float32) / 255.0
    out = swd_pyramid(a, a, n_levels=2)
    assert out["swd_mean"] < 1e-5


def test_swd_discriminates_noise_from_structure():
    x, _ = make_pairs(8, 32, seed=0)
    real = x.astype(np.float32) / 255.0
    fake_noise = np.random.RandomState(0).rand(8, 32, 32, 1).astype(np.float32)
    x2, _ = make_pairs(8, 32, seed=3)
    fake_similar = x2.astype(np.float32) / 255.0
    d_noise = swd_pyramid(real, fake_noise, n_levels=2)["swd_mean"]
    d_similar = swd_pyramid(real, fake_similar, n_levels=2)["swd_mean"]
    assert d_noise > d_similar > 0


def test_terrain_stats_zero_for_identical_sets():
    from terrain_tpu.eval import terrain_stats

    x, _ = make_pairs(8, 32, seed=0)
    a = x.astype(np.float32) / 255.0
    out = terrain_stats(a, a, n_sample=4096)
    assert out["elev_w1"] < 1e-6 and out["slope_w1"] < 1e-6


def test_terrain_stats_detect_elevation_shift_and_roughness():
    """elev_w1 must see a pure elevation offset that slope_w1 ignores
    (constant shifts leave gradients bit-identical); slope_w1 must
    dominate for high-frequency roughening that barely moves the
    elevation CDF — the failure mode elevation statistics cannot see."""
    from terrain_tpu.eval import terrain_stats

    x, _ = make_pairs(8, 64, seed=0)
    real = x.astype(np.float32) / 255.0

    shifted = real + 0.2
    out = terrain_stats(real, shifted, n_sample=8192)
    assert abs(out["elev_w1"] - 0.2) < 0.02
    assert out["slope_w1"] < 1e-6  # gradients unchanged by a constant shift

    rough = real + np.random.RandomState(0).randn(
        *real.shape).astype(np.float32) * 0.05
    out = terrain_stats(real, rough, n_sample=8192)
    assert out["slope_w1"] > 3 * out["elev_w1"]
    assert out["slope_w1"] > 0.01


def test_convert_to_rgb_ranges():
    gray = np.random.RandomState(0).rand(8, 8, 1).astype(np.float32)
    rgb = convert_to_rgb(gray, is_grayscale=True)
    assert rgb.shape == (8, 8, 3)
    np.testing.assert_allclose(rgb[..., 0], rgb[..., 1])
    color = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32) * 2 - 1
    out = convert_to_rgb(color, is_grayscale=False)
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out, np.clip((color * 127.5 + 127.5) / 255.0, 0, 1),
                               rtol=1e-5)
    with pytest.raises(ValueError):
        convert_to_rgb(np.zeros((8, 8)), True)
    with pytest.raises(ValueError):
        convert_to_rgb(np.zeros((8, 8, 2)), True)


def test_compose_imgs_side_by_side():
    a = np.zeros((4, 4, 1), np.float32)
    b = np.ones((4, 4, 3), np.float32)
    out = compose_imgs(a, b, is_a_grayscale=True, is_b_grayscale=False)
    assert out.shape == (4, 8, 3)
    assert out[:, :4].max() == 0.0 and out[:, 4:].min() == 1.0


def test_async_writer_runs_and_surfaces_errors(tmp_path):
    w = AsyncWriter()
    hits = []
    w.submit(hits.append, 1)
    w.submit(hits.append, 2)
    w.flush()
    assert hits == [1, 2]

    def boom():
        raise RuntimeError("io failed")

    w.submit(boom)
    with pytest.raises(RuntimeError):
        w.flush()
    w.close()


def test_arch_diagram_renders(tmp_path):
    """Block-diagram PNG for a real factory: one box per param block, file
    written (reference parity: nolearn draw_to_file, pix2pix.py:226-233)."""
    import jax

    from terrain_tpu.models import dcgan
    from terrain_tpu.utils.arch_diagram import draw_network

    net = dcgan.default_generator(latent_dim=16, is_a_grayscale=True,
                                  nch=16, h=2, initial_size=4, final_size=16,
                                  div=[2, 2])
    params, _ = net.init(jax.random.PRNGKey(0))
    out = tmp_path / "arch.png"
    n = draw_network(net, params, str(out))
    assert out.exists() and out.stat().st_size > 5000
    # dense+bn_in, 2 stages x (conv+bn), conv_out
    assert n >= 5


def test_to_u8_device_matches_host_pipeline(rng):
    """Device-side quantization must be bit-identical to the host
    convert_to_rgb -> save_png math it replaces (trainer dump paths)."""
    import numpy as np

    from terrain_tpu.utils import convert_to_rgb, to_u8_device

    # grayscale in [0,1] (sigmoid outputs), incl. out-of-range values
    g = rng.rand(2, 16, 16, 1).astype(np.float32) * 1.2 - 0.1
    host = np.clip(convert_to_rgb(g[0], is_grayscale=True) * 255.0 + 0.5,
                   0, 255).astype(np.uint8)
    dev = np.asarray(to_u8_device(g, True))[0]
    assert dev.shape == (16, 16, 1)
    assert (np.repeat(dev, 3, axis=-1) == host).all()
    # color in [-1,1] (tanh outputs)
    c = rng.rand(2, 8, 8, 3).astype(np.float32) * 2.4 - 1.2
    host = np.clip(convert_to_rgb(c[0], is_grayscale=False) * 255.0 + 0.5,
                   0, 255).astype(np.uint8)
    dev = np.asarray(to_u8_device(c, False))[0]
    assert (dev == host).all()


def test_to_u8_device_preview_scale(rng):
    """scale>1 box-averages s x s blocks before quantization (the
    TERRAIN_ARTIFACT_SCALE per-epoch preview path); non-dividing shapes
    and scale=1 are exact no-ops."""
    from terrain_tpu.utils import to_u8_device

    g = rng.rand(2, 8, 8, 1).astype(np.float32)
    got = np.asarray(to_u8_device(g, True, scale=2))
    want = g.reshape(2, 4, 2, 4, 2, 1).mean(axis=(2, 4))
    want = np.clip(np.floor(want * 255.0 + 0.5), 0, 255).astype(np.uint8)
    assert got.shape == (2, 4, 4, 1)
    np.testing.assert_array_equal(got, want)
    # scale=1 and non-dividing scale keep the full-res exact path
    np.testing.assert_array_equal(np.asarray(to_u8_device(g, True, scale=1)),
                                  np.asarray(to_u8_device(g, True)))
    assert np.asarray(to_u8_device(g, True, scale=3)).shape == (2, 8, 8, 1)


def test_trainer_artifact_scale_env(tmp_path, monkeypatch):
    """TERRAIN_ARTIFACT_SCALE=2 halves the per-epoch dump resolution but
    leaves the direct (publication) generate_gz path full-res."""
    import os
    import sys
    sys.path.insert(0, "tests")
    from test_trainer import tiny_model
    from terrain_tpu.data.synthetic import make_pairs
    from terrain_tpu.data import DeviceDataset
    import imageio.v3 as iio

    monkeypatch.setenv("TERRAIN_ARTIFACT_SCALE", "2")
    m = tiny_model()
    x, y = make_pairs(8, 16, seed=0)
    ds = DeviceDataset(x, y)
    out = str(tmp_path / "out")
    mdl = str(tmp_path / "models")
    m.train(ds, ds, batch_size=4, num_epochs=1, out_dir=out, model_dir=mdl,
            save_every=10, quick_run=True)
    dump = os.path.join(out, "dump_a", "0.png")
    assert iio.imread(dump).shape[:2] == (8, 8)  # 16px model, halved
    # direct call (gen mode) stays full-res
    m.generate_gz(1, 1, str(tmp_path / "gen"))
    assert iio.imread(str(tmp_path / "gen" / "0.png")).shape[:2] == (16, 16)


def test_compare_published_loader_and_rows(tmp_path, capsys):
    """tools/compare_published.py: gray loader (RGB -> first channel,
    [0,1]), scale matching, and the metric row path on tiny sets."""
    import numpy as np
    from imageio.v3 import imwrite

    import tools.compare_published as cp

    ref = tmp_path / "ref"
    gen = tmp_path / "gen"
    ref.mkdir()
    gen.mkdir()
    r = np.random.RandomState(0)
    for i in range(4):
        g = (r.rand(64, 64) * 255).astype(np.uint8)
        imwrite(ref / f"{i}.png", np.stack([g, g, g], axis=-1))  # gray-RGB
        imwrite(gen / f"{i}.png", (r.rand(128, 128) * 255).astype(np.uint8))
    a = cp.load_gray_pngs(str(ref))
    b = cp.load_gray_pngs(str(gen))
    assert a.shape == (4, 64, 64, 1) and b.shape == (4, 128, 128, 1)
    assert 0.0 <= float(a.min()) and float(a.max()) <= 1.0
    b16 = cp.to_scale(b, 64)
    assert b16.shape == (4, 64, 64, 1)
    m = cp.row("test", a, b16, seed=0)
    out = capsys.readouterr().out
    assert "swd_mean" in out and np.isfinite(m["swd_mean"])
    assert np.isfinite(m["elev_w1"]) and np.isfinite(m["slope_w1"])
    # identical sets: SWD ~ 0 under the shared-key protocol
    m0 = cp.metrics(a, a, seed=0)
    assert m0["swd_mean"] < 1e-3 and m0["elev_w1"] < 1e-6


def test_compare_published_rejects_mixed_shapes(tmp_path):
    import numpy as np
    import pytest
    from imageio.v3 import imwrite

    import tools.compare_published as cp

    d = tmp_path / "mix"
    d.mkdir()
    imwrite(d / "0.png", np.zeros((8, 8), np.uint8))
    imwrite(d / "1.png", np.zeros((16, 16), np.uint8))
    with pytest.raises(SystemExit, match="mixed"):
        cp.load_gray_pngs(str(d))


def test_make_gen_sheet_rejects_mixed_shapes(tmp_path):
    import subprocess
    import sys

    import numpy as np
    from imageio.v3 import imwrite

    d = tmp_path / "gen"
    d.mkdir()
    imwrite(d / "0.png", np.zeros((8, 8), np.uint8))
    imwrite(d / "1.png", np.zeros((16, 16), np.uint8))
    p = subprocess.run(
        [sys.executable, "tools/make_gen_sheet.py", str(d),
         str(tmp_path / "s.png"), "--k", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode != 0
    assert "shape" in p.stderr
