"""AOT executable store (utils/aot.py): save/load roundtrip, trainer wiring."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from terrain_tpu.utils.aot import AotLazy, aot_compile


def test_aot_compile_roundtrip(tmp_path, capsys):
    d = str(tmp_path / "aot")
    f = jax.jit(lambda x, y: x * 2 + y)
    a = (jnp.arange(4.0), jnp.ones((4,)))
    c1 = aot_compile(f, a, "double", d, verbose=True)
    np.testing.assert_allclose(np.asarray(c1(*a)), np.arange(4.0) * 2 + 1)
    assert any(p.endswith(".aotx") for p in os.listdir(d))
    out1 = capsys.readouterr().out
    assert "saved" in out1
    c2 = aot_compile(f, a, "double", d, verbose=True)
    np.testing.assert_allclose(np.asarray(c2(*a)), np.asarray(c1(*a)))
    assert "loaded" in capsys.readouterr().out


def test_aot_fingerprint_distinguishes_programs(tmp_path, monkeypatch):
    # exhaustive (jaxpr) keying: different programs, same tag -> two entries
    monkeypatch.setenv("TERRAIN_AOT_KEY", "jaxpr")
    d = str(tmp_path / "aot")
    a = (jnp.arange(4.0),)
    aot_compile(jax.jit(lambda x: x * 2), a, "fn", d)
    aot_compile(jax.jit(lambda x: x * 3), a, "fn", d)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2


def test_aot_shapes_key_contract(tmp_path):
    """Default keying is (toolchain, source digest, shapes) — the TAG must
    uniquely identify the program (trainer tags embed mode/shape/dataset
    digest).  Same tag + same shapes = one entry reused; distinct tags get
    distinct entries."""
    d = str(tmp_path / "aot")
    a = (jnp.arange(4.0),)
    f2 = aot_compile(jax.jit(lambda x: x * 2), a, "fn2", d)
    f3 = aot_compile(jax.jit(lambda x: x * 3), a, "fn3", d)
    np.testing.assert_allclose(np.asarray(f2(*a)), np.arange(4.0) * 2)
    np.testing.assert_allclose(np.asarray(f3(*a)), np.arange(4.0) * 3)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2
    # same tag, same shapes: loads the stored executable (one entry)
    f2b = aot_compile(jax.jit(lambda x: x * 2), a, "fn2", d)
    np.testing.assert_allclose(np.asarray(f2b(*a)), np.arange(4.0) * 2)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2


def test_aot_fingerprint_covers_graph_knobs(tmp_path, monkeypatch):
    """Graph-shaping TERRAIN_* knobs select different programs from the
    same source and shapes (e.g. the Pallas toggles during an A/B) — the
    fingerprint must separate them, or a store populated under one knob
    silently serves a stale executable under another."""
    d = str(tmp_path / "aot")
    a = (jnp.arange(4.0),)
    f = jax.jit(lambda x: x * 2)
    aot_compile(f, a, "fn", d)
    monkeypatch.setenv("TERRAIN_POOL_VJP", "dense")  # graph knob -> new entry
    aot_compile(f, a, "fn", d)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2
    monkeypatch.setenv("TERRAIN_EPOCHS", "999")  # host-side knob -> reused
    aot_compile(f, a, "fn", d)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2


def test_trainer_config_digest_separates_configs():
    """Closure scalars (alpha, lsgan, ...) reach the step graph without
    changing arg shapes; the trainer's config_digest (embedded in every AOT
    tag) must differ when they do."""
    from tests.test_trainer import tiny_model

    m1 = tiny_model()
    m2 = tiny_model()
    assert m1.config_digest == m2.config_digest
    m3 = tiny_model(alpha=1)
    assert m3.config_digest != m1.config_digest


def test_aot_lazy_shape_fallback(tmp_path):
    d = str(tmp_path / "aot")
    lazy = AotLazy(jax.jit(lambda x: x + 1), "inc", d)
    np.testing.assert_allclose(np.asarray(lazy(jnp.zeros((3,)))), 1.0)
    # a second shape silently falls back to the jitted path
    np.testing.assert_allclose(np.asarray(lazy(jnp.zeros((5,)))), 1.0)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 1


def test_trainer_aot_cache_steps(tmp_path, monkeypatch):
    from terrain_tpu.data import DeviceDataset
    from terrain_tpu.data.synthetic import make_pairs
    from tests.test_trainer import tiny_model

    d = str(tmp_path / "aot")
    monkeypatch.setenv("TERRAIN_AOT", d)
    m = tiny_model()
    x, y = make_pairs(8, 16, seed=0)
    ds = DeviceDataset(x, y)
    tr, ev = m._get_cache_steps(ds)
    assert isinstance(tr, AotLazy) and isinstance(ev, AotLazy)
    Z = m._sample_z(4)
    idx = jnp.arange(4, dtype=jnp.int32)
    params, states, opts, losses = tr(
        m.params, m.states, m.opt_states, ds.batch_args(Z, idx),
        jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert all(np.isfinite(float(v)) for v in losses.values())
    entries = [p for p in os.listdir(d) if p.endswith(".aotx")]
    assert len(entries) == 1 and entries[0].startswith("both_16_")\
        and "_train" in entries[0]


def test_aot_lazy_multi_entries(tmp_path):
    """max_entries > 1 persists one executable per shape (the serve bucket
    ladder), then falls back to jit past the budget."""
    d = str(tmp_path / "aot")
    lazy = AotLazy(jax.jit(lambda x: x + 1), "inc", d, max_entries=2)
    np.testing.assert_allclose(np.asarray(lazy(jnp.zeros((1,)))), 1.0)
    np.testing.assert_allclose(np.asarray(lazy(jnp.zeros((2,)))), 1.0)
    np.testing.assert_allclose(np.asarray(lazy(jnp.zeros((4,)))), 1.0)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2


def test_trainer_aot_samplers(tmp_path, monkeypatch):
    """With TERRAIN_AOT set, the jitted samplers (serve/gen/interp paths)
    are store-backed too, one entry per bucket shape."""
    from tests.test_trainer import tiny_model

    d = str(tmp_path / "aot")
    monkeypatch.setenv("TERRAIN_AOT", d)
    m = tiny_model()
    assert isinstance(m._two_stage_det, AotLazy)
    for n in (1, 2):
        Z = m._sample_z(n)
        a, b = m._two_stage_det(m.params["dcgan_gen"], m.states["dcgan_gen"],
                                m.params["p2p_gen"], m.states["p2p_gen"], Z)
        assert a.shape[0] == n and np.isfinite(np.asarray(a)).all()
    two_stage = [p for p in os.listdir(d) if "_two_stage_det" in p]
    assert len(two_stage) == 2
