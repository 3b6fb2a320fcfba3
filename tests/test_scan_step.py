"""The scanned k-steps-per-dispatch path must be numerically identical to
the per-step path: same params, same losses, same RNG stream (the scan
amortizes per-dispatch overhead; it must not change training).
See terrain_tpu/train/step.py build_scan_step."""

import os

import jax
import numpy as np
import pytest

from terrain_tpu.data import DeviceDataset
from terrain_tpu.data.synthetic import make_pairs

from tests.test_trainer import IN, tiny_model


def _device_data(n=8):
    x, y = make_pairs(n, IN, seed=0)
    xv, yv = make_pairs(4, IN, seed=1)
    return DeviceDataset(x, y), DeviceDataset(xv, yv)


def test_scan_matches_per_step():
    """One scan chunk == k back-to-back per-step calls on the SAME inputs.

    Compared immediately after k=3 steps (not through epochs of chaotic GAN
    training, where XLA fusion-order fp differences amplify): a semantic
    bug in batch/rng threading would show as O(1) divergence, far above
    the reassociation-level tolerance used here."""
    k, bs = 3, 4
    m = tiny_model(seed=3)
    tr, _ = _device_data()
    tr_step, _ = m._get_cache_steps(tr)
    tr_scan, _ = m._get_scan_steps(tr, k)

    rnd = np.random.RandomState(0)
    zs = rnd.rand(k, bs, m.latent_dim).astype(np.float32)
    idxs = rnd.randint(0, tr.N, size=(k, bs)).astype(np.int32)
    rngs = np.stack([np.asarray(jax.random.fold_in(m._base_key, t))
                     for t in range(1, k + 1)])
    lr = np.float32(1e-4)

    import copy
    p1, s1, o1 = (copy.deepcopy(jax.device_get(t))
                  for t in (m.params, m.states, m.opt_states))
    losses1 = []
    for t in range(k):
        p1, s1, o1, l_t = tr_step(p1, s1, o1, (zs[t], idxs[t]),
                                  rngs[t], lr)
        losses1.append(jax.device_get(l_t))

    pk, sk, ok = (copy.deepcopy(jax.device_get(t))
                  for t in (m.params, m.states, m.opt_states))
    pk, sk, ok, lk = tr_scan(pk, sk, ok, (zs, idxs), rngs, lr)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(sk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    lk = jax.device_get(lk)
    for t in range(k):
        for key in lk:
            np.testing.assert_allclose(losses1[t][key], lk[key][t],
                                       rtol=1e-5, atol=1e-6)


def test_scan_epoch_csv_close_to_per_step(monkeypatch, tmp_path):
    """Full trainer epochs through the scan path stay close to the per-step
    path (loose tolerance: compilation differences reassociate fp math)."""
    rows = {}
    for scan in (1, 2):
        monkeypatch.setenv("TERRAIN_SCAN", str(scan))
        np.random.seed(42)  # the prior sampler draws from the global stream
        m = tiny_model(seed=3)
        tr, va = _device_data()
        out = str(tmp_path / f"out{scan}")
        m.train(tr, va, batch_size=4, num_epochs=1, out_dir=out,
                model_dir=str(tmp_path / f"mdl{scan}"), save_every=10)
        rows[scan] = [ln for ln in open(os.path.join(out, "results.txt"))
                      if ln[:1].isdigit()]
    for r1, rk in zip(rows[1], rows[2]):
        v1 = [float(v) for v in r1.split(",")[1:-2]]
        vk = [float(v) for v in rk.split(",")[1:-2]]
        np.testing.assert_allclose(v1, vk, rtol=5e-3, atol=1e-4)


def test_scan_k_resolution():
    from terrain_tpu.train.trainer import TwoStageGAN

    os.environ["TERRAIN_SCAN"] = "15"
    try:
        assert TwoStageGAN._scan_k(60) == 15
        assert TwoStageGAN._scan_k(59) == 1   # 59 prime -> no divisor <= 15
        assert TwoStageGAN._scan_k(14) == 14  # clamp to n_steps, 14 % 14 == 0
        assert TwoStageGAN._scan_k(1) == 1
    finally:
        del os.environ["TERRAIN_SCAN"]
    assert TwoStageGAN._scan_k(60) == 1  # knob unset -> per-step


def test_scan_rng_stream_matches_next_rng():
    m = tiny_model(seed=5)
    seq = [np.asarray(m._next_rng()) for _ in range(4)]
    m2 = tiny_model(seed=5)
    stacked = np.asarray(m2._fold_keys(m2._base_key, np.arange(1, 5)))
    np.testing.assert_array_equal(np.stack(seq), stacked)
