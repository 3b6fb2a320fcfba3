"""Checkpointing with stage-partial restore (reference pix2pix.py:158-186).

Checkpoints are gzip-pickled nested dicts of NumPy arrays, keeping the
reference's top-level layout {'dcgan': {'gen', 'disc'}, 'p2p': {'gen',
'disc'}} and the `<epoch>.model` file naming (pix2pix.py:274-275), with each
network entry holding {'params', 'state'} pytrees.  `mode` in
{'both','dcgan','p2p'} selects which stage to restore — this powers the
freeze-DCGAN / fine-tune-p2p workflow (reference experiments.py:80, 90-91).

An optional 'extra' entry can carry optimizer states / epoch / rng for exact
resume (beyond what the reference persisted).
"""

import gzip
import pickle

import jax
import numpy as np

_STAGES = {"dcgan": ("dcgan_gen", "dcgan_disc"), "p2p": ("p2p_gen", "p2p_disc")}


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_host(tree):
    """Device arrays -> numpy; non-array leaves (strs, ints, RNG-state
    tuples) pass through untouched.  Used for the 'extra' payload, which —
    unlike params/states — is not a pure array pytree."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_model(filename, params, states, extra=None):
    """params/states: dicts keyed by net name (dcgan_gen, dcgan_disc, ...)."""
    payload = {"format": "terrain_tpu/v1"}
    for stage, (g, d) in _STAGES.items():
        payload[stage] = {
            "gen": {"params": _to_numpy(params[g]), "state": _to_numpy(states[g])},
            "disc": {"params": _to_numpy(params[d]), "state": _to_numpy(states[d])},
        }
    if extra is not None:
        payload["extra"] = _to_host(extra)
    # atomic write: a crash mid-save must never leave a corrupt checkpoint
    # (SURVEY.md §5 failure-recovery; pairs with trainer resume='auto')
    tmp = f"{filename}.tmp"
    # compresslevel 1: the default (9) spent 60-90 s/checkpoint gzipping
    # ~450 MB of fp32 state on this 1-core host (measured round 2); level 1
    # is ~6x faster at ~15% larger files, same gzip format
    with gzip.open(tmp, "wb", compresslevel=1) as f:
        pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)
    import os

    os.replace(tmp, filename)


def load_model(filename, params, states, mode="both"):
    """Returns (params, states) with the selected stage(s) replaced from disk.

    The incoming trees provide structure for nets not present in the file.
    """
    assert mode in ("both", "dcgan", "p2p")
    with gzip.open(filename, "rb") as f:
        payload = pickle.load(f)
    new_params = dict(params)
    new_states = dict(states)
    stages = ("dcgan", "p2p") if mode == "both" else (mode,)
    for stage in stages:
        for role, net in zip(("gen", "disc"), _STAGES[stage]):
            entry = payload[stage][role]
            new_params[net] = jax.tree.map(np.asarray, entry["params"])
            new_states[net] = jax.tree.map(np.asarray, entry["state"])
    return new_params, new_states, payload.get("extra")


def pick_best_epoch(out_dir, model_dir, metric="swd_mean"):
    """Pick the checkpoint at the quality-best epoch from a run's swd.txt.

    The reference's own publication used the best epoch, not the last
    (README.md:48-61 publishes ~e593 out of 1000; dump_a_bakup_593ish/),
    and the repo's 512px trajectories show the same late drift (SWD best
    at e475-525, worse at e600 — docs/RESULTS_r4.md section 2b).  swd.txt
    (trainer.py:_eval_quality) already records the per-epoch trend; this
    reads it, dedupes resumed epochs (last row wins), finds the epoch
    minimizing `metric` ("swd_mean", "p2p_swd_mean", or "both" = their
    sum), and snaps to the nearest saved `<epoch>.model` in model_dir.

    Returns (path, ckpt_epoch, best_epoch, value) or None when swd.txt is
    absent/empty or no checkpoints exist (callers fall back to the
    name-based resolution).
    """
    import glob
    import os

    swd_path = os.path.join(out_dir, "swd.txt")
    if not os.path.exists(swd_path):
        return None
    rows = {}
    with open(swd_path) as f:
        header = f.readline().strip().split(",")
        for line in f:
            parts = line.strip().split(",")
            if len(parts) != len(header):
                continue  # torn row from a killed run (CLAUDE.md trap)
            try:
                rows[int(float(parts[0]))] = {
                    k: float(v) for k, v in zip(header[1:], parts[1:])}
            except ValueError:
                continue
    if not rows:
        return None

    def score(r):
        if metric == "both":
            return r.get("swd_mean", np.inf) + r.get("p2p_swd_mean", 0.0)
        return r.get(metric, np.inf)

    best_epoch = min(rows, key=lambda e: score(rows[e]))
    value = score(rows[best_epoch])
    if not np.isfinite(value):
        return None
    ckpts = {}
    for p in glob.glob(os.path.join(model_dir, "*.model")):
        try:
            ckpts[int(os.path.basename(p).split(".")[0])] = p
        except ValueError:
            continue
    if not ckpts:
        return None
    ckpt_epoch = min(ckpts, key=lambda e: (abs(e - best_epoch), -e))
    return ckpts[ckpt_epoch], ckpt_epoch, best_epoch, value
