"""Compare two training runs' trajectories (results.txt + swd.txt).

Emits the equilibrium/health/SWD comparison table used by the
shipped-kernels quality evidence (docs/RESULTS_r4.md §2): final losses,
dead-discriminator epochs, and the SWD first -> best -> last trend per
stage.  Works on live output/<name> dirs or committed docs/artifacts_*
copies.

Usage: python tools/compare_runs.py <run_dir_a> <run_dir_b> [--label-a A]
       [--label-b B] [--json]
"""

import argparse
import json
import os


def _rows(path):
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    header = next(ln for ln in lines if not ln[:1].isdigit()).split(",")
    out = []
    for ln in lines:
        if ln[:1].isdigit() and len(ln.split(",")) == len(header):
            out.append(dict(zip(header, ln.split(","))))
    return out


def _dead_epochs(rows):
    """Reference-quirk health: LSGAN pins both dcgan losses to ~1.0 when
    the hidden pre-pool rectify zeroes the discriminator (dcgan.py:50)."""
    n = 0
    for r in rows:
        try:
            if (abs(float(r["train_dcgan_gen"]) - 1.0) < 1e-6
                    and abs(float(r["train_dcgan_disc"]) - 1.0) < 1e-6):
                n += 1
        except (KeyError, ValueError):
            pass
    return n


def _swd_trend(path):
    """swd.txt: epoch, per-level SWDs...; column count differs across
    rounds, so use the mean of the DCGAN-stage block (first half) and the
    p2p block (second half) when present."""
    if not os.path.exists(path):
        return None
    rows = []
    for ln in open(path).read().splitlines():
        if ln[:1].isdigit():
            vals = ln.split(",")
            rows.append((int(vals[0]), [float(v) for v in vals[1:]]))
    if not rows:
        return None

    def mean(vs):
        return sum(vs) / len(vs)

    half = len(rows[0][1]) // 2
    out = {}
    for name, sl in (("dcgan", slice(0, half)), ("p2p", slice(half, None))):
        pts = [(e, mean(v[sl])) for e, v in rows]
        best = min(pts, key=lambda p: p[1])
        out[name] = {"first": round(pts[0][1], 4), "first_epoch": pts[0][0],
                     "best": round(best[1], 4), "best_epoch": best[0],
                     "last": round(pts[-1][1], 4), "last_epoch": pts[-1][0]}
    return out


def summarize(run_dir):
    rows = _rows(os.path.join(run_dir, "results.txt"))
    last = rows[-1]
    keys = ("train_dcgan_gen", "train_dcgan_disc", "train_p2p_gen",
            "train_p2p_recon", "train_p2p_disc")
    return {
        "dir": run_dir,
        "epochs": len(rows),
        "final": {k: round(float(last[k]), 4) for k in keys if k in last},
        "dead_disc_epochs": _dead_epochs(rows),
        "swd": _swd_trend(os.path.join(run_dir, "swd.txt")),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--label-a", default=None)
    ap.add_argument("--label-b", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    a, b = summarize(args.run_a), summarize(args.run_b)
    a["label"] = args.label_a or args.run_a
    b["label"] = args.label_b or args.run_b
    if args.json:
        print(json.dumps({"a": a, "b": b}))
        return
    for s in (a, b):
        print(f"== {s['label']} ({s['epochs']} epochs, "
              f"dead-disc {s['dead_disc_epochs']})")
        print("   final:", ", ".join(f"{k.split('_', 1)[1]}={v}"
                                     for k, v in s["final"].items()))
        if s["swd"]:
            for stage, t in s["swd"].items():
                print(f"   swd {stage}: {t['first']} -> {t['best']} "
                      f"(e{t['best_epoch']}) -> {t['last']} "
                      f"(e{t['last_epoch']})")


if __name__ == "__main__":
    main()
