"""Summarize a training run for the stability A/B write-up.

Reads results.txt (+ swd.txt if present), dedupes resumed epochs (last row
wins), and reports: epoch count, wall stats, DCGAN loss health — in
particular the dead-discriminator signature (both DCGAN losses pinned at
exactly 1.0, the LSGAN fixed point when the disc output is identically 0,
reference dcgan.py:50's hidden pre-pool rectify) — and SWD trend points.

Usage: python tools/summarize_run.py output/<name> [--json]
"""

import argparse
import json
import os
import sys


def _rows(path):
    out = {}
    with open(path) as f:
        header = f.readline().strip().split(",")
        for ln in f:
            first = ln.split(",", 1)[0]
            if not first.isdigit() or int(first) > 10 ** 6:
                continue
            parts = ln.strip().split(",")
            if len(parts) != len(header):
                continue
            out[int(first)] = parts
    return header, [out[e] for e in sorted(out)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    header, rows = _rows(os.path.join(args.run_dir, "results.txt"))
    col = {k: i for i, k in enumerate(header)}
    g = [float(r[col["train_dcgan_gen"]]) for r in rows]
    d = [float(r[col["train_dcgan_disc"]]) for r in rows]
    recon = [float(r[col["train_p2p_recon"]]) for r in rows]
    epochs = [int(r[0]) for r in rows]

    # dead-disc signature: both losses exactly 1.0 (to fp text precision)
    dead = [e for e, gv, dv in zip(epochs, g, d)
            if abs(gv - 1.0) < 1e-6 and abs(dv - 1.0) < 1e-6]
    dead_runs = []
    if dead:
        start = prev = dead[0]
        for e in dead[1:]:
            if e != prev + 1:
                dead_runs.append((start, prev))
                start = e
            prev = e
        dead_runs.append((start, prev))

    out = {
        "run": args.run_dir,
        "epochs": len(rows),
        "last_epoch": epochs[-1] if epochs else 0,
        "dcgan_gen_first_last": [round(g[0], 4), round(g[-1], 4)] if g else None,
        "dcgan_disc_first_last": [round(d[0], 4), round(d[-1], 4)] if d else None,
        "p2p_recon_first_last": [round(recon[0], 4), round(recon[-1], 4)] if recon else None,
        "dead_disc_epochs": len(dead),
        "dead_disc_spans": dead_runs[:5],
        "healthy": not dead_runs or (dead_runs[-1][1] - dead_runs[-1][0]) < 5,
    }

    swd_path = os.path.join(args.run_dir, "swd.txt")
    if os.path.exists(swd_path):
        sh, srows = _rows(swd_path)
        scol = {k: i for i, k in enumerate(sh)}
        for key in ("swd_mean", "p2p_swd_mean"):
            if key in scol:
                vals = [(int(r[0]), float(r[scol[key]])) for r in srows]
                pts = [vals[0], vals[len(vals) // 4], vals[len(vals) // 2],
                       vals[3 * len(vals) // 4], vals[-1]]
                out[key + "_trend"] = [[e, round(v, 4)] for e, v in pts]

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
