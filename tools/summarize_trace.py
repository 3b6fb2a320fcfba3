"""Summarize a jax.profiler Chrome trace into a per-op cost table.

The reference's perf layer was cuDNN autotune (experiment.5.sh:5 —
measured kernel selection); the TPU analog is a captured device trace
driving kernel decisions.  This tool turns the trace.json.gz that
`scripts/attr_bench.py profile` captures into the table RESULTS_r3 cites:
total device time per XLA op (fusion), grouped into readable families
(conv fwd/bwd per network, copies, etc.), so "where do the milliseconds
go" has a measured answer instead of a subtraction estimate.

Usage: python tools/summarize_trace.py <trace.json.gz> [--top 40] [--csv out]
"""

import argparse
import collections
import gzip
import json
import re


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        tr = json.load(f)
    return tr["traceEvents"] if isinstance(tr, dict) else tr


def device_threads(events):
    """Map (pid, tid) -> (process_name, thread_name)."""
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    return pnames, tnames


def summarize(events, thread="XLA Ops"):
    pnames, tnames = device_threads(events)
    picked = {k for k, v in tnames.items()
              if v == thread and "TPU" in pnames.get(k[0], "")}
    per_op = collections.defaultdict(lambda: [0.0, 0])
    t_lo, t_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in picked:
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        rec = per_op[e["name"]]
        rec[0] += d
        rec[1] += 1
        t_lo = min(t_lo, e["ts"])
        t_hi = max(t_hi, e["ts"] + e.get("dur", 0))
    wall_ms = (t_hi - t_lo) / 1e3 if per_op else 0.0
    return per_op, wall_ms


FAMILIES = [
    ("convolution", re.compile(r"convolution|conv")),
    ("copy/transpose", re.compile(r"copy|transpose")),
    ("fusion (elementwise/other)", re.compile(r"fusion")),
    ("dot/matmul", re.compile(r"dot|matmul")),
    ("reduce", re.compile(r"reduce")),
    ("dynamic-slice/gather", re.compile(r"slice|gather")),
    ("rng", re.compile(r"rng")),
]


def family_of(name):
    low = name.lower()
    for fam, pat in FAMILIES:
        if pat.search(low):
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    events = load_events(args.trace)
    per_op, wall_ms = summarize(events)
    total = sum(v[0] for v in per_op.values())
    print(f"device ops: {len(per_op)} distinct, {total:.1f} ms busy, "
          f"{wall_ms:.1f} ms wall (busy frac {total / max(wall_ms, 1e-9):.2f})")

    fams = collections.defaultdict(float)
    for name, (ms, _) in per_op.items():
        fams[family_of(name)] += ms
    print("\nby family (ms, % of busy):")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"  {fam:<28} {ms:9.2f}  {100 * ms / max(total, 1e-9):5.1f}%")

    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"\ntop {args.top} ops (ms total, calls, ms/call):")
    for name, (ms, n) in rows[:args.top]:
        print(f"  {ms:9.2f} {n:6d} {ms / n:8.3f}  {name[:90]}")

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("op,total_ms,calls,ms_per_call,family\n")
            for name, (ms, n) in rows:
                f.write(f"\"{name}\",{ms:.3f},{n},{ms / n:.4f},{family_of(name)}\n")
        print(f"\nwrote {args.csv}")


if __name__ == "__main__":
    main()
