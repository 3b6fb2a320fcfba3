"""Diff two summarize_trace CSVs: where did the milliseconds move?

Built for the kernel-composition pathology (docs/RESULTS_r3.md chain P:
conv_s2 and ACT_BWD each win alone but lose combined with conv_thin) —
comparing e.g. trace_thin.csv vs trace_s2thin.csv shows which op families
grew when the kernels were combined, i.e. which inter-fusion windows the
extra custom calls broke.

Ops are matched by (family, source) because op NAMES are unstable across
compilations (fusion numbering changes); per-op rows are also listed for
the biggest movers by fuzzy name prefix.

Usage: python tools/diff_traces.py <a.csv> <b.csv> [--label-a A]
       [--label-b B] [--top 25]
"""

import argparse
import collections
import csv


def load(path):
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            r["total_ms"] = float(r["total_ms"])
            r["calls"] = int(r["calls"])
            # early round-3 CSVs predate the source/category columns
            r.setdefault("hlo_category", "")
            r.setdefault("source", "")
            rows.append(r)
    return rows


def by_key(rows, key):
    out = collections.defaultdict(float)
    for r in rows:
        out[key(r)] += r["total_ms"]
    return out


def _short(src):
    return "/".join(src.rsplit("/", 2)[-2:]) if src else "(none)"


def print_diff(title, da, db, top, la, lb):
    keys = set(da) | set(db)
    deltas = sorted(keys, key=lambda k: -abs(db.get(k, 0.0) - da.get(k, 0.0)))
    print(f"\n{title}  ({lb} - {la}, ms; + means {lb} is slower there)")
    print(f"  {'delta':>8}  {la:>9}  {lb:>9}  where")
    for k in deltas[:top]:
        a, b = da.get(k, 0.0), db.get(k, 0.0)
        if abs(b - a) < 0.02:
            break
        print(f"  {b - a:+8.2f}  {a:9.2f}  {b:9.2f}  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    ra, rb = load(args.a), load(args.b)
    ta = sum(r["total_ms"] for r in ra)
    tb = sum(r["total_ms"] for r in rb)
    print(f"{args.label_a}: {ta:.1f} ms busy ({len(ra)} ops)   "
          f"{args.label_b}: {tb:.1f} ms busy ({len(rb)} ops)   "
          f"delta {tb - ta:+.1f} ms")

    print_diff("by family", by_key(ra, lambda r: r["family"]),
               by_key(rb, lambda r: r["family"]), args.top,
               args.label_a, args.label_b)
    print_diff("by hlo_category", by_key(ra, lambda r: r["hlo_category"]),
               by_key(rb, lambda r: r["hlo_category"]), args.top,
               args.label_a, args.label_b)
    print_diff("by (family, source)",
               by_key(ra, lambda r: f"{r['family']:<26} {_short(r['source'])}"),
               by_key(rb, lambda r: f"{r['family']:<26} {_short(r['source'])}"),
               args.top, args.label_a, args.label_b)

    # fuzzy per-op: strip trailing fusion numbering
    import re

    def opkey(r):
        return re.sub(r"[.\d]+$", "", r["op"])

    print_diff("by op-name prefix", by_key(ra, opkey), by_key(rb, opkey),
               args.top, args.label_a, args.label_b)


if __name__ == "__main__":
    main()
