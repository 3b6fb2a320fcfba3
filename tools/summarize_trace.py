"""Summarize a jax.profiler Chrome trace into per-op cost + roofline tables.

The reference's perf layer was cuDNN autotune (experiment.5.sh:5 —
measured kernel selection); the TPU analog is a captured device trace
driving kernel decisions.  This tool turns the trace.json.gz that
`scripts/attr_bench.py profile` captures into the tables RESULTS_r3 cites:

  * total device time per XLA op (fusion), grouped into readable families;
  * per hlo_category (convolution fusion / loop fusion / copy / ...);
  * per SOURCE LINE (the trace carries `source` = the python file:line the
    op was traced from — the direct "which line of ours costs what" view);
  * a roofline table: each op's `model_flops` and `bytes_accessed` give a
    speed-of-light bound max(flops/PEAK, bytes/HBM_BW); `headroom` =
    measured − bound is the milliseconds a perfect kernel could recover,
    which is what should rank kernel work (not raw cost: a 10 ms op at its
    bound is done, a 3 ms op at 10x bound is 2.7 ms on the table).

Usage: python tools/summarize_trace.py <trace.json.gz> [--top 40] [--csv out]
"""

import argparse
import collections
import gzip
import json
import re

V5E_PEAK_FLOPS = 197e12  # bf16 FLOP/s, one v5e core
V5E_HBM_BPS = 819e9      # bytes/s


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


class OpStat:
    __slots__ = ("ms", "calls", "flops", "bytes", "source", "category")

    def __init__(self):
        self.ms = 0.0
        self.calls = 0
        self.flops = 0.0
        self.bytes = 0.0
        self.source = ""
        self.category = ""

    @property
    def bound_ms(self):
        """Speed-of-light time for the op's total flops/bytes."""
        return max(self.flops / V5E_PEAK_FLOPS,
                   self.bytes / V5E_HBM_BPS) * 1e3

    @property
    def headroom_ms(self):
        return self.ms - self.bound_ms


def summarize(events, thread="XLA Ops"):
    pnames, tnames = device_threads(events)
    picked = {k for k, v in tnames.items()
              if v == thread and "TPU" in pnames.get(k[0], "")}
    per_op = collections.defaultdict(OpStat)
    t_lo, t_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in picked:
            continue
        rec = per_op[e["name"]]
        rec.ms += e.get("dur", 0) / 1e3  # us -> ms
        rec.calls += 1
        a = e.get("args") or {}
        rec.flops += float(a.get("model_flops") or 0)
        rec.bytes += float(a.get("raw_bytes_accessed")
                           or a.get("bytes_accessed") or 0)
        if not rec.source:
            rec.source = a.get("source", "")
        if not rec.category:
            rec.category = a.get("hlo_category", "")
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


def _short_source(src):
    return "/".join(src.rsplit("/", 2)[-2:]) if src else "(none)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    events = load_events(args.trace)
    per_op, wall_ms = summarize(events)
    total = sum(v.ms for v in per_op.values())
    tot_bound = sum(v.bound_ms for v in per_op.values())
    print(f"device ops: {len(per_op)} distinct, {total:.1f} ms busy, "
          f"{wall_ms:.1f} ms wall (busy frac {total / max(wall_ms, 1e-9):.2f})")
    print(f"roofline bound of the whole program: {tot_bound:.1f} ms "
          f"({100 * tot_bound / max(total, 1e-9):.0f}% of busy = "
          "overall speed-of-light fraction)")

    fams = collections.defaultdict(float)
    for name, st in per_op.items():
        fams[family_of(name)] += st.ms
    print("\nby family (ms, % of busy):")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"  {fam:<28} {ms:9.2f}  {100 * ms / max(total, 1e-9):5.1f}%")

    cats = collections.defaultdict(float)
    for st in per_op.values():
        cats[st.category or "(none)"] += st.ms
    print("\nby hlo_category (ms, % of busy):")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28} {ms:9.2f}  {100 * ms / max(total, 1e-9):5.1f}%")

    srcs = collections.defaultdict(float)
    for st in per_op.values():
        srcs[_short_source(st.source)] += st.ms
    print(f"\ntop {args.top} source lines (ms, % of busy):")
    for src, ms in sorted(srcs.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:9.2f}  {100 * ms / max(total, 1e-9):5.1f}%  {src}")

    rows = sorted(per_op.items(), key=lambda kv: -kv[1].ms)
    print(f"\ntop {args.top} ops (ms total, calls, ms/call):")
    for name, st in rows[:args.top]:
        print(f"  {st.ms:9.2f} {st.calls:6d} {st.ms / st.calls:8.3f}  "
              f"{name[:56]:<56} {_short_source(st.source)}")

    hrows = sorted(per_op.items(), key=lambda kv: -kv[1].headroom_ms)
    print(f"\ntop {args.top} ops by roofline HEADROOM "
          "(measured - max(flops/peak, bytes/bw); rank kernel work by this):")
    print("  headroom   measured   bound  xbound  op / source")
    for name, st in hrows[:args.top]:
        if st.headroom_ms <= 0:
            break
        x = st.ms / max(st.bound_ms, 1e-9)
        print(f"  {st.headroom_ms:8.2f} {st.ms:9.2f} {st.bound_ms:8.2f} "
              f"{min(x, 999):6.1f}  {name[:44]:<44} {_short_source(st.source)}")

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("op,total_ms,calls,ms_per_call,family,hlo_category,"
                    "source,flops,bytes,bound_ms,headroom_ms\n")
            for name, st in rows:
                f.write(f"\"{name}\",{st.ms:.3f},{st.calls},"
                        f"{st.ms / st.calls:.4f},{family_of(name)},"
                        f"\"{st.category}\",\"{st.source}\","
                        f"{st.flops:.0f},{st.bytes:.0f},"
                        f"{st.bound_ms:.3f},{st.headroom_ms:.3f}\n")
        print(f"\nwrote {args.csv}")


if __name__ == "__main__":
    main()
