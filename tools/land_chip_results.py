"""Merge a chip-chain JSONL (e.g. /tmp/chipo/attr_results.jsonl) into the
committed docs/artifacts_r3/attr/attr_results.jsonl.

The host VM is re-provisioned between sessions and /tmp evaporates with it
(CLAUDE.md trap; round 3 lost four queued chains this way), so chip results
must land in git PROMPTLY after each arm.  This merges append-only and
idempotently: rows whose "tag" already exists in the destination are
skipped, untagged rows are skipped (the early round-3 rows predate tags),
and the destination order is preserved.

Usage: python tools/land_chip_results.py <src.jsonl> [dst.jsonl]
"""

import json
import os
import sys


def merge(src, dst):
    have = set()
    if os.path.exists(dst):
        with open(dst) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    have.add(json.loads(ln).get("tag"))
    added = []
    with open(src) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            row = json.loads(ln)
            tag = row.get("tag")
            if tag and tag not in have:
                have.add(tag)
                added.append(ln)
    if added:
        with open(dst, "a") as f:
            f.write("\n".join(added) + "\n")
    return added


if __name__ == "__main__":
    src = sys.argv[1]
    dst = (sys.argv[2] if len(sys.argv) > 2
           else "docs/artifacts_r3/attr/attr_results.jsonl")
    added = merge(src, dst)
    print(f"landed {len(added)} new row(s) into {dst}")
    for ln in added:
        print(" ", ln)
