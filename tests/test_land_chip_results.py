"""tools/land_chip_results.py: append-only, tag-deduped, idempotent."""

import json
import sys

sys.path.insert(0, "tools")
from land_chip_results import merge  # noqa: E402


def test_merge_appends_new_tags_only(tmp_path):
    dst = tmp_path / "dst.jsonl"
    dst.write_text(json.dumps({"step_ms": 1.0}) + "\n"
                   + json.dumps({"tag": "a", "step_ms": 2.0}) + "\n")
    src = tmp_path / "src.jsonl"
    src.write_text(json.dumps({"tag": "a", "step_ms": 9.0}) + "\n"
                   + json.dumps({"tag": "b", "step_ms": 3.0}) + "\n"
                   + json.dumps({"step_ms": 4.0}) + "\n")  # untagged: skipped
    added = merge(str(src), str(dst))
    assert len(added) == 1 and json.loads(added[0])["tag"] == "b"
    lines = dst.read_text().strip().split("\n")
    assert len(lines) == 3
    assert json.loads(lines[1])["step_ms"] == 2.0  # existing row untouched
    # idempotent on re-run
    assert merge(str(src), str(dst)) == []
    assert len(dst.read_text().strip().split("\n")) == 3


def test_merge_into_missing_dst(tmp_path):
    src = tmp_path / "src.jsonl"
    src.write_text(json.dumps({"tag": "x"}) + "\n")
    dst = tmp_path / "new.jsonl"
    assert len(merge(str(src), str(dst))) == 1
    assert json.loads(dst.read_text())["tag"] == "x"
