"""Committed per-round bench artifacts must cover the full inventory.

BENCH_r*.json driver artifacts byte-truncate their recorded tail (r09
preserved only 16/179 per-entry timings), so cross-round regression
diffing needs a separately committed full per-entry snapshot:
bench.py writes bench_entries.json (untracked) on every run, and the
round close snapshots it via
``python tools/gen_bench_history.py --snapshot-entries <N>``.
"""
import glob
import json
import os
import re

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_snapshot():
    files = {}
    for path in glob.glob(os.path.join(HERE, "bench_entries_r*.json")):
        m = re.search(r"bench_entries_r(\d+)\.json$", path)
        if m:
            files[int(m.group(1))] = path
    if not files:
        return None, None
    rnd = max(files)
    return rnd, files[rnd]


def test_newest_bench_entries_snapshot_covers_full_inventory():
    rnd, path = _newest_snapshot()
    if path is None:
        pytest.skip("no bench_entries_r*.json committed yet (pre-r10)")
    with open(path) as fh:
        rec = json.load(fh)
    import __spark_entry__ as entry

    inventory = set(entry.queries())
    recorded = set(rec.get("entries", {}))
    missing = sorted(inventory - recorded)
    assert not missing, (
        f"bench_entries_r{rnd:02d}.json is stale — {len(missing)} current "
        f"inventory entries have no recorded timing (e.g. {missing[:5]}); "
        "re-run bench.py and tools/gen_bench_history.py --snapshot-entries")
    # every recorded entry carries its per-rep evidence (the stall/warm
    # attribution the medians alone cannot provide)
    bad = [k for k, v in rec["entries"].items()
           if v.get("median", -1) > 0 and not v.get("reps")]
    assert not bad, f"entries with a median but no rep list: {bad[:5]}"


def test_snapshot_tool_refuses_stale_entries(tmp_path, monkeypatch):
    # the --snapshot-entries gate must reject a bench_entries.json missing
    # current inventory entries rather than committing a hole
    import importlib
    import sys

    sys.path.insert(0, os.path.join(HERE, "tools"))
    gen = importlib.import_module("gen_bench_history")
    fake = {"sf": 0.1, "entries": {"q01_only_one": {"median": 1.0,
                                                    "reps": [1.0]}}}
    src = os.path.join(HERE, "bench_entries.json")
    existed = os.path.exists(src)
    backup = None
    if existed:
        with open(src) as fh:
            backup = fh.read()
    try:
        with open(src, "w") as fh:
            json.dump(fake, fh)
        assert gen.snapshot_entries(99) == 1
        assert not os.path.exists(
            os.path.join(HERE, "bench_entries_r99.json"))
    finally:
        if existed:
            with open(src, "w") as fh:
                fh.write(backup)
        else:
            os.remove(src)
