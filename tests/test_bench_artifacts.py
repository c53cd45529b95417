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


def test_compact_summary_line_stays_tail_safe():
    # BENCH_r10 went unparsed because the LAST stdout line embedded
    # slowest_reps + cache_diag and overflowed the driver's ~2000-char
    # tail capture. The last line must stay parseable for any inventory
    # size: simulate a 200-entry run (with failures, long entry names)
    # and assert the rendered line stays well under the capture bound.
    import bench

    timings = {f"op_some_long_operator_name_{i:03d}": float(i % 7) + 0.123
               for i in range(200)}
    failed = [k for k in list(timings)[:50]]  # catastrophic-run worst case
    line = bench.compact_summary(
        total=1234.567, batch_s=1000.1, streaming_s=234.4,
        timings=timings, streaming_names=frozenset(list(timings)[:11]),
        floor_s=1100.2, sf_val=0.1, reps=3, failed=failed,
        ckpt_root="/dev/shm", load1_start=0.5, load1_end=12.3,
        contended=False)
    assert len(line) < 1500, (len(line), line[:200])
    rec = json.loads(line)
    assert rec["metric"] == "total_query_seconds"
    assert rec["n"] == 200 and rec["n_failed"] == 50
    assert len(rec["failed"]) <= 10
    assert "slowest_reps" not in rec and "cache_diag" not in rec
    assert "queries" not in rec


def test_per_query_brief_line_stays_tail_safe():
    # the penultimate stdout line (per-query top/movers/stall brief) must
    # fit the driver's ~2000-char tail capture TOGETHER with the compact
    # summary for any inventory size: caps at 12 slowest + 12 movers.
    import bench

    timings = {f"op_some_long_operator_name_{i:03d}": float(i % 7) + 0.123
               for i in range(200)}
    all_runs = {k: [v, v * 3.0, v] for k, v in timings.items()}
    line = bench.per_query_brief(timings, all_runs, HERE)
    assert len(line) < 1100, (len(line), line[:200])
    rec = json.loads(line)
    assert rec["metric"] == "per_query_brief"
    assert len(rec["top"]) <= 12 and len(rec["movers_vs_prev"]) <= 12
    # every rep list above was built with a 3x outlier -> all stalled
    assert rec["n_stalled"] == 200
    # missing snapshot dir must not break the line
    line2 = bench.per_query_brief(timings, {}, "/nonexistent_dir_xyz")
    rec2 = json.loads(line2)
    assert rec2["prev_snapshot"] is None and rec2["movers_vs_prev"] == {}


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
