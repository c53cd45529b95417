"""Differential conformance: engine vs DuckDB oracle (the driver's t2 gate).

Mirrors the driver: run each __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet, then compare row count, column
names, and order-insensitive values (reference trick:
tests/test__postgres_conformance.py:303-311).
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import SF_DIR, TABLES  # noqa: E402


def _duckdb_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _sorted_rows(rows):
    return sorted(
        [tuple(_norm(v) for v in r) for r in rows],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def _queries():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, fn, o.get(name)) for name, fn in q.items()]


@pytest.mark.parametrize("name,fn,oracle", _queries(),
                         ids=[n for n, _, _ in _queries()])
def test_query_matches_oracle(spark, name, fn, oracle):
    sdf = fn(spark, SF_DIR)
    spark_rows = _sorted_rows([tuple(r) for r in sdf.collect()])
    spark_cols = [c.lower() for c in sdf.columns]

    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return

    con = _duckdb_con()
    res = con.execute(oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = _sorted_rows(res.fetchall())

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")

    # compare in driver column order: sort columns by name as the driver does
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    exact_mismatch = []
    for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
        sv = tuple(sr[j] for j in s_idx)
        dv = tuple(dr[j] for j in d_idx)
        for a, b in zip(sv, dv):
            if not _values_equal(a, b):
                assert False, f"{name}: row {i} differs: {sv} vs {dv}"
            if isinstance(a, float) and a != b and not (
                    math.isnan(a) and math.isnan(b)):
                exact_mismatch.append((i, a, b))
    # strict-hash check: floats should be bit-identical for the driver's gate
    assert not exact_mismatch, (
        f"{name}: {len(exact_mismatch)} float values differ at ulp level "
        f"(first: {exact_mismatch[0]}) — tighten rounding in the query")


# --- oracle result-type lint -------------------------------------------
#
# The driver hashes oracle values through Arrow, where DuckDB's HUGEINT
# (int128 — the type of a bare sum(BIGINT)) does NOT round-trip to the
# same representation as Spark's BIGINT, so an oracle with a bare sum()
# column hash-mismatches at the driver even when every value is equal.
# _norm above collapses int width, so the value comparison in
# test_query_matches_oracle structurally CANNOT catch this class — it cost
# red driver rows in two consecutive rounds (op_ngram_novelty r07;
# q66/q67/q70 r08). This lint closes the gap: binder-resolve every
# committed oracle and fail on any HUGEINT-family result column.

_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def _oracle_type_violations(con, sql):
    rel = con.sql(sql)  # binder-only: .types resolves without execution
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in _BANNED_ORACLE_TYPES
    ]


_ORACLE_ONLY = [(n, o) for n, _, o in _queries() if o is not None]


@pytest.mark.parametrize("name,oracle", _ORACLE_ONLY,
                         ids=[n for n, _ in _ORACLE_ONLY])
def test_oracle_has_no_hugeint_columns(name, oracle):
    con = _duckdb_con()
    bad = _oracle_type_violations(con, oracle)
    assert not bad, (
        f"{name}: oracle columns typed {bad} will hash-mismatch Spark's "
        f"BIGINT at the driver — wrap them in cast(... AS bigint)")


def test_lint_catches_bare_sum_oracle():
    # unit proof: a bare sum(BIGINT) is HUGEINT in DuckDB and must be flagged
    import duckdb

    con = duckdb.connect()
    bad = _oracle_type_violations(
        con, "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert bad == [("s", "HUGEINT")]
    ok = _oracle_type_violations(
        con, "SELECT cast(sum(x) AS bigint) AS s FROM (VALUES (1), (2)) t(x)")
    assert ok == []


# rows-only entries (no DuckDB oracle BY DESIGN) must be explicitly listed
# here; each has an exact-configuration mirror entry that IS hash-verified.
# op_ann_topk / op_ivf_topk gained seeded-determinism oracles in r08,
# op_pq_topk / op_semdedup in r09, and op_simhash_pairs in r10 (its driver
# entry now pins the md5-prefix hash so the full banded pipeline restates
# in DuckDB; the xxhash64 production hash stays the library default,
# covered by unit + plan tests). Every entry is now oracle-bearing.
ROWS_ONLY: set = set()


def test_every_entry_has_oracle_or_is_listed_rows_only():
    # guards the suite against silently dropping oracle coverage when
    # entries are edited or the driver window is rotated
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    assert q - o == ROWS_ONLY, (
        f"entries missing an oracle and not declared rows-only: "
        f"{sorted((q - o) - ROWS_ONLY)}; stale rows-only: "
        f"{sorted(ROWS_ONLY - (q - o))}")


def test_driver_window_covers_every_never_verified_entry():
    # the driver records only the first 50 entries; the rotation policy is
    # that every entry WITHOUT a green driver row from a past round must be
    # inside the current window. Entries past position 50 must either have
    # been hash-green in a previous CORRECTNESS_r*.json or be plain SQL
    # entries (which the in-repo differential below also covers).
    import glob
    import json

    import __spark_entry__ as entry

    verified = set()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        verified |= {n for n, v in rows.items()
                     if v.get("hash_match") or v.get("err") == "no_oracle"}

    names = list(entry.queries())
    outside = set(names[50:])
    never = outside - verified
    assert all(not n.startswith("op_") for n in never), (
        f"op entries never driver-verified are outside the window: "
        f"{sorted(n for n in never if n.startswith('op_'))}")
