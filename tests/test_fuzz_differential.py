"""Seeded randomized differential fuzzing: engine vs DuckDB.

The hand-curated pg-corpus and the 153-construct gap sweep pass clean —
the remaining dialect bugs are the ones nobody wrote down. This module
generates grammar-directed random queries (nested subqueries x window
frames x set ops x CASE/CAST/string ops over deterministic fixture
tables), runs each on BOTH the engine and DuckDB, and compares
order-insensitive values. The generator emits only dialect-COMMON SQL
(both engines must accept the text unmodified), so any mismatch is a
semantics divergence, not a syntax one.

Determinism: a fixed seed generates the same query corpus every run
(FQ_FUZZ_SEED / FQ_FUZZ_N env vars widen the sweep locally). Any
divergence the fuzzer ever finds must land as a named regression test —
KNOWN_DIVERGENCES documents (and xfails) the accepted dialect gaps.

Generator ground rules that keep the corpus comparable:
- LIMIT only under ORDER BY on the unique non-null `id` (Spark sorts
  NULLS FIRST by default, DuckDB NULLS LAST — never let NULL ordering
  decide which rows a LIMIT keeps);
- sum()/window-sum() always CAST to BIGINT (DuckDB widens to HUGEINT,
  which does not round-trip the driver's Arrow hash);
- no division (divide-by-zero / int-vs-float division semantics),
  no avg (float accumulation order), ints small enough that ANSI-mode
  Spark can never overflow;
- row_number only over the unique key; rank/dense_rank may take tied
  keys (tie values are still deterministic).
"""
from __future__ import annotations

import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .test_conformance import _sorted_rows, _values_equal  # noqa: E402

SEED = int(os.environ.get("FQ_FUZZ_SEED", "20260816"))
N_QUERIES = int(os.environ.get("FQ_FUZZ_N", "150"))

# query index -> reason; accepted dialect divergences are xfailed by name
# so a new hit is loud. Currently empty: every generated construct agrees.
KNOWN_DIVERGENCES: dict = {}


# --------------------------------------------------------------- fixtures


def _fixture_frames():
    import pandas as pd

    rng = random.Random(987)
    words = ["alpha", "beta", "gamma", "delta", "Echo", "fox", "GOLF",
             "hotel", "india", ""]
    n1 = 40
    t1 = pd.DataFrame({
        "id": list(range(n1)),
        "a": [None if i % 7 == 3 else (i * 13) % 29 for i in range(n1)],
        "b": [i % 5 for i in range(n1)],
        "e": [(i * 7) % 50 for i in range(n1)],
        "d": [round(((i * 3) % 16) * 0.25, 2) for i in range(n1)],
        "s": [None if i % 11 == 5 else words[(i * 3) % len(words)]
              for i in range(n1)],
    })
    t1["a"] = t1["a"].astype("Int64")
    n2 = 15
    t2 = pd.DataFrame({
        "id": list(range(n2)),
        "b": [i % 5 for i in range(n2)],
        "v": [(i * 11) % 40 for i in range(n2)],
        "w": [words[(i * 5 + 1) % len(words)] for i in range(n2)],
    })
    n3 = 24
    t3 = pd.DataFrame({
        "id": list(range(n3)),
        "dt": pd.to_datetime(
            [f"2024-{(i % 12) + 1:02d}-{(i * 5) % 27 + 1:02d}"
             for i in range(n3)]).date,
        "ts": pd.to_datetime(
            [f"2024-03-{(i % 27) + 1:02d} "
             f"{(i * 7) % 24:02d}:{(i * 13) % 60:02d}:00"
             for i in range(n3)]),
        "b": [i % 5 for i in range(n3)],
    })
    rng.shuffle  # (rng reserved for future fixture variants)
    return {"t1": t1, "t2": t2, "t3": t3}


@pytest.fixture(scope="module")
def fuzz_env(spark):
    import duckdb

    frames = _fixture_frames()
    scope = {}
    for name, pdf in frames.items():
        sdf = spark.createDataFrame(pdf)
        scope[name] = sdf
    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    return scope, con


# --------------------------------------------------------------- generator


class Gen:
    """Grammar-directed random query generator. Every production emits SQL
    both engines parse; every query is deterministic given the seed."""

    INT_COLS_T1 = ["id", "b", "e"]           # non-null ints
    NULLABLE_INT_T1 = ["a"]
    STR_COLS_T1 = ["s"]

    def __init__(self, rng: random.Random):
        self.r = rng

    # -- scalar int expressions over t1 (optionally qualified) ------------
    def int_expr(self, depth=0, q=""):
        r = self.r
        col = lambda: q + r.choice(self.INT_COLS_T1)
        if depth >= 2:
            return col() if r.random() < 0.7 else str(r.randint(0, 9))
        pick = r.random()
        if pick < 0.35:
            return col()
        if pick < 0.45:
            return str(r.randint(0, 20))
        if pick < 0.60:
            op = r.choice(["+", "-", "*"])
            return f"({self.int_expr(depth + 1, q)} {op} {self.int_expr(depth + 1, q)})"
        if pick < 0.70:
            return f"abs({self.int_expr(depth + 1, q)} - {r.randint(0, 30)})"
        if pick < 0.76:
            fn = r.choice(["least", "greatest"])
            return f"{fn}({self.int_expr(depth + 1, q)}, {self.int_expr(depth + 1, q)})"
        if pick < 0.80:
            inner = self.int_expr(depth + 1, q)
            return r.choice([
                f"CAST(floor({inner} + 0.25) AS BIGINT)",
                f"CAST(ceil({inner} - 0.75) AS BIGINT)",
                f"CAST(round({inner} * 0.25) AS BIGINT)",
                f"mod({inner}, {r.randint(1, 9)})",
                f"CAST(sign({inner} - 10) AS BIGINT)",
            ])
        if pick < 0.87:
            return (f"(CASE WHEN {self.cond(depth + 1, q)} "
                    f"THEN {self.int_expr(depth + 1, q)} "
                    f"ELSE {self.int_expr(depth + 1, q)} END)")
        if pick < 0.94:
            return (f"coalesce(nullif({q}b, {self.r.randint(0, 4)}), "
                    f"{self.int_expr(depth + 1, q)})")
        return f"coalesce({q}a, {self.int_expr(depth + 1, q)})"

    def str_expr(self, depth=0, q=""):
        r = self.r
        pick = r.random()
        if pick < 0.4 or depth >= 2:
            return q + "s"
        if pick < 0.52:
            return f"upper({self.str_expr(depth + 1, q)})"
        if pick < 0.62:
            return f"lower({self.str_expr(depth + 1, q)})"
        if pick < 0.74:
            return f"substr({self.str_expr(depth + 1, q)}, 1, {r.randint(1, 4)})"
        if pick < 0.82:
            return (f"replace({self.str_expr(depth + 1, q)}, "
                    f"'{r.choice(['a', 'e', 'o'])}', "
                    f"'{r.choice(['X', '', '01'])}')")
        if pick < 0.90:
            return (f"lpad({self.str_expr(depth + 1, q)}, "
                    f"{r.randint(3, 8)}, '{r.choice(['.', '-0'])}')")
        return f"({self.str_expr(depth + 1, q)} || '{r.choice(['x', '_z', 'Q'])}')"

    def cond(self, depth=0, q=""):
        r = self.r
        pick = r.random()
        if depth >= 3 or pick < 0.30:
            op = r.choice(["=", "<>", "<", "<=", ">", ">="])
            return f"{self.int_expr(depth + 1, q)} {op} {self.int_expr(depth + 1, q)}"
        if pick < 0.40:
            return f"{q}a IS {r.choice(['', 'NOT '])}NULL"
        if pick < 0.50:
            # 3-valued-logic edge on purpose: a NULL in the IN/NOT IN list
            # makes non-matches UNKNOWN — the classic dialect divergence
            vals = [str(r.randint(0, 10)) for _ in range(r.randint(2, 4))]
            if r.random() < 0.25:
                vals.append("NULL")
            neg = "NOT " if r.random() < 0.3 else ""
            col = r.choice(["b", "a"])
            return f"{q}{col} {neg}IN ({', '.join(vals)})"
        if pick < 0.60:
            lo = r.randint(0, 15)
            return f"{q}e BETWEEN {lo} AND {lo + r.randint(0, 20)}"
        if pick < 0.70:
            pat = r.choice(["a%", "%a%", "_e%", "%o"])
            return f"{self.str_expr(depth + 1, q)} LIKE '{pat}'"
        if pick < 0.85:
            j = r.choice(["AND", "OR"])
            return f"({self.cond(depth + 1, q)} {j} {self.cond(depth + 1, q)})"
        return f"NOT ({self.cond(depth + 1, q)})"

    # -- query productions -------------------------------------------------
    def q_project(self):
        r = self.r
        items = [f"{self.int_expr()} AS c{i}" for i in range(r.randint(1, 3))]
        if r.random() < 0.5:
            items.append(f"{self.str_expr()} AS cs")
        items.append("id")
        sql = f"SELECT {', '.join(items)} FROM t1 WHERE {self.cond()}"
        if r.random() < 0.5:
            if r.random() < 0.3:
                # explicit NULLS placement under LIMIT, tie-broken by the
                # unique id so the kept prefix is deterministic
                nd = r.choice(["a ASC NULLS FIRST", "a ASC NULLS LAST",
                               "a DESC NULLS FIRST", "a DESC NULLS LAST"])
                sql += f" ORDER BY {nd}, id LIMIT {r.randint(1, 20)}"
            else:
                sql += f" ORDER BY id LIMIT {r.randint(1, 20)}"
        return sql

    def q_agg(self):
        r = self.r
        key = r.choice(["b", "b, s", "s"])
        aggs = ["CAST(count(*) AS BIGINT) AS n",
                f"CAST(sum({self.int_expr()}) AS BIGINT) AS se",
                "min(a) AS mn", "max(e) AS mx"]
        if r.random() < 0.4:
            aggs.append("CAST(count(DISTINCT b) AS BIGINT) AS nd")
        having = (f" HAVING count(*) > {r.randint(0, 3)}"
                  if r.random() < 0.5 else "")
        where = f" WHERE {self.cond()}" if r.random() < 0.7 else ""
        return (f"SELECT {key}, {', '.join(aggs)} FROM t1{where} "
                f"GROUP BY {key}{having}")

    def q_join(self):
        r = self.r
        kind = r.choice(["JOIN", "LEFT JOIN", "INNER JOIN"])
        cond = f" WHERE {self.cond(q='t1.')}" if r.random() < 0.6 else ""
        cols = ("t1.id AS i1, t2.id AS i2, t2.v AS v, "
                f"{self.int_expr(q='t1.')} AS x")
        return (f"SELECT {cols} FROM t1 {kind} t2 ON t1.b = t2.b{cond}")

    def q_setop(self):
        r = self.r
        op = r.choice(["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
                       "EXCEPT", "EXCEPT ALL"])
        a = f"SELECT b, e FROM t1 WHERE {self.cond()}"
        b = f"SELECT b, v FROM t2 WHERE {self.cond_t2()}"
        return f"SELECT * FROM ({a} {op} {b}) u"

    def cond_t2(self):
        r = self.r
        op = r.choice(["=", "<", ">", "<=", ">="])
        return f"v {op} {r.randint(0, 40)}"

    def q_subquery(self):
        r = self.r
        pick = r.random()
        if pick < 0.35:
            return (f"SELECT id, b, e FROM t1 WHERE b IN "
                    f"(SELECT b FROM t2 WHERE {self.cond_t2()})")
        if pick < 0.60:
            return (f"SELECT id, e, (SELECT CAST(max(v) AS BIGINT) FROM t2 "
                    f"WHERE t2.b = t1.b) AS mv FROM t1 WHERE {self.cond()}")
        if pick < 0.80:
            return (f"SELECT id, b FROM t1 WHERE EXISTS "
                    f"(SELECT 1 FROM t2 WHERE t2.b = t1.b AND {self.cond_t2()})")
        return (f"SELECT id, b FROM t1 WHERE NOT EXISTS "
                f"(SELECT 1 FROM t2 WHERE t2.b = t1.b AND {self.cond_t2()})")

    def q_window(self):
        r = self.r
        pick = r.random()
        if pick < 0.20:
            return ("SELECT id, ROW_NUMBER() OVER (PARTITION BY b ORDER BY id) "
                    f"AS rn FROM t1 WHERE {self.cond()}")
        if pick < 0.35:
            fn = r.choice(["RANK()", "DENSE_RANK()"])
            return (f"SELECT id, {fn} OVER (ORDER BY b) AS rk FROM t1 "
                    f"WHERE {self.cond()}")
        if pick < 0.50:
            off = r.randint(1, 3)
            return (f"SELECT id, lag(e, {off}) OVER (ORDER BY id) AS lg, "
                    f"lead(e, {off}) OVER (ORDER BY id) AS ld, "
                    "first_value(e) OVER (PARTITION BY b ORDER BY id) AS fv "
                    f"FROM t1 WHERE {self.cond()}")
        if pick < 0.62:
            return (f"SELECT id, ntile({r.randint(2, 5)}) "
                    "OVER (ORDER BY id) AS nt FROM t1")
        if pick < 0.80:
            # RANGE frame over a TIED key: peers are included, so the sum
            # is deterministic despite ties
            n = r.randint(1, 10)
            return (f"SELECT id, CAST(SUM(e) OVER (ORDER BY b RANGE "
                    f"BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT) "
                    "AS rs FROM t1")
        n = r.randint(1, 4)
        return (f"SELECT id, CAST(SUM(e) OVER (ORDER BY id ROWS BETWEEN "
                f"{n} PRECEDING AND CURRENT ROW) AS BIGINT) AS ws FROM t1")

    def q_distinct_on(self):
        r = self.r
        d = "DESC" if r.random() < 0.5 else "ASC"
        return (f"SELECT DISTINCT ON (b) b, id, e FROM t1 "
                f"WHERE {self.cond()} ORDER BY b, id {d}")

    def q_grouping_sets(self):
        r = self.r
        pick = r.random()
        aggs = ("CAST(count(*) AS BIGINT) AS n, "
                "CAST(sum(e) AS BIGINT) AS se")
        if pick < 0.5:
            return (f"SELECT b, {aggs} FROM t1 WHERE {self.cond()} "
                    "GROUP BY GROUPING SETS ((b), ())")
        return (f"SELECT b, grouping(b) AS g, {aggs} FROM t1 "
                f"GROUP BY ROLLUP (b)")

    def q_filter_agg(self):
        return ("SELECT b, CAST(count(*) FILTER "
                f"(WHERE {self.cond()}) AS BIGINT) AS cf, "
                f"CAST(count(*) FILTER (WHERE {self.cond()}) AS BIGINT) "
                "AS cg FROM t1 GROUP BY b")

    def q_fetch_first(self):
        r = self.r
        return (f"SELECT id, e FROM t1 WHERE {self.cond()} ORDER BY id "
                f"FETCH FIRST {r.randint(1, 15)} ROWS ONLY")

    def q_agg_over_join(self):
        r = self.r
        return (
            "SELECT t2.w AS w, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum({self.int_expr(q='t1.')}) AS BIGINT) AS s, "
            "min(t2.v) AS mv "
            f"FROM t1 JOIN t2 ON t1.b = t2.b WHERE {self.cond(q='t1.')} "
            f"GROUP BY t2.w HAVING count(*) > {r.randint(0, 5)}")

    def q_from_subquery(self):
        r = self.r
        inner = (f"SELECT b, CAST(sum(e) AS BIGINT) AS se, "
                 f"CAST(count(*) AS BIGINT) AS n FROM t1 "
                 f"WHERE {self.cond()} GROUP BY b")
        op = r.choice(["se > n * 2", "n >= 2", "se + n < 100"])
        return (f"SELECT u.b, u.se, u.n FROM ({inner}) u WHERE {op}")

    def q_lateral(self):
        r = self.r
        if r.random() < 0.5:
            agg = r.choice(["max(v)", "min(v)", "CAST(count(*) AS BIGINT)",
                            "CAST(sum(v) AS BIGINT)"])
            # NO extra inner filter: DuckDB 1.0 DROPS outer rows whose
            # LATERAL-aggregate group is empty, deviating from pg (which
            # emits one row with NULL — the engine follows pg; pinned by
            # test_lateral_aggregate_empty_group_matches_pg in
            # tests/test_execute.py). t1.b and t2.b share the 0..4 domain,
            # so the bare correlation below never produces an empty group
            # and both engines agree.
            return (f"SELECT t1.id, l.mv FROM t1, LATERAL "
                    f"(SELECT {agg} AS mv FROM t2 WHERE t2.b = t1.b) l")
        n = r.randint(1, 3)
        d = r.choice(["ASC", "DESC"])
        return (f"SELECT t1.id, l.v, l.i2 FROM t1 CROSS JOIN LATERAL "
                f"(SELECT v, id AS i2 FROM t2 WHERE t2.b = t1.b "
                f"ORDER BY v {d}, id LIMIT {n}) l")

    def q_dates(self):
        r = self.r
        pick = r.random()
        if pick < 0.20:
            # pg returns TIMESTAMP from date_trunc(date) — our engine
            # matches pg, DuckDB returns DATE; CAST aligns the compare
            unit = r.choice(["month", "year", "quarter", "week"])
            return (f"SELECT id, CAST(date_trunc('{unit}', dt) AS DATE) "
                    "AS tr FROM t3")
        if pick < 0.38:
            f1, f2 = r.sample(["year", "month", "day", "quarter"], 2)
            return (f"SELECT id, CAST(extract({f1} FROM dt) AS BIGINT) "
                    f"AS f1, CAST(extract({f2} FROM dt) AS BIGINT) AS f2 "
                    "FROM t3")
        if pick < 0.52:
            off = r.randint(1, 400)
            return (f"SELECT id, dt + {off} AS fwd, dt - {off} AS back, "
                    "dt - DATE '2024-01-01' AS since FROM t3")
        if pick < 0.66:
            lo = f"2024-{r.randint(1, 6):02d}-{r.randint(1, 28):02d}"
            hi = f"2024-{r.randint(7, 12):02d}-{r.randint(1, 28):02d}"
            return (f"SELECT id, dt FROM t3 WHERE dt BETWEEN "
                    f"DATE '{lo}' AND DATE '{hi}'")
        if pick < 0.80:
            return ("SELECT CAST(date_trunc('month', dt) AS DATE) AS m, "
                    "CAST(count(*) AS BIGINT) AS n, min(dt) AS mn, "
                    "max(dt) AS mx FROM t3 "
                    "GROUP BY CAST(date_trunc('month', dt) AS DATE)")
        if pick < 0.90:
            mins = r.choice([30, 90, 150])
            return (f"SELECT id, ts + INTERVAL '{mins} minutes' AS t2, "
                    "CAST(extract(hour FROM ts) AS BIGINT) AS hh FROM t3")
        return ("SELECT id, last_day(dt) AS ld, "
                "CAST(date_part('doy', dt) AS BIGINT) AS doy, "
                "CAST(dt AS VARCHAR) AS s FROM t3")

    def q_nested_subquery(self):
        # depth-2: IN over a FROM-subquery aggregate
        return (
            "SELECT id, b FROM t1 WHERE b IN ("
            "SELECT b FROM (SELECT b, CAST(count(*) AS BIGINT) AS n "
            f"FROM t2 WHERE {self.cond_t2()} GROUP BY b) g "
            f"WHERE n >= {self.r.randint(1, 3)})")

    def q_cte(self):
        r = self.r
        inner = r.choice([self.q_agg, self.q_subquery])()
        return (f"WITH c AS ({inner}) SELECT CAST(count(*) AS BIGINT) AS n "
                f"FROM c")

    def q_distinct(self):
        return f"SELECT DISTINCT b, {self.int_expr()} AS x FROM t1 WHERE {self.cond()}"

    def query(self):
        return self.r.choice([
            self.q_project, self.q_agg, self.q_join, self.q_setop,
            self.q_subquery, self.q_window, self.q_cte, self.q_distinct,
            self.q_distinct_on, self.q_grouping_sets, self.q_filter_agg,
            self.q_fetch_first, self.q_agg_over_join, self.q_from_subquery,
            self.q_nested_subquery, self.q_lateral, self.q_dates,
        ])()


def _corpus():
    rng = random.Random(SEED)
    g = Gen(rng)
    return [(i, g.query()) for i in range(N_QUERIES)]


# --------------------------------------------------------------- the test


@pytest.mark.parametrize("idx,sql", _corpus(),
                         ids=[f"fuzz{i:03d}" for i, _ in _corpus()])
def test_fuzz_query_matches_duckdb(spark, fuzz_env, idx, sql):
    if idx in KNOWN_DIVERGENCES:
        pytest.xfail(KNOWN_DIVERGENCES[idx])
    import framequery_spark as fq

    scope, con = fuzz_env
    sdf = fq.execute(sql, scope, spark=spark)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = _sorted_rows([tuple(r) for r in sdf.collect()])

    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = _sorted_rows(res.fetchall())

    assert spark_cols == duck_cols, (
        f"fuzz{idx}: column mismatch {spark_cols} vs {duck_cols}\nSQL: {sql}")
    assert len(spark_rows) == len(duck_rows), (
        f"fuzz{idx}: row count {len(spark_rows)} vs {len(duck_rows)}\n"
        f"SQL: {sql}")
    for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
        for a, b in zip(sr, dr):
            assert _values_equal(a, b), (
                f"fuzz{idx}: row {i} differs: {sr} vs {dr}\nSQL: {sql}")
