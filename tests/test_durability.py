"""Durable table_root catalog (round 12, COVERAGE.md "Durability").

A directory of parquet as a lightweight catalog: plain CTAS persists,
TEMP/VIEW stay session-scoped, a FRESH Executor on the same root
re-resolves stored tables by name, DROP removes storage.
"""
import os

import pytest

import framequery_spark as fq
from framequery_spark.compiler.expressions import CompileError


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "warehouse")


def _executor(spark, root, **scope):
    import pandas as pd

    base = {"src": spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2, 3], "v": [10, 20, 30]}))}
    base.update(scope)
    return fq.Executor(scope=base, spark=spark, table_root=root)


def test_ctas_roundtrip_fresh_session(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TABLE kept AS SELECT id, v * 2 AS v2 FROM src "
               "WHERE id >= 2")
    assert os.path.isdir(os.path.join(root, "kept.parquet"))
    # a FRESH executor (no scope entry for kept) re-resolves by name
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    rows = sorted(tuple(r) for r in
                  ex2.execute("SELECT * FROM kept").collect())
    assert rows == [(2, 40), (3, 60)]
    cols = ex2.execute("SELECT * FROM kept").columns
    assert cols == ["id", "v2"]


def test_temp_and_view_stay_session_scoped(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TEMP TABLE scratch AS SELECT * FROM src")
    ex.execute("CREATE VIEW lens AS SELECT id FROM src")
    assert not os.path.exists(os.path.join(root, "scratch.parquet"))
    assert not os.path.exists(os.path.join(root, "lens.parquet"))
    # visible in-session
    assert ex.execute("SELECT count(*) c FROM scratch").collect()[0].c == 3
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    with pytest.raises(CompileError, match="not found"):
        ex2.execute("SELECT * FROM scratch")


def test_or_replace_and_if_not_exists_against_stored(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TABLE t1 AS SELECT 1 AS a")
    # a fresh session: plain CREATE over the stored table is an error
    ex2 = _executor(spark, root)
    with pytest.raises(CompileError, match="already exists"):
        ex2.execute("CREATE TABLE t1 AS SELECT 2 AS a")
    # IF NOT EXISTS skips silently, leaving the stored contents intact
    ex2.execute("CREATE TABLE IF NOT EXISTS t1 AS SELECT 2 AS a")
    assert ex2.execute("SELECT * FROM t1").collect()[0].a == 1
    # OR REPLACE overwrites storage
    ex2.execute("CREATE OR REPLACE TABLE t1 AS SELECT 3 AS a")
    ex3 = fq.Executor(scope={}, spark=spark, table_root=root)
    assert ex3.execute("SELECT * FROM t1").collect()[0].a == 3


def test_drop_removes_storage(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TABLE gone AS SELECT 1 AS a")
    path = os.path.join(root, "gone.parquet")
    assert os.path.isdir(path)
    ex.execute("DROP TABLE gone")
    assert not os.path.exists(path)
    # and a fresh session no longer resolves it
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    with pytest.raises(CompileError, match="not found"):
        ex2.execute("SELECT * FROM gone")
    # DROP of a stored-only table (never in this session's scope) works
    ex.execute("CREATE TABLE gone2 AS SELECT 1 AS a")
    ex3 = fq.Executor(scope={}, spark=spark, table_root=root)
    ex3.execute("DROP TABLE gone2")
    assert not os.path.exists(os.path.join(root, "gone2.parquet"))


def test_set_option_root_and_dotted_names(spark, root):
    ex = _executor(spark, None)  # no constructor root
    ex.execute(f"SET framequery.table_root TO '{root}'")
    ex.execute("CREATE TABLE mart.daily AS SELECT id FROM src")
    assert os.path.isdir(os.path.join(root, "mart", "daily.parquet"))
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    assert ex2.execute("SELECT count(*) c FROM mart.daily") \
        .collect()[0].c == 3


def test_traversal_rejected(spark, root):
    ex = _executor(spark, root)
    with pytest.raises(Exception, match="invalid durable table name"):
        ex._durable_path("../escape")


def test_dml_on_durable_is_session_only(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TABLE d AS SELECT id, v FROM src")
    ex.execute("UPDATE d SET v = 0 WHERE id = 1")
    assert sorted(r.v for r in ex.execute("SELECT v FROM d").collect()) \
        == [0, 20, 30]
    # stored parquet unchanged until the next CTAS (documented scope)
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    assert sorted(r.v for r in ex2.execute("SELECT v FROM d").collect()) \
        == [10, 20, 30]


def test_reresolved_scan_gets_pushdown(spark, root):
    ex = _executor(spark, root)
    ex.execute("CREATE TABLE big AS SELECT id, v, id * 100 AS w FROM src")
    ex2 = fq.Executor(scope={}, spark=spark, table_root=root)
    df = ex2.execute("SELECT id FROM big WHERE id > 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the parquet scan and unused columns are pruned
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan
    assert "ReadSchema" in plan and "w" not in plan.split("ReadSchema")[1][:60]
