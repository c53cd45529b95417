"""DBAPI shim tests (reference model: tests/test__alchemy.py)."""

import json
import os

import pandas as pd
import pytest

from framequery_spark.alchemy import connect, escape


@pytest.fixture()
def conn(spark, tmp_path):
    # scope spec file with setup statements (reference scope.json shape)
    csv = tmp_path / "test.csv"
    pd.DataFrame({"g": [0, 0, 0, 1, 1, 2], "i": [1, 2, 3, 4, 5, 6],
                  "f": [7.0, 8.0, 9.0, 0.0, 1.0, 2.0]}).to_csv(
        csv, sep=";", index=False)
    spec = tmp_path / "scope.json"
    spec.write_text(json.dumps({
        "setup": [f"COPY foo FROM '{csv}' WITH (delimiter ';', format 'csv')"],
    }))
    c = connect(scope_spec=str(spec), spark=spark)
    yield c
    c.close()


def test_cursor_roundtrip(conn):
    cur = conn.cursor()
    cur.execute("SELECT g, sum(f) AS total FROM foo GROUP BY g ORDER BY g")
    assert cur.description[0][0] == "g"
    assert cur.description[1][0] == "total"
    assert cur.fetchall() == [(0, 24.0), (1, 1.0), (2, 2.0)]


def test_fetch_modes(conn):
    cur = conn.cursor()
    cur.execute("SELECT i FROM foo ORDER BY i")
    assert cur.fetchone() == (1,)
    assert cur.fetchmany(2) == [(2,), (3,)]
    assert cur.fetchall() == [(4,), (5,), (6,)]
    assert cur.fetchone() is None


def test_pyformat_params(conn):
    cur = conn.cursor()
    cur.execute("SELECT count(*) AS n FROM foo WHERE g = %(g)s AND f > %(f)s",
                {"g": 0, "f": 7.5})
    assert cur.fetchall() == [(2,)]


def test_param_escaping_quotes(conn):
    cur = conn.cursor()
    cur.execute("SELECT %(v)s AS s", {"v": "it's"})
    assert cur.fetchall() == [("it's",)]


def test_escape_values():
    assert escape(None) == "NULL"
    assert escape(True) == "TRUE"
    assert escape(42) == "42"
    assert escape(-42.0) == "-42.0"
    assert escape("bar'baz") == "'bar''baz'"


def test_ddl_and_introspection(conn):
    cur = conn.cursor()
    cur.execute("CREATE TABLE bar AS SELECT g, i FROM foo WHERE g = 0")
    assert cur.description is None
    assert conn.table_names() == ["bar", "foo"]
    cur.execute("SELECT count(*) AS n FROM bar")
    assert cur.fetchall() == [(3,)]
    cur.execute("DROP TABLE bar")
    assert conn.table_names() == ["foo"]


def test_copy_to_roundtrip(conn, tmp_path):
    out = tmp_path / "out.csv"
    cur = conn.cursor()
    cur.execute(f"COPY foo TO '{out}' WITH (delimiter ';')")
    assert out.exists()
    df = pd.read_csv(out, sep=";")
    assert len(df) == 6


def test_pg_introspection_queries(conn):
    cur = conn.cursor()
    cur.execute("SELECT nspname FROM pg_namespace ORDER BY nspname")
    names = [r[0] for r in cur.fetchall()]
    assert names == ["information_schema", "pg_catalog", "public"]
    cur.execute("SHOW transaction isolation level")
    assert cur.fetchone() == ("read committed",)
    cur.execute("SELECT version() AS v")
    assert cur.fetchone()[0].startswith("PostgreSQL")


def test_copy_query_to_roundtrip(spark, tmp_path):
    import framequery_spark as fq
    import pandas as pd

    scope = {"t": spark.createDataFrame(pd.DataFrame(
        {"a": [3, 1, 2], "b": ["x", "y", "z"]}))}
    ex = fq.Executor(scope=scope, spark=spark, basepath=str(tmp_path))
    ex.execute("copy (select a, b from t where a >= 2 order by a) to 'out.csv' "
               "with (format 'csv', header 'true')")
    ex.execute("copy back from 'out.csv' with (format 'csv', header 'true')")
    got = sorted(tuple(r) for r in ex.execute("select * from back").collect())
    assert got == [(2, "z"), (3, "x")]


def test_copy_query_from_rejected(spark):
    import framequery_spark as fq

    ex = fq.Executor(scope={}, spark=spark)
    with pytest.raises(Exception, match="only TO"):
        ex.execute("copy (select 1) from 'x.csv'")


def test_dml_insert_delete_update(spark):
    import pandas as pd

    import framequery_spark as fq

    ex = fq.Executor({"t": spark.createDataFrame(pd.DataFrame(
        {"a": [1, 2, 3], "s": ["x", "y", "z"]}))}, spark=spark)
    ex.execute("INSERT INTO t VALUES (4, 'w')")
    ex.execute("INSERT INTO t (s, a) SELECT 'q', 9")
    got = sorted(map(tuple, ex.execute("select * from t").collect()))
    assert got == [(1, "x"), (2, "y"), (3, "z"), (4, "w"), (9, "q")]
    ex.execute("DELETE FROM t WHERE a >= 4")
    assert ex.execute("select count(*) as n from t").collect()[0][0] == 3
    # UPDATE: all RHS see the pre-update row (SQL semantics)
    ex.execute("UPDATE t SET s = upper(s), a = a * 10 WHERE a > 1")
    got = sorted(map(tuple, ex.execute("select * from t").collect()))
    assert got == [(1, "x"), (20, "Y"), (30, "Z")]
    ex.execute("DELETE FROM t")
    assert ex.execute("select count(*) as n from t").collect()[0][0] == 0


def test_create_view_and_truncate(spark):
    import pandas as pd

    import framequery_spark as fq

    ex = fq.Executor({"t": spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3]}))}, spark=spark)
    ex.execute("CREATE VIEW big AS SELECT a FROM t WHERE a > 1")
    assert sorted(r[0] for r in ex.execute("select * from big").collect()) == [2, 3]
    ex.execute("TRUNCATE TABLE t")
    assert ex.execute("select count(*) as n from t").collect()[0][0] == 0


def test_describe_statement(spark):
    import pandas as pd

    import framequery_spark as fq

    ex = fq.Executor({"t": spark.createDataFrame(
        pd.DataFrame({"a": [1], "s": ["x"]}))}, spark=spark)
    got = [tuple(r) for r in ex.execute("DESCRIBE t").collect()]
    assert got == [("a", "bigint"), ("s", "string")]


def test_dml_with_subqueries(spark):
    import pandas as pd

    import framequery_spark as fq

    ex = fq.Executor({"t": spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3, 4]})),
                      "o": spark.createDataFrame(pd.DataFrame({"a": [1, 2]}))},
                     spark=spark)
    ex.execute("DELETE FROM t WHERE a IN (SELECT a FROM o)")
    assert sorted(r[0] for r in ex.execute("select * from t").collect()) == [3, 4]
    ex.execute("UPDATE t SET a = a + (SELECT count(*) FROM o) WHERE a > 3")
    assert sorted(r[0] for r in ex.execute("select * from t").collect()) == [3, 6]
    ex.execute("DELETE FROM t WHERE EXISTS (SELECT 1 FROM o WHERE o.a + 2 = t.a)")
    assert sorted(r[0] for r in ex.execute("select * from t").collect()) == [6]


@pytest.mark.parametrize("val", ["foo", "bar'baz", 1, 4, -42.0, None,
                                 False, True])
def test_pyformat_escape_roundtrip(conn, val):
    """Port of the reference's escape round-trip matrix
    (reference: tests/test__alchemy.py:113-139): every python value binds
    through pyformat params and comes back unchanged."""
    cur = conn.cursor()
    cur.execute("SELECT %(v)s AS v", {"v": val})
    assert cur.fetchall() == [(val,)]


def test_param_with_nul_byte_rejected(conn):
    # pg text cannot hold NUL; reject at escape time, never emit a broken
    # literal into the SQL string
    from framequery_spark.alchemy.dbapi import ProgrammingError

    cur = conn.cursor()
    with pytest.raises(ProgrammingError, match="NUL"):
        cur.execute("SELECT %(v)s AS v", {"v": "a\x00b"})


def test_select_into(conn):
    # pg legacy CTAS: SELECT ... INTO t — LIMIT applies before the store
    cur = conn.cursor()
    cur.execute("SELECT i, f INTO top3 FROM foo ORDER BY f DESC LIMIT 3")
    cur.execute("SELECT count(*) AS n, round(min(f), 1) AS lo FROM top3")
    n, lo = cur.fetchone()
    assert n == 3
    cur.execute("SELECT count(*) AS n FROM foo")  # source untouched
    assert cur.fetchone()[0] == 6
