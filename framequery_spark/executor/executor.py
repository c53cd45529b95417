"""Public API: execute() and the persistent Executor session.

Mirrors the reference entry points (src/framequery/executor/_executor.py:37-139):
  - execute(q, scope=None, spark=None, basepath='.') — one-shot; when scope is
    None the caller's frame globals+locals are captured
    (reference behavior at src/framequery/executor/_executor.py:123-128).
  - Executor(scope, spark, basepath) — persistent scope; DDL statements
    (CREATE TABLE AS / COPY FROM / DROP TABLE) mutate it in place
    (reference: src/framequery/executor/_executor.py:417-448).

Results are lazy Spark DataFrames (the dask-model convention); `.compute()`
equivalents are `df.toPandas()` / `df.collect()`.
"""

from __future__ import annotations

import inspect
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.expressions import CompileError
from ..compiler.select import QueryCompiler
from ..parser import ast, parse

# SHOW options answered with constants so pg clients keep working
# (reference: src/framequery/executor/_executor.py:403-414)
_SHOW_OPTIONS = {
    "transaction isolation level": "read committed",
    "standard_conforming_strings": "on",
    "server_version": "9.6.0",
}


class Executor:
    """A persistent query session over a mutable table scope."""

    def __init__(self, scope: Optional[dict] = None,
                 spark: Optional[SparkSession] = None, basepath: str = ".",
                 model: Optional[str] = None):
        # `model` accepted for drop-in compatibility with the reference
        # signature (pandas/dask model selection); Spark is the only model
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.scope: Dict[str, DataFrame] = {}
        self.basepath = basepath
        self.user_functions: Dict[str, Callable] = {}
        self.table_functions: Dict[str, Callable] = {}
        self.lateral_functions: Dict[str, tuple] = {}
        # WITH RECURSIVE fixpoint cap (pg has none and can loop forever; we
        # fail fast instead — raise it for deep hierarchies)
        self.recursive_max_iterations = 100
        if scope:
            self.update(**scope)

    # ------------------------------------------------------------- scope mgmt

    def update(self, *args, **kwargs) -> None:
        """Add tables to the scope (reference Executor.update,
        src/framequery/executor/_executor.py:65-69)."""
        merged = dict(*args, **kwargs) if args else kwargs
        for name, obj in merged.items():
            self.scope[name] = self._ensure_df(obj)

    def _ensure_df(self, obj) -> DataFrame:
        if isinstance(obj, DataFrame):
            return obj
        try:
            import pandas as pd

            if isinstance(obj, pd.DataFrame):
                return self.spark.createDataFrame(obj)
        except ImportError:
            pass
        raise TypeError(f"cannot use {type(obj).__name__} as a table")

    def resolve_table(self, scope: dict, name: str) -> DataFrame:
        if name in scope:
            df = scope[name]
            if not isinstance(df, DataFrame):
                df = self._ensure_df(df)
                scope[name] = df
            return df
        # pg_catalog-prefixed lookups resolve to the bare name
        if name.startswith("pg_catalog."):
            return self.resolve_table(scope, name.split(".", 1)[1])
        if name == "pg_namespace":
            # hard-coded catalog emulation
            # (reference: src/framequery/executor/_pandas.py:103-116)
            return self.spark.createDataFrame(
                [("public", 0, None), ("pg_catalog", 0, None),
                 ("information_schema", 0, None)],
                T.StructType([
                    T.StructField("nspname", T.StringType()),
                    T.StructField("nspowner", T.IntegerType()),
                    T.StructField("nspacl", T.StringType()),
                ]),
            )
        try:
            return self.spark.table(name)
        except Exception:
            from ..compiler.expressions import CompileError

            known = ", ".join(sorted(str(k) for k in scope)[:20]) or "(empty)"
            raise CompileError(
                f"table not found in scope: '{name}' "
                f"(available: {known})") from None

    # ---------------------------------------------------------- UDF registries

    def add_function(self, name: str, func: Callable,
                     returns: str = "string", vectorized: bool = True) -> None:
        """Register a scalar function. `func` receives/returns pandas Series
        (vectorized, Arrow-batched — the same Series->Series contract the
        reference uses, src/framequery/executor/_pandas.py:437-446)."""
        if vectorized:
            udf = F.pandas_udf(func, returnType=returns)
        else:
            udf = F.udf(func, returnType=returns)
        self.user_functions[name.lower()] = udf

    def add_column_function(self, name: str, func: Callable) -> None:
        """Register a compile-time function: Columns in -> Column out.
        Stays JVM-side — prefer this over add_function when expressible."""
        self.user_functions[name.lower()] = func

    def add_table_function(self, name: str, func: Callable) -> None:
        self.table_functions[name.lower()] = func

    def add_lateral_function(self, name: str, func: Callable, meta) -> None:
        """meta: StructType or [(name, spark-type-string), ...] — the declared
        output schema (reference meta, src/framequery/executor/_executor.py:77-95)."""
        if not isinstance(meta, T.StructType):
            meta = T.StructType([
                T.StructField(n, _parse_type(t)) for n, t in meta
            ])
        self.lateral_functions[name.lower()] = (func, meta)

    # ---------------------------------------------------------------- execute

    def execute(self, q: str, basepath: Optional[str] = None):
        old = self.basepath
        if basepath is not None:
            self.basepath = basepath
        try:
            return self._execute_statement(parse(q), self.scope)
        finally:
            self.basepath = old

    def _compile_query(self, node, scope: dict) -> DataFrame:
        return QueryCompiler(self, scope).compile_query(node)

    def _execute_statement(self, node, scope: dict):
        if isinstance(node, (ast.Select, ast.SetOp, ast.Pivot, ast.Unpivot)):
            return self._compile_query(node, scope)
        if isinstance(node, ast.Explain):
            df = self._compile_query(node.query, scope)
            mode = "cost" if node.analyze else "formatted"
            plan = df._jdf.queryExecution().explainString(
                self.spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString(mode))
            rows = [(line,) for line in plan.splitlines()]
            return self.spark.createDataFrame(rows, "`QUERY PLAN` string")
        if isinstance(node, ast.CreateTableAs):
            scope[node.name] = self._compile_query(node.query, scope)
            return None
        if isinstance(node, ast.DropTable):
            for name in node.names:
                if name in scope:
                    del scope[name]
                elif not node.if_exists:
                    raise KeyError(f"table not found: {name}")
            return None
        if isinstance(node, ast.Describe):
            df = self.resolve_table(scope, node.table)
            rows = [(f.name, f.dataType.simpleString())
                    for f in df.schema.fields]
            return self.spark.createDataFrame(
                rows, "col_name string, data_type string")
        if isinstance(node, ast.InsertInto):
            df = self._compile_query(node.query, scope)
            base = self.resolve_table(scope, node.table)
            if node.columns:
                # named columns: missing ones fill NULL, order normalized
                from pyspark.sql import functions as F

                df = df.toDF(*node.columns)
                df = df.select(*[
                    F.col(c) if c in df.columns
                    else F.lit(None).cast(base.schema[c].dataType).alias(c)
                    for c in base.columns])
            else:
                df = df.toDF(*base.columns)  # positional, SQL-style
            scope[node.table] = base.unionByName(df)
            return None
        if isinstance(node, ast.Delete):
            # alias to the table name so qualified self-refs (t.a) and
            # correlated subquery outer refs resolve
            base = self.resolve_table(scope, node.table).alias(node.table)
            if node.where is None:
                scope[node.table] = base.limit(0)
                return None
            from ..compiler.expressions import ExprCompiler

            ec = ExprCompiler(self, scope=scope)
            cond = ec.compile(node.where)
            cols = list(base.columns)
            base, _ = QueryCompiler(self, scope)._attach_pending(base, ec)
            # keep rows where the predicate is NOT satisfied (3VL: NULL
            # predicate rows survive, matching pg DELETE); reproject to the
            # original columns to shed any attached subquery helpers
            scope[node.table] = base.filter(~cond.eqNullSafe(True)) \
                .select(*cols)
            return None
        if isinstance(node, ast.Update):
            from pyspark.sql import functions as F

            from ..compiler.expressions import ExprCompiler

            base = self.resolve_table(scope, node.table).alias(node.table)
            ec = ExprCompiler(self, scope=scope)
            cond = (ec.compile(node.where).eqNullSafe(True)
                    if node.where is not None else F.lit(True))
            # all assignment RHS evaluate against the PRE-update row (SQL
            # semantics) — compile against `base`, apply in one select
            new_vals = {c: ec.compile(e) for c, e in node.assignments}
            cols = list(base.columns)
            base, _ = QueryCompiler(self, scope)._attach_pending(base, ec)
            scope[node.table] = base.select(*[
                (F.when(cond, new_vals[c]).otherwise(F.col(c)).alias(c)
                 if c in new_vals else F.col(c))
                for c in cols])
            return None
        if isinstance(node, ast.CopyFrom):
            from ..sources.copy import read_csv

            scope[node.table] = read_csv(self, node.path, dict(node.options))
            return None
        if isinstance(node, ast.CopyTo):
            from ..sources.copy import write_csv

            df = (self._compile_query(node.query, scope)
                  if node.query is not None
                  else self.resolve_table(scope, node.table))
            write_csv(self, df, node.path, dict(node.options))
            return None
        if isinstance(node, ast.ShowOption):
            value = _SHOW_OPTIONS.get(node.option)
            if value is None:
                raise CompileError(f"unknown SHOW option: {node.option}")
            col = node.option if " " not in node.option else node.option.split()[0]
            return self.spark.createDataFrame([(value,)], f"`{col}` string")
        raise CompileError(f"cannot execute {type(node).__name__}")


def _parse_type(t: str) -> T.DataType:
    mapping = {
        "string": T.StringType(), "str": T.StringType(), "object": T.StringType(),
        "int": T.IntegerType(), "int32": T.IntegerType(),
        "long": T.LongType(), "int64": T.LongType(), "bigint": T.LongType(),
        "double": T.DoubleType(), "float64": T.DoubleType(), "float": T.FloatType(),
        "boolean": T.BooleanType(), "bool": T.BooleanType(),
        "date": T.DateType(), "timestamp": T.TimestampType(),
    }
    return mapping.get(str(t).lower(), T.StringType())


def _capture_caller_scope(spark: SparkSession, depth: int = 2) -> dict:
    """Reference trick: pull dataframe-shaped values out of the caller's
    frame (src/framequery/executor/_executor.py:123-128)."""
    import pandas as pd

    frame = inspect.currentframe()
    for _ in range(depth):
        if frame.f_back is not None:
            frame = frame.f_back
    candidates = {}
    candidates.update(frame.f_globals)
    candidates.update(frame.f_locals)
    return {
        k: v for k, v in candidates.items()
        if isinstance(v, (DataFrame, pd.DataFrame)) and not k.startswith("_")
    }


def execute(q: str, scope: Optional[dict] = None,
            spark: Optional[SparkSession] = None, basepath: str = ".",
            model: Optional[str] = None):
    """One-shot execute; returns a (lazy) Spark DataFrame or None for DDL.
    `model` is accepted for reference-signature compatibility and ignored."""
    spark = spark or SparkSession.builder.getOrCreate()
    if scope is None:
        scope = _capture_caller_scope(spark)
    ex = Executor(scope=scope, spark=spark, basepath=basepath)
    return ex.execute(q)
