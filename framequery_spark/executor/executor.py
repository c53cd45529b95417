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
import re
import weakref
from collections import OrderedDict
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.expressions import CompileError
from ..compiler.select import QueryCompiler
from ..parser import ast, parse
from ..sources.local_relation import local_relation

def _rewrite_merge_action(node, s_name=None, src_cols=()):
    """Rewrite a MERGE RETURNING item tree against the merge plan's helper
    columns (invisible to `*` expansion, so `RETURNING *` stays pg-shaped):

    - pg-17 `merge_action()` calls -> the `__merge_action` column;
    - source-qualified refs `<s_name>.c` -> the `__src_c` passthrough
      (pg 17 allows RETURNING to read the matched source row)."""
    import dataclasses

    if isinstance(node, ast.Call) and node.name.lower() == "merge_action" \
            and not node.args:
        return ast.ColumnRef(parts=("__merge_action",))
    if isinstance(node, ast.ColumnRef) and s_name is not None \
            and len(node.parts) == 2 and node.parts[0] == s_name \
            and node.parts[1] in src_cols:
        return ast.ColumnRef(parts=(f"__src_{node.parts[1]}",))
    if dataclasses.is_dataclass(node) and isinstance(node, ast.Node):
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, ast.Node):
                new = _rewrite_merge_action(v, s_name, src_cols)
                if new is not v:
                    changes[f.name] = new
            elif isinstance(v, tuple):
                new_t = tuple(_rewrite_merge_action(x, s_name, src_cols)
                              if isinstance(x, ast.Node) else x for x in v)
                if any(a is not b for a, b in zip(new_t, v)):
                    changes[f.name] = new_t
        if changes:
            return dataclasses.replace(node, **changes)
    return node


def _rewrite_returning(items, s_name, src_cols):
    """Item-level MERGE RETURNING rewrite: `<s_name>.*` expands to the
    source passthrough columns (aliased back to their own names, pg-style);
    everything else goes through :func:`_rewrite_merge_action`."""
    out = []
    for item in items:
        expr = getattr(item, "expr", item)
        if isinstance(expr, ast.Star) and expr.table == s_name:
            out.extend(
                ast.SelectItem(
                    expr=ast.ColumnRef(parts=(f"__src_{c}",)), alias=c)
                for c in src_cols)
            continue
        if isinstance(item, ast.SelectItem) and item.alias is None \
                and isinstance(item.expr, ast.Call) \
                and item.expr.name.lower() == "merge_action" \
                and not item.expr.args:
            # a bare merge_action() names its output column merge_action
            # in pg; without this the helper name __merge_action leaks
            out.append(ast.SelectItem(
                expr=ast.ColumnRef(parts=("__merge_action",)),
                alias="merge_action"))
            continue
        out.append(_rewrite_merge_action(item, s_name, src_cols))
    return tuple(out)


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
                 model: Optional[str] = None,
                 table_root: Optional[str] = None):
        # `model` accepted for drop-in compatibility with the reference
        # signature (pandas/dask model selection); Spark is the only model
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.scope: Dict[str, DataFrame] = {}
        self.basepath = basepath
        # Durable catalog hand-off (r12, see COVERAGE.md "Durability"):
        # a directory acting as a lightweight parquet catalog. When set,
        # plain CREATE TABLE AS persists its result to
        # <table_root>/<name>.parquet and unknown table names resolve
        # against it — so CTAS results survive the session and a fresh
        # Executor on the same root re-resolves them. TEMP tables, views
        # and matviews stay session-scoped. Also settable per-session via
        # SET framequery.table_root TO '<path>'.
        self.table_root = table_root
        self.user_functions: Dict[str, Callable] = {}
        self.table_functions: Dict[str, Callable] = {}
        self.lateral_functions: Dict[str, tuple] = {}
        # materialized-view definitions: name -> defining query AST, so
        # REFRESH MATERIALIZED VIEW can re-run them against current scope
        self._matviews: Dict[str, object] = {}
        self._options: Dict[str, str] = {}  # SET name TO v; SHOW reads back
        self._prepared: Dict[str, str] = {}  # PREPARE name -> raw SQL text
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

    def _effective_table_root(self) -> Optional[str]:
        root = self._options.get("framequery.table_root", self.table_root)
        return str(root).strip("'\"") if root else None

    def _durable_path(self, name: str) -> Optional[str]:
        """Path of *name* under the durable table_root, or None when no
        root is configured. Dotted names map to subdirectories; traversal
        outside the root is rejected."""
        root = self._effective_table_root()
        if root is None:
            return None
        import os

        parts = name.split(".")
        if any(p in ("", ".", "..") or "/" in p or "\\" in p
               for p in parts):
            from ..compiler.expressions import CompileError

            raise CompileError(f"invalid durable table name: {name!r}")
        return os.path.join(root, *parts[:-1], parts[-1] + ".parquet")

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
            return local_relation(
                self.spark,
                [("public", 0, None), ("pg_catalog", 0, None),
                 ("information_schema", 0, None)],
                T.StructType([
                    T.StructField("nspname", T.StringType()),
                    T.StructField("nspowner", T.IntegerType()),
                    T.StructField("nspacl", T.StringType()),
                ]),
            )
        # durable catalog: a prior session's CTAS result re-resolves from
        # <table_root>/<name>.parquet (cached in scope so one session
        # reads one snapshot — pg-repeatable within the session)
        dpath = self._durable_path(name)
        if dpath is not None:
            import os

            if os.path.isdir(dpath) or os.path.isfile(dpath):
                df = self.spark.read.parquet(dpath)
                scope[name] = df
                return df
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

    def _exec_dml_join(self, node, scope: dict, kind: str):
        """pg `UPDATE t SET ... FROM rels WHERE cond` and
        `DELETE FROM t USING rels WHERE cond`.

        Shape: tag target rows with an id, inner-join the FROM/USING
        relation tree on the WHERE condition (equality conjuncts become
        hash-join keys under Catalyst), keep ONE match per target row
        (row_number over the join columns — pg leaves the choice
        unspecified; sorting makes it deterministic), then rebuild the
        table: updated rows replace their originals / deleted ids are
        anti-joined away. One join + one window + one id-join — never a
        per-row subplan.

        RETURNING sees the post-image target columns plus the matched
        FROM/USING row's non-colliding columns (bare names; qualified
        source refs are not supported — same documented limit as MERGE
        RETURNING before round 6)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ..compiler.expressions import ExprCompiler
        from ..compiler.select import QueryCompiler

        rels = node.from_ if kind == "update" else node.using
        base = self.resolve_table(scope, node.table).alias(node.table)
        t_cols = list(base.columns)
        # __t_id feeds two plan branches (match join + rebuild join); pin
        # the nondeterministic ids with a localCheckpoint barrier so both
        # branches see identical values (row order after an upstream
        # shuffle is not guaranteed stable across recomputations)
        from ..operators.cache import local_checkpoint_tracked

        tagged = (local_checkpoint_tracked(
                      base.withColumn("__t_id",
                                      F.monotonically_increasing_id()),
                      eager=False)
                  .alias(node.table))
        src = QueryCompiler(self, scope).compile_relation(rels)
        src_cols = [c for c in src.columns if not c.startswith("__")]
        src_alias = getattr(rels, "alias", None) or (
            rels.parts[-1] if isinstance(rels, ast.TableRef) else None)
        src = src.withColumn("__s_id", F.monotonically_increasing_id())
        if src_alias:
            # withColumn drops the relation alias; restore for qualified refs
            src = src.alias(src_alias)
        ec = ExprCompiler(self, scope=scope)
        cond = (ec.compile(node.where).eqNullSafe(True)
                if node.where is not None else F.lit(True))
        if ec.pending_scalar or ec.pending_correlated or ec.pending_theta:
            raise CompileError(
                f"subqueries in {kind.upper()} ... "
                f"{'FROM' if kind == 'update' else 'USING'} conditions are "
                "not supported — use MERGE or a plain WHERE")
        joined = tagged.join(src, cond, "inner")
        # matched feeds both the rebuild join and RETURNING — pin the
        # arbitrary one-match choice so the two consumers agree
        matched = (joined.withColumn(
            "__rn", F.row_number().over(
                Window.partitionBy("__t_id").orderBy("__s_id")))
            .where(F.col("__rn") == 1).drop("__rn", "__s_id"))
        matched = local_checkpoint_tracked(matched, eager=False)

        def tcol(c):
            return F.col(f"`{node.table}`.`{c}`")

        extra = [c for c in src_cols if c not in t_cols]
        # hidden prefixed copies of EVERY source column, so RETURNING can
        # resolve alias-qualified source refs even when the name collides
        # with a target column (the _returning rewrite maps `s.c` onto
        # __src__c)
        def scol(c):
            q = f"`{src_alias}`.`{c}`" if src_alias else f"`{c}`"
            return F.col(q).alias(f"__src__{c}")

        src_copies = [scol(c) for c in src_cols] if node.returning else []
        if kind == "update":
            new_vals = {c: ec.compile(e) for c, e in node.assignments}
            unknown = [c for c in new_vals if c not in t_cols]
            if unknown:
                raise CompileError(f"UPDATE: unknown column(s) {unknown}")
            post = matched.select(
                F.col("__t_id"),
                *[(new_vals[c].cast(base.schema[c].dataType).alias(c)
                   if c in new_vals else tcol(c).alias(c)) for c in t_cols],
                *[F.col(c) for c in extra], *src_copies)
            upd = post.select(
                "__t_id", F.lit(True).alias("__hit"),
                *[F.col(c).alias(f"__new_{c}") for c in t_cols])
            scope[node.table] = tagged.join(upd, "__t_id", "left").select(*[
                F.when(F.col("__hit").eqNullSafe(True), F.col(f"__new_{c}"))
                .otherwise(tcol(c)).alias(c) for c in t_cols])
            affected = post.drop("__t_id")
        else:  # delete
            hit = matched.select("__t_id").distinct()
            scope[node.table] = (tagged.join(hit, "__t_id", "left_anti")
                                 .select(*[tcol(c).alias(c) for c in t_cols]))
            affected = matched.select(
                *[tcol(c).alias(c) for c in t_cols],
                *[F.col(c) for c in extra], *src_copies)
        if node.returning:
            return self._returning(scope, node.table, affected,
                                   node.returning, src_alias=src_alias,
                                   src_cols=src_cols)
        return None

    def _returning(self, scope: dict, table: str, affected: DataFrame,
                   items, src_alias: str = None,
                   src_cols=()) -> DataFrame:
        """pg RETURNING: project the affected-row set through the item list
        using the full select machinery (aliases, expressions, `*`). The
        affected frame is bound under the statement's table name so
        qualified refs (`t.col`) resolve.

        For UPDATE ... FROM / DELETE ... USING, `src_alias`/`src_cols`
        describe the matched source row, carried in the affected frame as
        hidden __src__<col> copies: alias-qualified source refs (incl.
        names that collide with target columns) and `alias.*` rewrite onto
        those, and a bare `*` expands to the visible (non-hidden) columns
        exactly like pg's output row."""
        from ..compiler.rewrite import transform

        items = list(items)
        if src_alias and src_cols:
            hidden = {c: f"__src__{c}" for c in src_cols
                      if f"__src__{c}" in affected.columns}

            def rw(n: ast.Node) -> ast.Node:
                if isinstance(n, ast.ColumnRef) and len(n.parts) == 2 \
                        and n.parts[0].lower() == src_alias.lower() \
                        and n.parts[1] in hidden:
                    return ast.ColumnRef(parts=(hidden[n.parts[1]],),
                                         quoted=True)
                return n

            expanded = []
            for it in items:
                e = it.expr if isinstance(it, ast.SelectItem) else it
                if isinstance(e, ast.Star) and e.table \
                        and e.table.lower() == src_alias.lower():
                    expanded.extend(
                        ast.SelectItem(expr=ast.ColumnRef(
                            parts=(hidden[c],), quoted=True), alias=c)
                        for c in src_cols if c in hidden)
                    continue
                expanded.append(transform(it, rw))
            items = expanded
        if any(isinstance((it.expr if isinstance(it, ast.SelectItem)
                           else it), ast.Star)
               and (it.expr if isinstance(it, ast.SelectItem)
                    else it).table is None for it in items):
            # bare *: expand to the visible columns so hidden __src__
            # carriers never leak into the output
            expanded = []
            for it in items:
                e = it.expr if isinstance(it, ast.SelectItem) else it
                if isinstance(e, ast.Star) and e.table is None:
                    expanded.extend(
                        ast.SelectItem(expr=ast.ColumnRef(
                            parts=(c,), quoted=True), alias=c)
                        for c in affected.columns
                        if not c.startswith("__"))
                else:
                    expanded.append(it)
            items = expanded
        tmp = dict(scope)
        tmp[table] = affected
        sel = ast.Select(items=tuple(items),
                         from_=ast.TableRef(parts=(table,)))
        return QueryCompiler(self, tmp).compile_query(sel)

    def _exec_merge(self, node, scope: dict):
        """MERGE INTO: one full-outer join of target and source on the ON
        condition, then a single conditional projection implements every
        WHEN arm with first-match semantics — matched rows take the first
        satisfied MATCHED arm, target-only rows the first NOT MATCHED BY
        SOURCE arm (default: keep), source-only rows the first NOT MATCHED
        [BY TARGET] arm (default: no insert). A window count over the
        target row id raises at execution time if a target row matches
        more than one source row (pg: "MERGE command cannot affect row a
        second time") — the check rides the same plan, no second pass.
        Scale shape: one equi/theta join + one hash-partitioned window;
        nothing is collected. Beyond parity: the reference has no MERGE.

        With node.returning (pg 17), returns the RETURNING projection over
        the affected rows — the arm each row took is computed as a
        `__merge_action` column riding the same conditional chain, so
        `merge_action()` and the affected-set filter cost no extra pass:
        rows whose arm was DO NOTHING (or whose conditional arm's AND/WHERE
        failed, falling through to the keep default) have a NULL action and
        are neither counted nor returned, matching pg. Update/insert rows
        return the post-image; delete rows the old image. Returns None when
        no RETURNING clause is present. RETURNING may reference target
        columns (post-/old-image), merge_action(), and source-qualified
        columns `<src>.c` / `<src>.*` (NULL for NOT MATCHED BY SOURCE rows,
        like pg); unqualified names resolve to the target."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ..compiler.expressions import CompileError, ExprCompiler

        t_name = node.target_alias or node.target.split(".")[-1]
        base = self.resolve_table(scope, node.target)
        t_cols = list(base.columns)
        tj = (base.withColumn("__t_id", F.monotonically_increasing_id())
              .withColumn("__t_mark", F.lit(True))
              .alias(t_name))
        src = node.source
        s_df = QueryCompiler(self, scope).compile_relation(src)
        s_name = (node.source_alias or getattr(src, "alias", None)
                  or (src.parts[-1] if isinstance(src, ast.TableRef)
                      else "__source"))
        # withColumn drops the relation's alias — re-establish it so
        # qualified refs (src.col / excluded.col) keep resolving
        s_df = s_df.withColumn("__s_mark", F.lit(True)).alias(s_name)

        ec = ExprCompiler(self, scope=scope)
        joined = tj.join(s_df, ec.compile(node.on), "full_outer")

        m_cond = F.col("__t_mark").eqNullSafe(True) \
            & F.col("__s_mark").eqNullSafe(True)
        to_cond = F.col("__t_mark").eqNullSafe(True) & F.col("__s_mark").isNull()
        so_cond = F.col("__t_mark").isNull() & F.col("__s_mark").eqNullSafe(True)

        def tcol(c):
            return F.col(f"`{t_name}`.`{c}`")

        def insert_map(action):
            cols = list(action.insert_columns) or t_cols
            if len(cols) != len(action.insert_values):
                raise CompileError(
                    "MERGE INSERT has %d columns but %d values"
                    % (len(cols), len(action.insert_values)))
            unknown = [c for c in cols if c not in t_cols]
            if unknown:
                raise CompileError(
                    f"MERGE INSERT: unknown target column(s) {unknown}")
            return dict(zip(cols, action.insert_values))

        segments = (
            (m_cond, node.matched, "matched"),
            (to_cond, node.not_matched_by_source, "by_source"),
            (so_cond, node.not_matched, "insert"),
        )

        def build(value_of, defaults):
            chain = None
            for seg_cond, actions, seg_kind in segments:
                for a in actions:
                    c = seg_cond
                    if a.condition is not None:
                        c = c & ec.compile(a.condition).eqNullSafe(True)
                    v = value_of(a, seg_kind)
                    chain = F.when(c, v) if chain is None else chain.when(c, v)
                d = defaults[seg_kind]
                chain = (F.when(seg_cond, d) if chain is None
                         else chain.when(seg_cond, d))
            return chain

        out_cols = []
        for c in t_cols:
            dtype = base.schema[c].dataType

            def value_of(a, seg_kind, c=c, dtype=dtype):
                if a.kind == "update":
                    vals = dict(a.assignments)
                    if c in vals:
                        return ec.compile(vals[c]).cast(dtype)
                    return tcol(c)
                if a.kind == "insert":
                    v = insert_map(a).get(c)
                    if v is None:
                        return F.lit(None).cast(dtype)
                    return ec.compile(v).cast(dtype)
                return tcol(c)  # delete/nothing: value unused or original

            out_cols.append(build(value_of, {
                "matched": tcol(c), "by_source": tcol(c),
                "insert": F.lit(None).cast(dtype)}).alias(c))

        def keep_of(a, seg_kind):
            if seg_kind == "insert":
                return F.lit(a.kind == "insert")
            return F.lit(a.kind != "delete")

        keep = build(keep_of, {
            "matched": F.lit(True), "by_source": F.lit(True),
            "insert": F.lit(False)})

        # pg duplicate-match guard, evaluated inside the plan
        n_match = F.sum(F.when(m_cond, 1).otherwise(0)) \
            .over(Window.partitionBy("__t_id"))
        guard = F.when(
            F.col("__t_id").isNotNull() & (n_match > 1),
            F.raise_error(F.lit(
                "MERGE command cannot affect row a second time: a target "
                "row matched more than one source row")).cast("boolean"),
        ).otherwise(F.lit(True))

        joined, _ = QueryCompiler(self, scope)._attach_pending(joined, ec)
        joined = joined.withColumn("__guard", guard)  # window not legal in WHERE
        scope[node.target] = (joined
                              .where(keep & F.col("__guard"))
                              .select(*out_cols))
        if not node.returning:
            return None

        # affected set: rows that actually took an update/delete/insert arm
        def action_of(a, seg_kind):
            if a.kind in ("update", "delete", "insert"):
                return F.lit(a.kind.upper())
            return F.lit(None).cast("string")

        no_action = F.lit(None).cast("string")
        action = build(action_of, {"matched": no_action,
                                   "by_source": no_action,
                                   "insert": no_action})
        # delete rows: out_cols already carry the old image (the delete arm's
        # per-column value is tcol(c)); update/insert rows the post-image.
        # Source columns ride along as __src_<c> helper columns (invisible
        # to `*` expansion) so RETURNING may reference the matched source
        # row via its alias (pg 17); for target-only (BY SOURCE) rows they
        # are NULL, matching pg.
        src_cols = [c for c in s_df.columns if not c.startswith("__")]
        affected = (joined
                    .withColumn("__action", action)
                    .where(F.col("__action").isNotNull() & F.col("__guard"))
                    .select(*out_cols,
                            F.col("__action").alias("__merge_action"),
                            *[F.col(f"`{s_name}`.`{c}`").alias(f"__src_{c}")
                              for c in src_cols]))
        items = _rewrite_returning(node.returning, s_name, src_cols)
        return self._returning(scope, t_name, affected, items)

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
            return local_relation(self.spark, rows,
                                  "`QUERY PLAN` string")
        if isinstance(node, ast.CreateTableAs):
            if node.if_not_exists and node.name in scope:
                return None  # pg: skipped with a notice
            df = self._compile_query(node.query, scope)
            if node.materialized:
                # pg MATERIALIZED VIEW: contents frozen at creation time —
                # localCheckpoint(eager) materializes to executor storage
                # so later base-table changes do not show until REFRESH.
                # (Distributed blocks, not driver memory; at cluster scale
                # the same cost a real MV's heap table pays.)
                from ..operators.cache import local_checkpoint_tracked

                df = local_checkpoint_tracked(df, eager=True)
                self._matviews[node.name] = node.query
            elif not node.temp and not node.view:
                # durable catalog (r12): a plain CREATE TABLE AS under a
                # configured table_root writes the result once to parquet
                # and rebinds the name to a SCAN of that parquet — later
                # queries get pushdown/pruning against stored data instead
                # of re-running the defining plan, and a fresh session on
                # the same root re-resolves the table by name.
                dpath = self._durable_path(node.name)
                if dpath is not None:
                    import os

                    if (not node.replace
                            and (os.path.isdir(dpath)
                                 or os.path.isfile(dpath))
                            and node.name not in scope):
                        if node.if_not_exists:
                            return None
                        raise CompileError(
                            f'relation "{node.name}" already exists in '
                            f"the durable table root")
                    df.write.mode("overwrite").parquet(dpath)
                    df = self.spark.read.parquet(dpath)
            scope[node.name] = df
            return None
        if isinstance(node, ast.RefreshMatView):
            query = self._matviews.get(node.name)
            if query is None:
                raise CompileError(
                    f"\"{node.name}\" is not a materialized view")
            from ..operators.cache import local_checkpoint_tracked

            scope[node.name] = local_checkpoint_tracked(
                self._compile_query(query, scope), eager=True)
            return None
        if isinstance(node, ast.WithDml):
            # CTEs become temporary scope entries visible to the DML; they
            # are compiled EAGERLY-lazily against the pre-DML state (lazy
            # DataFrames over the current bindings — since the DML rebinds
            # rather than mutates, the CTE plans keep reading the original
            # data like pg's same-snapshot semantics). Shadowed names are
            # restored afterwards.
            target = getattr(node.stmt, "table",
                             getattr(node.stmt, "target", None))
            if any(c.name == target for c in node.ctes):
                # pg resolves the DML target to the real relation even
                # when a CTE shares its name; here the CTE would shadow
                # it and the restore would discard the modification —
                # reject instead of silently doing the wrong thing
                raise CompileError(
                    f'WITH query name "{target}" collides with the DML '
                    "target table — rename the CTE")
            _missing = object()
            saved = {c.name: scope.get(c.name, _missing)
                     for c in node.ctes}
            try:
                cte_scope = dict(scope)
                for cte in node.ctes:
                    sub = QueryCompiler(self, cte_scope)
                    if cte.recursive:
                        df = sub._compile_recursive_cte(cte)
                    else:
                        df = sub.compile_query(cte.query)
                        if cte.columns:
                            df = df.toDF(*cte.columns)
                    cte_scope[cte.name] = df
                    scope[cte.name] = df
                return self._execute_statement(node.stmt, scope)
            finally:
                for name, old in saved.items():
                    if old is _missing:
                        scope.pop(name, None)
                    else:
                        scope[name] = old
        if isinstance(node, ast.AlterRename):
            if node.old not in scope:
                if node.if_exists:
                    return None
                raise KeyError(f"table not found: {node.old}")
            if node.new in scope:
                raise CompileError(
                    f'relation "{node.new}" already exists')
            scope[node.new] = scope.pop(node.old)
            if node.old in self._matviews:
                self._matviews[node.new] = self._matviews.pop(node.old)
            return None
        if isinstance(node, ast.SetOption):
            self._options[node.name] = node.value
            return None
        if isinstance(node, ast.ResetOption):
            if node.name is None:
                self._options.clear()
            else:
                self._options.pop(node.name, None)
            return None
        if isinstance(node, ast.Utility):
            return None  # documented no-ops: txn control / maintenance
        if isinstance(node, ast.Prepare):
            self._prepared[node.name] = node.text
            return None
        if isinstance(node, ast.ExecutePrepared):
            text = self._prepared.get(node.name)
            if text is None:
                raise CompileError(
                    f'prepared statement "{node.name}" does not exist')
            vals = []
            for a in node.args:
                neg = False
                if isinstance(a, ast.Unary) and a.op == "-" \
                        and isinstance(a.operand, ast.Literal):
                    a, neg = a.operand, True
                if not isinstance(a, ast.Literal):
                    raise CompileError(
                        "EXECUTE arguments must be literals")
                v = a.value
                if v is None:
                    vals.append("NULL")
                elif a.kind == "string":
                    vals.append("'" + str(v).replace("'", "''") + "'")
                elif a.kind == "bool":
                    vals.append("true" if v else "false")
                else:
                    # numeric splices go in as typed CASTs, never bare
                    # literals: a bare negative after '-' fuses into a
                    # '--' line comment, and a bare/parenthesized integer
                    # in ORDER BY / GROUP BY position resolves as an
                    # ORDINAL — pg's $n is a constant there (sorting and
                    # grouping no-ops), which CAST(n AS ...) reproduces
                    # (LIMIT/OFFSET fold it back via _int_literal)
                    if isinstance(v, float):
                        ty = "DOUBLE"
                    elif int(v) > 0x7FFFFFFFFFFFFFFF + (1 if neg else 0):
                        # pg types an out-of-int64-range integer constant
                        # as numeric; CAST(v AS BIGINT) would overflow.
                        # Splice the magnitude as a STRING argument — a
                        # bare >int64 literal can't round-trip through a
                        # Long-typed lit()
                        vals.append(
                            f"CAST('{'-' if neg else ''}{v}' "
                            "AS DECIMAL(38,0))")
                        continue
                    else:
                        ty = "BIGINT"
                    vals.append(
                        f"CAST({'-' if neg else ''}{v} AS {ty})")
            # token-aware $n substitution: splice at pgparam token
            # positions so $n inside string literals is never touched
            from ..parser.tokenizer import tokenize as _tok

            out, last = [], 0
            for t in _tok(text):
                if t.kind == "pgparam":
                    idx = int(t.value[1:])
                    if not 1 <= idx <= len(vals):
                        raise CompileError(
                            f"no value for parameter ${idx} "
                            f"({len(vals)} given)")
                    out.append(text[last:t.pos])
                    out.append(vals[idx - 1])
                    last = t.pos + len(t.value)
            out.append(text[last:])
            from ..parser.parser import parse as _parse

            return self._execute_statement(_parse("".join(out)), scope)
        if isinstance(node, ast.Deallocate):
            if node.name is None:
                self._prepared.clear()
            elif self._prepared.pop(node.name, None) is None:
                raise CompileError(
                    f'prepared statement "{node.name}" does not exist')
            return None
        if isinstance(node, ast.DropTable):
            for name in node.names:
                found = False
                if name in scope:
                    del scope[name]
                    self._matviews.pop(name, None)
                    found = True
                # durable catalog: DROP TABLE removes the stored parquet
                # too (pg DROP removes data); the path helper guarantees
                # the delete stays inside table_root
                dpath = self._durable_path(name)
                if dpath is not None:
                    import os
                    import shutil

                    if os.path.isdir(dpath):
                        shutil.rmtree(dpath)
                        found = True
                    elif os.path.isfile(dpath):
                        os.remove(dpath)
                        found = True
                if not found and not node.if_exists:
                    raise KeyError(f"table not found: {name}")
            return None
        if isinstance(node, ast.Describe):
            df = self.resolve_table(scope, node.table)
            rows = [(f.name, f.dataType.simpleString())
                    for f in df.schema.fields]
            return local_relation(
                self.spark, rows, "col_name string, data_type string")
        if isinstance(node, ast.InsertInto):
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            base = self.resolve_table(scope, node.table)
            if node.query is None:
                # DEFAULT VALUES: one row of NULLs (no column defaults here)
                df = local_relation(
                    self.spark,
                    [tuple(None for _ in base.columns)], base.schema)
            else:
                df = self._compile_query(node.query, scope)
            if node.columns:
                # named columns: missing ones fill NULL, order normalized
                df = df.toDF(*node.columns)
                df = df.select(*[
                    F.col(c) if c in df.columns
                    else F.lit(None).cast(base.schema[c].dataType).alias(c)
                    for c in base.columns])
            else:
                df = df.toDF(*base.columns)  # positional, SQL-style
            # pg coerces the inserted rows to the target column types (and
            # an all-NULL VALUES column arrives untyped)
            df = df.select(*[
                F.col(c).cast(base.schema[c].dataType).alias(c)
                for c in base.columns])
            if node.conflict_action is None:
                affected = df
                scope[node.table] = base.unionByName(df)
            elif node.conflict_action == "nothing":
                keys = list(node.conflict_cols)
                # batch-internal first-wins (pg inserts the first row, the
                # second then conflicts with it), then drop pre-existing keys
                w = Window.partitionBy(*keys).orderBy("__seq")
                first = (df.withColumn(
                             "__seq", F.monotonically_increasing_id())
                         .withColumn("__rn", F.row_number().over(w))
                         .where(F.col("__rn") == 1).drop("__rn", "__seq"))
                affected = (first.join(base.select(*keys).distinct(),
                                       keys, "left_anti")
                            .select(*base.columns))
                scope[node.table] = base.unionByName(affected)
            else:  # DO UPDATE — desugar to MERGE (excluded = proposed row)
                # pg raises when the batch itself carries a duplicate
                # conflict key ("ON CONFLICT DO UPDATE command cannot affect
                # row a second time") — for keys already in the table the
                # MERGE duplicate-match guard catches this, but two batch
                # rows sharing a NEW key would otherwise both take the NOT
                # MATCHED INSERT arm and silently insert duplicates.
                keys = list(node.conflict_cols)
                # NULL conflict keys never conflict in pg (NULL <> NULL for
                # uniqueness) — such rows always take the insert path, so
                # exclude them from the duplicate-key check
                non_null = df
                for k in keys:
                    non_null = non_null.where(F.col(k).isNotNull())
                dup = (non_null.groupBy(*keys).count()
                       .where(F.col("count") > 1).limit(1).collect())
                if dup:
                    raise ValueError(
                        "ON CONFLICT DO UPDATE command cannot affect row a "
                        f"second time (duplicate conflict key in batch: "
                        f"{tuple(dup[0][k] for k in keys)})")
                on = None
                for c in node.conflict_cols:
                    eq = ast.Binary(op="=",
                                    left=ast.ColumnRef(
                                        parts=(node.table, c)),
                                    right=ast.ColumnRef(
                                        parts=("excluded", c)))
                    on = eq if on is None else ast.Binary(
                        op="and", left=on, right=eq)
                merge = ast.Merge(
                    target=node.table,
                    source=ast.TableRef(parts=("__excluded",)),
                    on=on, source_alias="excluded",
                    matched=(ast.MergeAction(
                        kind="update", condition=node.conflict_where,
                        assignments=node.conflict_assignments),),
                    not_matched=(ast.MergeAction(
                        kind="insert",
                        insert_values=tuple(
                            ast.ColumnRef(parts=("excluded", c))
                            for c in base.columns)),),
                    # RETURNING rides the merge's affected-row machinery:
                    # inserted + updated rows only — a conflict row whose
                    # DO UPDATE ... WHERE failed takes no arm, so it is
                    # neither updated nor returned (pg semantics)
                    returning=node.returning)
                tmp = dict(scope)
                tmp["__excluded"] = df
                ret = self._exec_merge(merge, tmp)
                scope[node.table] = tmp[node.table]
                return ret
            if node.returning:
                return self._returning(scope, node.table, affected,
                                       node.returning)
            return None
        if isinstance(node, ast.Delete) and node.using is not None:
            return self._exec_dml_join(node, scope, kind="delete")
        if isinstance(node, ast.Update) and node.from_ is not None:
            return self._exec_dml_join(node, scope, kind="update")
        if isinstance(node, ast.Delete):
            # alias to the table name so qualified self-refs (t.a) and
            # correlated subquery outer refs resolve
            base = self.resolve_table(scope, node.table).alias(node.table)
            if node.where is None:
                deleted = base
                scope[node.table] = base.limit(0)
                if node.returning:
                    return self._returning(scope, node.table, deleted,
                                           node.returning)
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
            if node.returning:
                deleted = base.filter(cond.eqNullSafe(True)).select(*cols)
                return self._returning(scope, node.table, deleted,
                                       node.returning)
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
            updated = base.select(*[
                (F.when(cond, new_vals[c]).otherwise(F.col(c)).alias(c)
                 if c in new_vals else F.col(c))
                for c in cols], cond.eqNullSafe(True).alias("__upd"))
            scope[node.table] = updated.drop("__upd")
            if node.returning:
                # pg RETURNING: the post-update image of rows the WHERE hit
                affected = updated.where("__upd").drop("__upd")
                return self._returning(scope, node.table, affected,
                                       node.returning)
            return None
        if isinstance(node, ast.Merge):
            return self._exec_merge(node, scope)
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
            value = self._options.get(node.option,
                                      _SHOW_OPTIONS.get(node.option))
            if value is None:
                raise CompileError(f"unknown SHOW option: {node.option}")
            col = node.option if " " not in node.option else node.option.split()[0]
            return local_relation(self.spark, [(value,)],
                                  f"`{col}` string")
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


# ---------------------------------------------------------------- plan cache
# Statement-level logical-plan cache for one-shot execute() (prepared-
# statement semantics). Re-running the same pure SELECT against the same
# scope DataFrames skips the parse + compile (the py4j expression-building
# round trips dominate build time: r12 measured 0.1-1.5 s per statement,
# ~14k socket round trips for 9 builds). The cache stores the ANALYZED
# LOGICAL PLAN only — every hit builds a brand-new Dataset via
# Dataset.ofRows, which gets a fresh QueryExecution, so EXECUTION always
# recomputes from the source parquet: no shuffle-stage or result reuse
# (returning the cached DataFrame object itself would let AQE reuse its
# materialized shuffle stages — that would be result caching, which this
# engine refuses to do).
#
# Cached only when ALL of:
#   - the statement parses to a pure query (Select/SetOp/Pivot/Unpivot —
#     no DML/DDL side effects),
#   - the SQL mentions no volatile/time/sequence function (conservative
#     textual screen; false positives only cost a cache miss),
#   - compiling registered no tracked persist/localCheckpoint and no
#     compile-time materialization (recursive CTEs and correlated-theta
#     decorrelation materialize during compile; rebuilding from their
#     analyzed plan would reference released checkpoint blocks — or, for
#     the driver-local recursive frontier path, replay frozen LocalRelation
#     rows instead of recomputing),
#   - scope values are all Spark DataFrames (identity-keyed).
_PLAN_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_PLAN_CACHE_MAX = 256
_VOLATILE_RE = re.compile(
    r"\b(random|setseed|rand|randn|now|clock_timestamp|statement_timestamp"
    r"|transaction_timestamp|timeofday|current_timestamp|current_date"
    r"|current_time|localtime|localtimestamp|uuid|gen_random_uuid"
    r"|uuid_generate_v4|nextval|currval|setval|pg_sleep)\b", re.I)


def _plan_cache_key(q: str, scope: dict, spark: SparkSession,
                    basepath: str) -> Optional[tuple]:
    try:
        sig = tuple(sorted((k, id(v)) for k, v in scope.items()))
    except Exception:
        return None
    return (q, basepath, id(spark), sig)


def _scope_refs(scope: dict) -> Optional[list]:
    """weakrefs to the scope DataFrames, in the key's sort order. The
    id()-based key alone is unsound: if a caller's scope DataFrame is
    garbage-collected and CPython reuses its id for a DIFFERENT DataFrame
    under the same SQL/basepath/session, the key would match and a stale
    analyzed plan (bound to the dead DataFrame's relations) would be
    returned silently. A hit is therefore only honored while every
    original object is still alive (its weakref resolves to the very
    object whose id is in the key); a dead ref invalidates the entry."""
    try:
        return [weakref.ref(v) for _, v in sorted(scope.items())]
    except Exception:  # un-weakref-able scope value — don't cache
        return None


def _scope_refs_alive(refs: list, scope: dict) -> bool:
    live = [r() for r in refs]
    if any(v is None for v in live):
        return False
    cur = [v for _, v in sorted(scope.items())]
    return len(cur) == len(live) and all(a is b for a, b in zip(live, cur))


def execute(q: str, scope: Optional[dict] = None,
            spark: Optional[SparkSession] = None, basepath: str = ".",
            model: Optional[str] = None):
    """One-shot execute; returns a (lazy) Spark DataFrame or None for DDL.
    `model` is accepted for reference-signature compatibility and ignored."""
    spark = spark or SparkSession.builder.getOrCreate()
    if scope is None:
        scope = _capture_caller_scope(spark)
        return Executor(scope=scope, spark=spark, basepath=basepath).execute(q)

    cacheable = (isinstance(scope, dict)
                 and all(isinstance(v, DataFrame) for v in scope.values())
                 and not _VOLATILE_RE.search(q))
    key = _plan_cache_key(q, scope, spark, basepath) if cacheable else None
    if key is not None:
        hit = _PLAN_CACHE.get(key)
        if hit is not None:
            plan, refs = hit
            if not _scope_refs_alive(refs, scope):
                # a scope DF from the cached compile died and its id may
                # have been recycled — the plan could be stale; recompile
                _PLAN_CACHE.pop(key, None)
            else:
                try:
                    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset \
                        .ofRows(spark._jsparkSession, plan)
                    return DataFrame(jdf, spark)
                except Exception:
                    _PLAN_CACHE.pop(key, None)  # fall through to recompile

    from ..operators import cache as _opcache

    n_persist = len(_opcache._TRACKED)
    n_ckpt = len(_opcache._TRACKED_CKPT)
    n_mat = _opcache.COMPILE_MATERIALIZATIONS
    try:
        node = parse(q)
    except Exception:
        return Executor(scope=scope, spark=spark, basepath=basepath).execute(q)
    ex = Executor(scope=scope, spark=spark, basepath=basepath)
    out = ex._execute_statement(node, ex.scope)
    if (key is not None and isinstance(out, DataFrame)
            and isinstance(node, (ast.Select, ast.SetOp, ast.Pivot,
                                  ast.Unpivot))
            and len(_opcache._TRACKED) == n_persist
            and len(_opcache._TRACKED_CKPT) == n_ckpt
            and _opcache.COMPILE_MATERIALIZATIONS == n_mat):
        try:
            refs = _scope_refs(scope)
            if refs is not None:
                _PLAN_CACHE[key] = (out._jdf.queryExecution().analyzed(),
                                    refs)
                while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
                    _PLAN_CACHE.popitem(last=False)
        except Exception:
            pass
    return out
