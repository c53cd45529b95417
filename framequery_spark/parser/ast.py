"""AST node definitions for the pg-flavored SQL dialect.

The surface mirrors the reference grammar (reference:
src/framequery/parser/ast.py, src/framequery/parser/_parser.py) but is
re-designed as plain frozen dataclasses consumed by a Spark compiler.
Beyond-parity nodes (set ops, window frames, IS NULL, BETWEEN, HAVING)
are included because Spark gives their execution for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


class Node:
    """Base class for all AST nodes (frozen dataclasses compare structurally)."""

    __slots__ = ()


# ---------------------------------------------------------------- expressions


@dataclass(frozen=True)
class Literal(Node):
    """A literal constant. kind in {'int','float','string','bool','null',
    'date','timestamp','interval'}."""

    value: object
    kind: str


@dataclass(frozen=True)
class ColumnRef(Node):
    """Possibly-qualified column reference: ('c',) or ('t','c') or ('s','t','c')."""

    parts: Tuple[str, ...]
    quoted: bool = False

    @property
    def name(self) -> str:
        return self.parts[-1]

    @property
    def qualifier(self) -> Optional[str]:
        return self.parts[-2] if len(self.parts) > 1 else None


@dataclass(frozen=True)
class Star(Node):
    """`*` or `t.*` in a select list or count(*)."""

    table: Optional[str] = None


@dataclass(frozen=True)
class Param(Node):
    """A %(name)s pyformat parameter (DBAPI layer substitutes before parse)."""

    name: str


@dataclass(frozen=True)
class Unary(Node):
    op: str  # '+', '-', 'not', '~'
    operand: Node


@dataclass(frozen=True)
class Binary(Node):
    """Binary operator. op is the lower-cased source token, e.g.
    '+','-','*','/','%','^','||','&','|','#','<<','>>',
    '=','!=','<>','<','<=','>','>=','and','or'."""

    op: str
    left: Node
    right: Node


@dataclass(frozen=True)
class Call(Node):
    """Function call `name(args)`; set-functions share this node.
    star=True for count(*); distinct=True for agg DISTINCT.

    filter_where: aggregate `FILTER (WHERE cond)` clause (pg; beyond parity —
    reference grammar has no FILTER, src/framequery/parser/_parser.py).
    order_within: sort keys from either `WITHIN GROUP (ORDER BY ...)` or the
    in-parens form `agg(x ORDER BY y)`; () when absent."""

    name: str
    args: Tuple[Node, ...] = ()
    distinct: bool = False
    star: bool = False
    filter_where: Optional[Node] = None
    order_within: Tuple["SortItem", ...] = ()


@dataclass(frozen=True)
class SortItem(Node):
    expr: Node
    ascending: bool = True
    nulls: Optional[str] = None  # 'first' | 'last' | None (dialect default)


@dataclass(frozen=True)
class FrameBound(Node):
    """Window frame bound: kind in {'unbounded_preceding','preceding',
    'current_row','following','unbounded_following'}; value for N PRECEDING.
    interval=True marks `INTERVAL '...' PRECEDING/FOLLOWING` (value is then
    the offset in microseconds; RANGE frames over a timestamp key only)."""

    kind: str
    value: Optional[int] = None
    interval: bool = False


@dataclass(frozen=True)
class WindowSpec(Node):
    partition_by: Tuple[Node, ...] = ()
    order_by: Tuple[SortItem, ...] = ()
    frame_type: Optional[str] = None  # 'rows' | 'range' | 'groups' | None
    frame_start: Optional[FrameBound] = None
    frame_end: Optional[FrameBound] = None
    # pg frame exclusion: 'current_row' | 'group' | 'ties' | None (NO OTHERS)
    exclude: Optional[str] = None
    # `OVER (w ORDER BY x)` / `WINDOW w2 AS (w1 ...)`: name of the base
    # window whose spec this one refines; resolved before compilation
    base_ref: Optional[str] = None


@dataclass(frozen=True)
class WindowCall(Node):
    """`call OVER (spec)` — reference parses this but never executes it
    (reference: src/framequery/parser/_parser.py:380-389); we execute.
    `call OVER w` (named window) parses with spec=None + ref='w' and is
    desugared against the SELECT's WINDOW clause before compilation."""

    call: Call
    spec: Optional[WindowSpec]
    ref: Optional[str] = None


@dataclass(frozen=True)
class Case(Node):
    """Searched CASE; the simple form is desugared at parse time
    (reference: src/framequery/parser/_parser.py:280-312)."""

    whens: Tuple[Tuple[Node, Node], ...]
    default: Optional[Node] = None


@dataclass(frozen=True)
class Cast(Node):
    """CAST(expr AS type) or expr::type."""

    expr: Node
    type_name: str


@dataclass(frozen=True)
class InList(Node):
    expr: Node
    items: Tuple[Node, ...]
    negated: bool = False


@dataclass(frozen=True)
class InSubquery(Node):
    expr: Node
    query: "Select"
    negated: bool = False


@dataclass(frozen=True)
class Between(Node):
    expr: Node
    low: Node
    high: Node
    negated: bool = False


@dataclass(frozen=True)
class IsNull(Node):
    expr: Node
    negated: bool = False


@dataclass(frozen=True)
class Like(Node):
    expr: Node
    pattern: Node
    negated: bool = False
    case_insensitive: bool = False  # ILIKE
    escape: Optional[Node] = None   # LIKE ... ESCAPE 'c' (pg default \\)


@dataclass(frozen=True)
class TrimCall(Node):
    """trim([both|leading|trailing] [chars] from s) special form
    (reference: src/framequery/parser/_parser.py:356-364)."""

    mode: str  # 'both' | 'leading' | 'trailing'
    chars: Optional[Node]
    source: Node


@dataclass(frozen=True)
class PositionCall(Node):
    """position(needle in haystack) special form
    (reference: src/framequery/parser/_parser.py:366-371)."""

    needle: Node
    haystack: Node


@dataclass(frozen=True)
class SubstringCall(Node):
    """substring(s from start [for length]) special form."""

    source: Node
    start: Node
    length: Optional[Node] = None


@dataclass(frozen=True)
class Extract(Node):
    """extract(field FROM expr)."""

    field: str
    expr: Node


@dataclass(frozen=True)
class QuantComp(Node):
    """Quantified comparison `expr op ANY|SOME|ALL (subquery)` for ordering
    operators (pg feature; beyond parity — the reference grammar has no
    quantified comparisons). `= ANY` / `<> ALL` are IN / NOT IN and raise a
    pointer to those."""

    op: str  # '<' '<=' '>' '>='
    expr: Node
    quantifier: str  # 'any' | 'all'
    query: Node


@dataclass(frozen=True)
class ScalarSubquery(Node):
    query: "Select"


@dataclass(frozen=True)
class ArraySubquery(Node):
    """pg ARRAY(subquery): single-column subquery gathered into an array,
    honoring the subquery's ORDER BY."""

    query: "Select"


@dataclass(frozen=True)
class Exists(Node):
    query: "Select"
    negated: bool = False


# ------------------------------------------------------------------ relations


@dataclass(frozen=True)
class TableRef(Node):
    """Scope/table lookup; multi-part names are joined with '.' as in the
    reference (schema prefix is just a string prefix,
    reference: src/framequery/executor/_executor.py:378-386)."""

    parts: Tuple[str, ...]
    alias: Optional[str] = None
    # pg TABLESAMPLE BERNOULLI|SYSTEM (percent) [REPEATABLE (seed)]
    sample_percent: Optional[float] = None
    sample_seed: Optional[int] = None

    @property
    def name(self) -> str:
        return ".".join(self.parts)


@dataclass(frozen=True)
class SubqueryRel(Node):
    query: "Select"
    alias: str
    lateral: bool = False  # pg LATERAL (SELECT ... correlated)


@dataclass(frozen=True)
class Values(Node):
    """VALUES (..),(..) row constructor in FROM; literal rows only."""

    rows: Tuple[Tuple[Node, ...], ...]
    alias: Optional[str] = None
    column_names: Tuple[str, ...] = ()


@dataclass(frozen=True)
class TableFunction(Node):
    """Table-valued function in FROM, e.g. copy_from(...), json_each(...),
    generate_series(...). lateral=True when prefixed with LATERAL."""

    name: str
    args: Tuple[Node, ...]
    alias: Optional[str] = None
    lateral: bool = False
    ordinality: bool = False  # WITH ORDINALITY (pg): 1-based row number
    column_names: Tuple[str, ...] = ()  # `AS u(x[, ...])` output renames


@dataclass(frozen=True)
class JsonTable(Node):
    """pg 17 JSON_TABLE(context, 'path' COLUMNS (...)) in FROM.
    columns entries are (name, type_name, member_path) — type_name None
    marks a FOR ORDINALITY column; member_path None defaults to $.name.
    A NESTED PATH clause is (None, nested_path, subcolumns_tuple),
    recursively."""

    context: Node
    path: str
    columns: Tuple[tuple, ...]
    alias: Optional[str] = None
    lateral: bool = False


@dataclass(frozen=True)
class Join(Node):
    kind: str  # 'inner' | 'left' | 'right' | 'full' | 'cross'
    left: Node
    right: Node
    condition: Optional[Node] = None
    using: Tuple[str, ...] = ()


# ----------------------------------------------------------------- statements


@dataclass(frozen=True)
class Rollup(Node):
    exprs: Tuple[Node, ...]
    distinct: bool = False  # pg 14 GROUP BY DISTINCT: dedup expanded sets


@dataclass(frozen=True)
class Cube(Node):
    exprs: Tuple[Node, ...]
    distinct: bool = False


@dataclass(frozen=True)
class GroupingSets(Node):
    sets: Tuple[Tuple[Node, ...], ...]
    distinct: bool = False


@dataclass(frozen=True)
class SelectItem(Node):
    expr: Node
    alias: Optional[str] = None


@dataclass(frozen=True)
class CTE(Node):
    """WITH item. recursive=True for `WITH RECURSIVE name (cols) AS
    (base UNION [ALL] step)` — the body is then a SetOp whose right arm may
    reference *name* (beyond parity; reference has no WITH RECURSIVE).
    columns: optional column-alias list `name (a, b) AS ...`."""

    name: str
    query: Node  # Select, or SetOp for recursive bodies
    recursive: bool = False
    # pg 14 SEARCH clause: ("breadth"|"depth", by_cols, set_col). BREADTH
    # FIRST orders by ROW(depth, by); DEPTH FIRST threads a root-to-self
    # path array through the fixpoint (see _compile_recursive_cte)
    search: Optional[Tuple[str, Tuple[str, ...], str]] = None
    # pg 14 CYCLE clause: (cols, set_col, path_col, mark_value,
    # default_value) for `CYCLE cols SET set_col [TO mark DEFAULT deflt]
    # USING path_col`
    cycle: Optional[Tuple[Tuple[str, ...], str, str, object, object]] = None
    columns: Tuple[str, ...] = ()


@dataclass(frozen=True)
class Select(Node):
    items: Tuple[Node, ...]  # SelectItem | Star
    from_: Optional[Node] = None
    where: Optional[Node] = None
    group_by: Tuple[Node, ...] = ()
    having: Optional[Node] = None
    order_by: Tuple[SortItem, ...] = ()
    limit: Optional[Node] = None  # Literal int or 'all'
    offset: Optional[Node] = None
    limit_ties: bool = False  # FETCH FIRST n ROWS WITH TIES
    distinct: bool = False
    distinct_on: Tuple[Node, ...] = ()  # pg DISTINCT ON (reference xfail)
    ctes: Tuple[CTE, ...] = ()
    windows: Tuple[Tuple[str, WindowSpec], ...] = ()  # pg WINDOW clause
    qualify: Optional[Node] = None  # QUALIFY (DuckDB/Snowflake/BigQuery):
    # post-window row filter; evaluated after windows, before DISTINCT


@dataclass(frozen=True)
class SetOp(Node):
    """UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] — beyond-parity
    (reference docs/SQL_Support.md:19 lists set ops as unsupported)."""

    op: str  # 'union' | 'union all' | 'intersect' | 'intersect all' | 'except' | 'except all'
    left: Node
    right: Node
    order_by: Tuple[SortItem, ...] = ()
    limit: Optional[Node] = None
    offset: Optional[Node] = None
    limit_ties: bool = False  # FETCH FIRST n ROWS WITH TIES


@dataclass(frozen=True)
class CopyFrom(Node):
    """COPY t FROM 'path' WITH (k 'v', ...)
    (reference: src/framequery/parser/_parser.py:516-524)."""

    table: str
    path: str
    options: Tuple[Tuple[str, str], ...] = ()


@dataclass(frozen=True)
class CopyTo(Node):
    """COPY t TO 'path', or pg's COPY (query) TO 'path' (query set, table
    empty — beyond parity, reference grammar only has the table form)."""

    table: str
    path: str
    options: Tuple[Tuple[str, str], ...] = ()
    query: Optional[Node] = None


@dataclass(frozen=True)
class CreateTableAs(Node):
    name: str
    query: Node  # Select | SetOp
    replace: bool = False
    materialized: bool = False  # CREATE MATERIALIZED VIEW (frozen, REFRESH)
    if_not_exists: bool = False  # CREATE TABLE IF NOT EXISTS ... AS
    temp: bool = False  # TEMP/TEMPORARY/UNLOGGED: never durably persisted
    view: bool = False  # CREATE VIEW: stays a lazy plan, never persisted


@dataclass(frozen=True)
class WithDml(Node):
    """WITH ctes AS (...) <INSERT|UPDATE|DELETE|MERGE>: pg CTEs attached
    to a data-modifying statement. The CTEs here are READ-ONLY sources
    visible to the DML (pg's data-modifying CTEs — DML inside WITH —
    are not supported and raise at parse time inside parse_with)."""

    ctes: Tuple["CTE", ...]
    stmt: Node


@dataclass(frozen=True)
class AlterRename(Node):
    """ALTER TABLE|VIEW [IF EXISTS] old RENAME TO new."""

    old: str
    new: str
    if_exists: bool = False


@dataclass(frozen=True)
class SetOption(Node):
    """SET [SESSION|LOCAL] name TO/= value (stored; SHOW reads it back)."""

    name: str
    value: str


@dataclass(frozen=True)
class ResetOption(Node):
    """RESET name | RESET ALL (name None = ALL)."""

    name: Optional[str] = None


@dataclass(frozen=True)
class Prepare(Node):
    """PREPARE name [(types)] AS <statement-text> — the statement body is
    stored as RAW SQL with $n placeholders; EXECUTE substitutes literal
    arguments token-aware and re-parses (types are accepted and ignored:
    scope tables are schemaless)."""

    name: str
    text: str


@dataclass(frozen=True)
class ExecutePrepared(Node):
    """EXECUTE name [(literal args)]."""

    name: str
    args: Tuple[Node, ...] = ()


@dataclass(frozen=True)
class Deallocate(Node):
    """DEALLOCATE [PREPARE] name | ALL (name None = ALL)."""

    name: Optional[str] = None


@dataclass(frozen=True)
class Utility(Node):
    """Accepted-and-ignored utility statements (BEGIN/COMMIT/ROLLBACK,
    VACUUM, ANALYZE, DISCARD, SAVEPOINT ...): pg clients issue them
    routinely; the engine has no transactions or planner statistics, so
    they are deliberate no-ops."""

    kind: str


@dataclass(frozen=True)
class RefreshMatView(Node):
    """REFRESH MATERIALIZED VIEW name — re-run the stored defining query."""

    name: str


@dataclass(frozen=True)
class DropTable(Node):
    names: Tuple[str, ...]
    if_exists: bool = False


@dataclass(frozen=True)
class ShowOption(Node):
    """SHOW <option> (reference: src/framequery/parser/_parser.py:551-555)."""

    option: str


@dataclass(frozen=True)
class InsertInto(Node):
    """INSERT INTO t [(cols)] SELECT ... | VALUES ...
    [ON CONFLICT (cols) DO NOTHING | DO UPDATE SET ... [WHERE c]]
    [RETURNING items] — beyond parity; appends to the scope entry
    (DataFrames are immutable: the scope is rebound to the union)."""

    table: str
    query: Node
    columns: Tuple[str, ...] = ()
    conflict_cols: Tuple[str, ...] = ()
    conflict_action: Optional[str] = None  # 'nothing' | 'update'
    conflict_assignments: Tuple[Tuple[str, Node], ...] = ()
    conflict_where: Optional[Node] = None
    returning: Tuple[Node, ...] = ()


@dataclass(frozen=True)
class Delete(Node):
    """DELETE FROM t [USING rels] [WHERE cond] [RETURNING items] — rebinds
    the scope entry to the filtered complement; with USING, rows matching
    some USING row under the WHERE are deleted (semi-join semantics)."""

    table: str
    where: Optional[Node] = None
    returning: Tuple[Node, ...] = ()
    using: Optional[Node] = None


@dataclass(frozen=True)
class Update(Node):
    """UPDATE t SET col = expr, ... [FROM rels] [WHERE cond]
    [RETURNING items] — rebinds the scope entry with conditional column
    replacement; with FROM, assignments may reference the joined rows
    (one arbitrary-but-deterministic match per target row, like pg)."""

    table: str
    assignments: Tuple[Tuple[str, Node], ...] = ()
    where: Optional[Node] = None
    returning: Tuple[Node, ...] = ()
    from_: Optional[Node] = None


@dataclass(frozen=True)
class MergeAction(Node):
    """One WHEN ... THEN ... arm of a MERGE statement."""

    kind: str  # 'update' | 'delete' | 'insert' | 'nothing'
    condition: Optional[Node] = None  # the AND <cond> refinement
    assignments: Tuple[Tuple[str, Node], ...] = ()  # update
    insert_columns: Tuple[str, ...] = ()  # insert; empty = positional
    insert_values: Tuple[Node, ...] = ()  # insert


@dataclass(frozen=True)
class Merge(Node):
    """PostgreSQL 15/17-style `MERGE INTO target USING source ON cond
    WHEN [NOT] MATCHED [BY SOURCE] [AND c] THEN ...` — beyond parity
    (the reference has no MERGE). Rebinds the target scope entry."""

    target: str
    source: Node  # TableRef or query node
    on: Node
    target_alias: Optional[str] = None
    source_alias: Optional[str] = None
    matched: Tuple[MergeAction, ...] = ()
    not_matched: Tuple[MergeAction, ...] = ()  # BY TARGET (default)
    not_matched_by_source: Tuple[MergeAction, ...] = ()
    # pg 17 MERGE ... RETURNING: one row per inserted/updated/deleted row
    # (post-image for insert/update, old image for delete); merge_action()
    # in the item list yields 'INSERT' | 'UPDATE' | 'DELETE'
    returning: Tuple[Node, ...] = ()


@dataclass(frozen=True)
class Pivot(Node):
    """DuckDB-style PIVOT statement: `PIVOT source ON col [IN (v, ...)]
    USING agg(expr) [AS alias] [GROUP BY cols] [ORDER BY ...]`. Dynamic
    column discovery (no IN list) collects the DISTINCT pivot values —
    bounded, like every engine's dynamic pivot. Beyond parity — the
    reference has no PIVOT."""

    source: Node  # TableRef or query node
    on_col: str
    using: Node  # aggregate Call
    using_alias: Optional[str] = None
    in_values: Tuple[Node, ...] = ()  # literals; empty = dynamic
    group_by: Tuple[str, ...] = ()  # empty = all remaining columns
    order_by: Tuple[SortItem, ...] = ()


@dataclass(frozen=True)
class Unpivot(Node):
    """DuckDB-style UNPIVOT statement: `UNPIVOT source ON c1, c2, ... INTO
    NAME name_col VALUE value_col` — melts the ON columns into
    (name, value) rows, dropping NULL values (DuckDB default)."""

    source: Node
    on_cols: Tuple[str, ...]
    name_col: str = "name"
    value_col: str = "value"


@dataclass(frozen=True)
class Describe(Node):
    """DESCRIBE t — (col_name, data_type) rows from the frame's schema."""

    table: str


@dataclass(frozen=True)
class Explain(Node):
    """EXPLAIN [ANALYZE] <query> — returns the Spark physical plan as rows
    (pg surface shape; the plan text is Catalyst's, which is the truth for
    this engine). Beyond parity — the reference has no EXPLAIN."""

    query: Node
    analyze: bool = False


Statement = Union[Select, SetOp, CopyFrom, CopyTo, CreateTableAs, DropTable,
                  ShowOption, Explain]
