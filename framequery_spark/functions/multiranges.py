"""PostgreSQL 14 multirange types (int4multirange / int8multirange /
nummultirange / datemultirange / tsmultirange / tstzmultirange) over Spark
arrays of range structs.

The reference engine has no range support; this is beyond-reference pg
surface layered on :mod:`framequery_spark.functions.ranges`. A multirange
value is an ``array<range struct>`` in canonical form: empties dropped,
ranges sorted by lower bound, overlapping or adjacent members merged — so
``{[1,3),[2,5)}`` and ``{[1,5)}`` are the same array value and equality is
structural, exactly like pg's canonical multirange form. Everything is
pure JVM Column expressions (array HOFs: transform / filter / aggregate /
array_sort); no UDFs, no shuffles — every operator is row-local.

Set algebra closes here: multirange difference is total (an array can hold
a split result), and the range ``-`` operator borrows
:func:`range_minus_pieces` to return the single surviving piece, raising
pg's "result of range difference would not be contiguous" only when the
subtraction genuinely splits (pg behavior; previously any ``-`` raised).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import ranges as _rg
from .ranges import RANGE_TYPES, _struct

# multirange type -> underlying range type
MULTIRANGE_TYPES = {
    "int4multirange": "int4range", "int8multirange": "int8range",
    "nummultirange": "numrange", "datemultirange": "daterange",
    "tsmultirange": "tsrange", "tstzmultirange": "tstzrange",
}


def _struct_ddl(rtype: str) -> str:
    t = RANGE_TYPES[rtype]
    return (f"struct<lo:{t},hi:{t},lo_inc:boolean,hi_inc:boolean,"
            "is_empty:boolean>")


def empty_multirange(rtype: str) -> Column:
    return F.array().cast(f"array<{_struct_ddl(rtype)}>")


def _full_range(rtype: str) -> Column:
    null = F.lit(None).cast(RANGE_TYPES[rtype])
    return _struct(null, null, F.lit(False), F.lit(False), F.lit(False))


# ---------------------------------------------------------- canonical form

def _cmp_ranges(x: Column, y: Column) -> Column:
    """array_sort comparator: infinite lower first, then lower bound,
    inclusive-lower before exclusive (ties beyond that cannot matter —
    overlapping members merge anyway)."""
    xr = F.when(x["lo"].isNull(), 0).otherwise(1)
    yr = F.when(y["lo"].isNull(), 0).otherwise(1)
    return (F.when(xr < yr, -1).when(xr > yr, 1)
            .when((xr == 1) & (x["lo"] < y["lo"]), -1)
            .when((xr == 1) & (x["lo"] > y["lo"]), 1)
            .when(x["lo_inc"] & ~y["lo_inc"], -1)
            .when(~x["lo_inc"] & y["lo_inc"], 1)
            .otherwise(0))


def _merge2(a: Column, b: Column) -> Column:
    """Union of two overlapping-or-adjacent ranges (no contiguity check —
    the caller guarantees it)."""
    lo, lo_inc = _rg._pick_lower(a, b)
    hi, hi_inc = _rg._pick_upper(a, b)
    return _struct(lo, hi, lo_inc, hi_inc, F.lit(False))


def canonicalize(rtype: str, arr: Column) -> Column:
    """Canonical multirange form of an arbitrary array of ranges: drop
    empties, sort by lower bound, merge overlapping/adjacent neighbours.
    Row-local (one aggregate fold over an in-row array).

    The fold's accumulator is ``{done: array, cur: range}`` — the open
    island is carried OUTSIDE the array, so a merge step rebuilds only the
    2-field struct (the ``done`` array passes through by reference) and the
    array is copied only when an island closes.  The previous shape
    (slice+concat of the whole accumulated array on every step) was O(n²)
    element copies per group, which dominated range_agg over large groups
    (q68: 30k ranges/segment).  Fold order and the pairwise merge are
    unchanged, so the resulting array is identical."""
    live = F.array_sort(F.filter(arr, lambda r: ~r["is_empty"]),
                        _cmp_ranges)
    empty = empty_multirange(rtype)
    null_r = F.lit(None).cast(_struct_ddl(rtype))

    def step(acc: Column, r: Column) -> Column:
        done, cur = acc["done"], acc["cur"]
        mergeable = _rg.range_overlaps(cur, r) | _rg.adjacent(cur, r)
        return (F.when(cur.isNull(),
                       F.struct(done.alias("done"), r.alias("cur")))
                .when(mergeable,
                      F.struct(done.alias("done"),
                               _merge2(cur, r).alias("cur")))
                .otherwise(
                    F.struct(F.concat(done, F.array(cur)).alias("done"),
                             r.alias("cur"))))

    def finish(acc: Column) -> Column:
        return (F.when(acc["cur"].isNull(), acc["done"])
                .otherwise(F.concat(acc["done"], F.array(acc["cur"]))))

    init = F.struct(empty.alias("done"), null_r.alias("cur"))
    return F.aggregate(live, init, step, finish)


def make_multirange(rtype: str, range_cols: Sequence[Column]) -> Column:
    """Constructor: int4multirange(r1, r2, ...) with zero or more ranges."""
    if rtype not in MULTIRANGE_TYPES:
        raise ValueError(f"unknown multirange type {rtype!r}")
    sub = MULTIRANGE_TYPES[rtype]
    if not range_cols:
        return empty_multirange(sub)
    return canonicalize(sub, F.array(*range_cols))


def _split_range_texts(body: str) -> List[str]:
    """Split the body of '{[1,3),(5,9]}' into range texts; bounds may be
    quoted strings containing commas or brackets."""
    out, cur, in_quote, in_range = [], [], False, False
    for ch in body:
        if in_quote:
            cur.append(ch)
            if ch == '"':
                in_quote = False
            continue
        if ch == '"':
            in_quote = True
            cur.append(ch)
            continue
        if not in_range:
            if ch in " ,":
                continue
            if ch not in "[(":
                raise ValueError(f"malformed multirange body: {body!r}")
            in_range = True
            cur.append(ch)
            continue
        cur.append(ch)
        if ch in ")]":
            out.append("".join(cur))
            cur, in_range = [], False
    if in_range or in_quote:
        raise ValueError(f"malformed multirange body: {body!r}")
    return out


def parse_multirange_literal(mrtype: str, text: str) -> Column:
    """Compile-time parse of pg multirange text ('{[1,3),[5,7)}', '{}')."""
    rtype = MULTIRANGE_TYPES[mrtype]
    t = text.strip()
    if len(t) < 2 or t[0] != "{" or t[-1] != "}":
        raise ValueError(f"malformed multirange literal: {text!r}")
    parts = _split_range_texts(t[1:-1])
    if not parts:
        return empty_multirange(rtype)
    return canonicalize(
        rtype, F.array(*[_rg.parse_range_literal(rtype, p) for p in parts]))


# ------------------------------------------------------- range subtraction

def range_minus_pieces(rtype: str, a: Column, b: Column) -> Column:
    """``a - b`` for single ranges as an array of 0–2 non-empty ranges
    (the multirange-difference kernel, also backing the range ``-``
    operator). Canonical-form inputs yield canonical pieces: for discrete
    subtypes ``b`` is [lo, hi), so the left piece ends exclusive at b.lo
    and the right piece starts inclusive at b.hi."""
    empty = empty_multirange(rtype)
    no_overlap = b["is_empty"] | ~_rg.range_overlaps(a, b)
    # left piece exists iff a's lower extends strictly below b's
    lower_strict = ~_rg._lo_le_lo(b, a)
    left = _struct(a["lo"], b["lo"], a["lo_inc"], ~b["lo_inc"],
                   F.lit(False))
    # right piece exists iff a's upper extends strictly above b's
    upper_strict = ~_rg._hi_ge_hi(b, a)
    right = _struct(b["hi"], a["hi"], ~b["hi_inc"], a["hi_inc"],
                    F.lit(False))
    pieces = F.concat(
        F.when(lower_strict, F.array(left)).otherwise(empty),
        F.when(upper_strict, F.array(right)).otherwise(empty))
    return (F.when(a["is_empty"], empty)
            .when(no_overlap, F.array(a))
            .otherwise(pieces))


def range_difference(rtype: str, a: Column, b: Column) -> Column:
    """Range ``-`` operator: the surviving piece, pg's contiguity error
    when the subtraction splits ``a`` in two; NULL operands propagate
    (a NULL struct's NULL bounds would otherwise read as infinities)."""
    pieces = range_minus_pieces(rtype, a, b)
    err = F.raise_error(
        F.lit("result of range difference would not be contiguous"))
    return (F.when(a.isNull() | b.isNull(),
                   F.lit(None).cast(_struct_ddl(rtype)))
            .when(F.size(pieces) == 1, F.element_at(pieces, 1))
            .when(F.size(pieces) == 0, _rg._empty_range(rtype))
            .otherwise(err))


# ------------------------------------------------------------- set algebra

def mr_union(rtype: str, a: Column, b: Column) -> Column:
    return canonicalize(rtype, F.concat(a, b))


def mr_intersect(rtype: str, a: Column, b: Column) -> Column:
    pairs = F.flatten(F.transform(
        a, lambda x: F.filter(
            F.transform(b, lambda y: _rg.range_intersect(rtype, x, y)),
            lambda z: ~z["is_empty"])))
    # canonical inputs yield sorted disjoint pieces, but adjacent results
    # can appear from touching inputs — canonicalize to be safe
    return canonicalize(rtype, pairs)


def mr_difference(rtype: str, a: Column, b: Column) -> Column:
    def subtract_all(x: Column) -> Column:
        return F.aggregate(
            b, F.array(x),
            lambda acc, y: F.flatten(F.transform(
                acc, lambda p: range_minus_pieces(rtype, p, y))))

    return canonicalize(rtype, F.flatten(F.transform(a, subtract_all)))


# ------------------------------------------------------------- comparisons

def mr_contains_elem(mr: Column, x: Column) -> Column:
    # exists() is false on an empty array and NULL on a NULL one — pg's
    # strict-operator NULL propagation for free
    return F.exists(mr, lambda r: _rg.contains_elem(r, x))


def mr_contains_range(mr: Column, r: Column) -> Column:
    # canonical members are disjoint and non-adjacent, so a contained
    # range must sit inside a single member
    return r["is_empty"] | F.exists(
        mr, lambda m: _rg.contains_range(m, r))


def mr_contains_mr(a: Column, b: Column) -> Column:
    return F.forall(b, lambda r: mr_contains_range(a, r))


def mr_overlaps_mr(a: Column, b: Column) -> Column:
    return F.exists(a, lambda x: F.exists(
        b, lambda y: _rg.range_overlaps(x, y)))


def mr_overlaps_range(mr: Column, r: Column) -> Column:
    return F.exists(mr, lambda m: _rg.range_overlaps(m, r))


def mr_strictly_left(a: Column, b: Column) -> Column:
    """<<: every point of a is below every point of b — canonical order
    makes that a single comparison of a's last vs b's first member.
    element_at sits in a lazy CASE branch (ANSI mode errors on
    out-of-bounds indexes, so the empty case must short-circuit)."""
    return F.when((F.size(a) > 0) & (F.size(b) > 0),
                  _rg.strictly_left(F.element_at(a, -1),
                                    F.element_at(b, 1))) \
        .otherwise(F.when(a.isNull() | b.isNull(),
                          F.lit(None).cast("boolean")).otherwise(False))


def mr_adjacent(a: Column, b: Column) -> Column:
    """-|-: pg's multirange_adjacent_multirange tests range adjacency of
    the extreme members only (last-of-a vs first-of-b and vice versa) —
    overlapping multiranges can still be adjacent on the other flank, so
    there is deliberately NO non-overlap conjunction here."""
    touch = _rg.adjacent(F.element_at(a, -1), F.element_at(b, 1)) \
        | _rg.adjacent(F.element_at(b, -1), F.element_at(a, 1))
    return F.when((F.size(a) > 0) & (F.size(b) > 0), touch) \
        .otherwise(F.when(a.isNull() | b.isNull(),
                          F.lit(None).cast("boolean")).otherwise(False))


# --------------------------------------------------------------- accessors

def mr_lower(mr: Column) -> Column:
    return F.when(F.size(mr) > 0, F.element_at(mr, 1)["lo"])


def mr_upper(mr: Column) -> Column:
    return F.when(F.size(mr) > 0, F.element_at(mr, -1)["hi"])


def mr_isempty(mr: Column) -> Column:
    return F.size(mr) == 0


def mr_lower_inc(mr: Column) -> Column:
    # false on empty, NULL on NULL input (size(NULL) is NULL, so the
    # otherwise branch's element_at of a NULL array yields NULL)
    return F.when(F.size(mr) == 0, F.lit(False)) \
        .otherwise(F.element_at(mr, 1)["lo_inc"])


def mr_upper_inc(mr: Column) -> Column:
    return F.when(F.size(mr) == 0, F.lit(False)) \
        .otherwise(F.element_at(mr, -1)["hi_inc"])


def mr_lower_inf(mr: Column) -> Column:
    return F.when(F.size(mr) == 0, F.lit(False)) \
        .otherwise(F.element_at(mr, 1)["lo"].isNull())


def mr_upper_inf(mr: Column) -> Column:
    return F.when(F.size(mr) == 0, F.lit(False)) \
        .otherwise(F.element_at(mr, -1)["hi"].isNull())


def range_merge_mr(rtype: str, mr: Column) -> Column:
    """range_merge(multirange): the smallest range covering every member
    ('empty' for an empty multirange, NULL for NULL — a struct of NULL
    fields is NOT a NULL struct, so the merge must short-circuit)."""
    first = F.element_at(mr, 1)
    last = F.element_at(mr, -1)
    merged = _struct(first["lo"], last["hi"], first["lo_inc"],
                     last["hi_inc"], F.lit(False))
    return F.when(mr.isNull(), F.lit(None).cast(_struct_ddl(rtype))) \
        .when(F.size(mr) == 0, _rg._empty_range(rtype)) \
        .otherwise(merged)


def multirange_of(rtype: str, r: Column) -> Column:
    """multirange(r): the singleton (or empty, for an empty r) multirange;
    NULL propagates (canonicalize would silently drop a NULL element)."""
    return F.when(r.isNull(),
                  F.lit(None).cast(f"array<{_struct_ddl(rtype)}>")) \
        .when(r["is_empty"], empty_multirange(rtype)) \
        .otherwise(F.array(r))


# --------------------------------------------------------------- aggregates

def range_agg(rtype: str, r: Column) -> Column:
    """pg 14 range_agg(anyrange) -> anymultirange: the union of the
    group's ranges. collect_list is bounded by the group's row count —
    the same O(group) memory pg's own range_agg transition state uses."""
    return canonicalize(rtype, F.collect_list(r))


def range_intersect_agg(rtype: str, r: Column) -> Column:
    """pg 14 range_intersect_agg(anyrange) -> anyrange: fold of * over
    the group (NULL for an empty group, like pg)."""
    collected = F.collect_list(r)
    folded = F.aggregate(
        collected, _full_range(rtype),
        lambda acc, x: _rg.range_intersect(rtype, acc, x))
    return F.when(F.size(collected) == 0,
                  F.lit(None).cast(_struct_ddl(rtype))).otherwise(folded)
