"""PostgreSQL range types (int4range / int8range / numrange / daterange /
tsrange / tstzrange) over Spark structs.

The reference engine has no range support; this is beyond-reference pg
surface. A range value is a struct

    (lo, hi, lo_inc boolean, hi_inc boolean, is_empty boolean)

with NULL lo/hi meaning an infinite bound (pg's missing bound). Discrete
ranges (int4/int8/date) canonicalize to inclusive-lower / exclusive-upper
exactly like pg — ``[1,3]`` and ``[1,4)`` are the same value — so equality,
adjacency, and the struct comparison all work structurally. Everything is
built from JVM Column expressions; no UDFs.

Dispatch is static: the compiler routes ``@> <@ && << >> + * -`` and
``-|-`` to these builders when either operand is statically range-typed
(a ``::int4range`` cast, a range constructor call, or an expression built
from them). Range values that reach an operator only through a column
reference need a cast to re-mark them — a documented limitation of
schema-free dispatch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

# subtype cast target per range type
RANGE_TYPES = {
    "int4range": "int", "int8range": "long", "numrange": "decimal(38,18)",
    "daterange": "date", "tsrange": "timestamp", "tstzrange": "timestamp",
}
# discrete ranges canonicalize with this step
_DISCRETE_STEP = {"int4range": 1, "int8range": 1, "daterange": 1}


def _struct(lo, hi, lo_inc, hi_inc, empty) -> Column:
    return F.struct(lo.alias("lo"), hi.alias("hi"),
                    lo_inc.alias("lo_inc"), hi_inc.alias("hi_inc"),
                    empty.alias("is_empty"))


def _step_add(rtype: str, c: Column, n: int) -> Column:
    if rtype == "daterange":
        return F.date_add(c, n)
    return c + F.lit(n)


def make_range(rtype: str, lo: Column, hi: Column,
               bounds: str = "[)") -> Column:
    """Range constructor with pg canonicalization and bound validation."""
    if rtype not in RANGE_TYPES:
        raise ValueError(f"unknown range type {rtype!r}")
    if bounds not in ("[)", "[]", "()", "(]"):
        raise ValueError(f"invalid range bounds flags {bounds!r}")
    t = RANGE_TYPES[rtype]
    lo = lo.cast(t)
    hi = hi.cast(t)
    lo_inc = F.lit(bounds[0] == "[") & lo.isNotNull()
    hi_inc = F.lit(bounds[1] == "]") & hi.isNotNull()
    if rtype in _DISCRETE_STEP:
        # canonical form [lo, hi): bump an exclusive lower / inclusive
        # upper by one step (pg does exactly this for discrete subtypes)
        lo = F.when(lo.isNotNull() & ~lo_inc, _step_add(rtype, lo, 1)) \
            .otherwise(lo)
        hi = F.when(hi.isNotNull() & hi_inc, _step_add(rtype, hi, 1)) \
            .otherwise(hi)
        lo_inc = lo.isNotNull()
        hi_inc = F.lit(False)
    both = lo.isNotNull() & hi.isNotNull()
    # pg: lower > upper is an error, lower == upper (unless []) is empty
    bad = both & (lo > hi)
    empty = both & (lo == hi) & ~(lo_inc & hi_inc)
    lo_c = F.when(bad, F.raise_error(F.lit(
        "range lower bound must be less than or equal to range upper "
        "bound")).cast(t)).otherwise(lo)
    return _struct(F.when(empty, F.lit(None).cast(t)).otherwise(lo_c),
                   F.when(empty, F.lit(None).cast(t)).otherwise(hi),
                   ~empty & lo_inc, ~empty & hi_inc, empty)


def parse_range_literal(rtype: str, text: str) -> Column:
    """Compile-time parse of pg range text ('[1,5)', 'empty', '(,3]')."""
    t = text.strip()
    subtype = RANGE_TYPES[rtype]
    if t.lower() == "empty":
        null = F.lit(None).cast(subtype)
        return _struct(null, null, F.lit(False), F.lit(False), F.lit(True))
    if len(t) < 3 or t[0] not in "[(" or t[-1] not in ")]":
        raise ValueError(f"malformed range literal: {text!r}")
    body = t[1:-1]
    if "," not in body:
        raise ValueError(f"malformed range literal: {text!r}")
    lo_s, hi_s = body.split(",", 1)

    def bound(s: str) -> Column:
        s = s.strip().strip('"')
        if s == "" or s.lower() in ("infinity", "-infinity"):
            return F.lit(None).cast(subtype)
        return F.lit(s).cast(subtype)

    return make_range(rtype, bound(lo_s), bound(hi_s), t[0] + t[-1])


# ------------------------------------------------------------- comparisons

def _lo_le_point(r: Column, x: Column) -> Column:
    """range lower bound <= point x (true for an infinite lower bound)."""
    return r["lo"].isNull() | (r["lo"] < x) | (r["lo_inc"] & (r["lo"] == x))


def _hi_ge_point(r: Column, x: Column) -> Column:
    return r["hi"].isNull() | (x < r["hi"]) | (r["hi_inc"] & (r["hi"] == x))


def contains_elem(r: Column, x: Column) -> Column:
    return ~r["is_empty"] & x.isNotNull() & _lo_le_point(r, x) \
        & _hi_ge_point(r, x)


def _lo_le_lo(a: Column, b: Column) -> Column:
    """a's lower bound extends at least as low as b's."""
    return a["lo"].isNull() | (
        b["lo"].isNotNull() & (
            (a["lo"] < b["lo"])
            | ((a["lo"] == b["lo"]) & (a["lo_inc"] | ~b["lo_inc"]))))


def _hi_ge_hi(a: Column, b: Column) -> Column:
    return a["hi"].isNull() | (
        b["hi"].isNotNull() & (
            (b["hi"] < a["hi"])
            | ((a["hi"] == b["hi"]) & (a["hi_inc"] | ~b["hi_inc"]))))


def contains_range(a: Column, b: Column) -> Column:
    return b["is_empty"] | (~a["is_empty"]
                            & _lo_le_lo(a, b) & _hi_ge_hi(a, b))


def _lo_before_hi(a: Column, b: Column) -> Column:
    """a's lower bound starts no later than b's upper bound ends (i.e.
    there can be a common point on that side)."""
    return a["lo"].isNull() | b["hi"].isNull() | (a["lo"] < b["hi"]) | (
        (a["lo"] == b["hi"]) & a["lo_inc"] & b["hi_inc"])


def range_overlaps(a: Column, b: Column) -> Column:
    return ~a["is_empty"] & ~b["is_empty"] \
        & _lo_before_hi(a, b) & _lo_before_hi(b, a)


def strictly_left(a: Column, b: Column) -> Column:
    return ~a["is_empty"] & ~b["is_empty"] \
        & a["hi"].isNotNull() & b["lo"].isNotNull() & (
            (a["hi"] < b["lo"])
            | ((a["hi"] == b["lo"]) & ~(a["hi_inc"] & b["lo_inc"])))


def adjacent(a: Column, b: Column) -> Column:
    """-|-: the ranges touch without overlapping (either order)."""

    def touch(x, y):
        return x["hi"].isNotNull() & y["lo"].isNotNull() \
            & (x["hi"] == y["lo"]) & (x["hi_inc"] != y["lo_inc"])

    return ~a["is_empty"] & ~b["is_empty"] & (touch(a, b) | touch(b, a))


# -------------------------------------------------------------- set algebra

def _pick_lower(a: Column, b: Column):
    """(lo, lo_inc) of whichever range extends lower."""
    a_lower = _lo_le_lo(a, b)
    return (F.when(a_lower, a["lo"]).otherwise(b["lo"]),
            F.when(a_lower, a["lo_inc"]).otherwise(b["lo_inc"]))


def _pick_upper(a: Column, b: Column):
    a_higher = _hi_ge_hi(a, b)
    return (F.when(a_higher, a["hi"]).otherwise(b["hi"]),
            F.when(a_higher, a["hi_inc"]).otherwise(b["hi_inc"]))


def range_union(rtype: str, a: Column, b: Column) -> Column:
    """+: pg errors when the result would not be contiguous."""
    lo, lo_inc = _pick_lower(a, b)
    hi, hi_inc = _pick_upper(a, b)
    merged = _struct(lo, hi, lo_inc, hi_inc, F.lit(False))
    ok = range_overlaps(a, b) | adjacent(a, b)
    # raise_error is NullType — it coerces into the struct-typed when/
    # otherwise and fires only when the branch is taken
    err = F.raise_error(
        F.lit("result of range union would not be contiguous"))
    return F.when(a["is_empty"], b).when(b["is_empty"], a) \
        .when(ok, merged).otherwise(err)


def _empty_range(rtype: str) -> Column:
    null = F.lit(None).cast(RANGE_TYPES[rtype])
    return _struct(null, null, F.lit(False), F.lit(False), F.lit(True))


def range_intersect(rtype: str, a: Column, b: Column) -> Column:
    """*: the common sub-range (possibly empty).  The tighter bound on
    each side wins: b's lower when a extends lower, and vice versa."""
    a_lower = _lo_le_lo(a, b)
    lo = F.when(a_lower, b["lo"]).otherwise(a["lo"])
    lo_inc = F.when(a_lower, b["lo_inc"]).otherwise(a["lo_inc"])
    a_higher = _hi_ge_hi(a, b)
    hi = F.when(a_higher, b["hi"]).otherwise(a["hi"])
    hi_inc = F.when(a_higher, b["hi_inc"]).otherwise(a["hi_inc"])
    return F.when(~range_overlaps(a, b), _empty_range(rtype)) \
        .otherwise(_struct(lo, hi, lo_inc, hi_inc, F.lit(False)))


# --------------------------------------------------------------- accessors

def range_lower(r: Column) -> Column:
    return F.when(~r["is_empty"], r["lo"])


def range_upper(r: Column) -> Column:
    return F.when(~r["is_empty"], r["hi"])


def range_isempty(r: Column) -> Column:
    return r["is_empty"]


def range_lower_inc(r: Column) -> Column:
    return r["lo_inc"]


def range_upper_inc(r: Column) -> Column:
    return r["hi_inc"]


def range_lower_inf(r: Column) -> Column:
    return ~r["is_empty"] & r["lo"].isNull()


def range_upper_inf(r: Column) -> Column:
    return ~r["is_empty"] & r["hi"].isNull()
