"""Time-series joins: as-of join and banded range join.

The reference (chmp/framequery) has no time-series joins at all — its join
surface is equi/theta joins over pandas frames (see
/root/reference/src/framequery/executor/_pandas.py:131-214). These operators
extend the engine for event-stream / feature-lookup workloads, designed for
the 100 TB contract:

  - as-of join: implemented as a *union + window* pass — both sides are
    tagged and unioned, shuffled ONCE on the join key, sorted by (ts,
    tiebreak) within each key, and the most recent right-side payload is
    carried forward with last(ignorenulls) over an unbounded-preceding
    frame. No cross product, no per-row lookup, no range explosion: cost is
    one shuffle + one sort, identical to a groupBy on the key. This is the
    shape that survives a 1000-executor cluster; a naive
    "join on key + filter ts, keep max" would build |left|x|right| rows per
    key first.

  - range join: the classic band-bucket rewrite. An inequality predicate
    `r.ts in [l.ts - tol, l.ts)` becomes an equi-join on (key, time_bucket)
    with the left side exploded into the at-most-two buckets its window
    spans (bucket width == tol), then an exact filter. Catalyst executes a
    hash shuffle join instead of a broadcast-nested-loop over the
    inequality, so the plan scales with matching pairs, not with
    |left|x|right| per key.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_seconds(col):
    """Epoch seconds (fractional) from a time-ish column. The intermediate
    cast("timestamp") makes TIMESTAMP_NTZ inputs work (Spark >=4.1 reads
    parquet TIMESTAMP(NANOS) as NTZ, which cannot cast to double directly)
    and is the identity for TIMESTAMP and for numeric epoch-second
    columns."""
    return col.cast("timestamp").cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: List[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[List[str]] = None,
              suffix: str = "_right",
              strict: bool = True,
              tolerance_seconds: Optional[float] = None,
              tiebreak: Optional[str] = None,
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts < left.ts (or <= when strict=False), matching on `on` keys.
    direction="forward" flips the time sense: the EARLIEST right row with
    right.ts > left.ts (>= when strict=False) — pandas merge_asof's
    direction parameter; same single-shuffle plan, the window just scans
    time descending.

    Left rows with no prior (next, for forward) right row keep NULLs
    (left-outer semantics, matching DuckDB/pandas ASOF LEFT JOIN
    "backward").

    Implementation: tag rows, union, window. The only shuffle is the
    window's partitionBy(on) — the same cost as one groupBy over the union.
    Ties: with strict=True a right row at exactly left.ts must NOT match,
    so left sorts before right at equal ts; with strict=False it must, so
    right sorts first. Among right rows sharing the same ts, the one with
    the greatest `tiebreak` column wins (pass one for deterministic output).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    forward = direction == "forward"
    right_cols = right_cols or [c for c in right.columns
                                if c not in on and c != right_ts]
    out_names = [c + suffix if c in left.columns else c for c in right_cols]

    left_payload = F.struct(*[F.col(c) for c in left.columns])
    right_payload = F.struct(*[F.col(c).alias(c) for c in right_cols + ([right_ts] if right_ts not in right_cols else [])])

    # strict: left(tiebreak 0) before right(1) at equal ts -> equal-ts right
    # rows are not yet visible. non-strict: right first.
    l_tb, r_tb = (0, 1) if strict else (1, 0)

    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(l_tb).alias("__tb"),
        F.lit(1).alias("__is_left"),
        left_payload.alias("__l"),
        F.lit(None).cast(
            right.select(right_payload.alias("x")).schema["x"].dataType
        ).alias("__r"),
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_tb).alias("__tb"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(left_payload.alias("x")).schema["x"].dataType
        ).alias("__l"),
        right_payload.alias("__r"),
    )

    ts_ord = F.col("__ts").desc() if forward else F.col("__ts").asc()
    order = [ts_ord, F.col("__tb")]
    if tiebreak is not None:
        # right rows carry the tiebreak inside __r; left rows sort as NULL
        # which Spark places first ascending — harmless, ordering among
        # left rows at the same instant does not affect the carried value.
        order.append(F.col(f"__r.{tiebreak}").asc_nulls_first())
    w = (Window.partitionBy(*on)
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l.unionByName(r)
               .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
               .filter(F.col("__is_left") == 1))

    if tolerance_seconds is not None:
        gap = (_ts_seconds(F.col(f"__m.{right_ts}")) - _ts_seconds(F.col("__ts"))
               if forward else
               _ts_seconds(F.col("__ts")) - _ts_seconds(F.col(f"__m.{right_ts}")))
        in_tol = gap <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m")))

    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(o) for c, o in zip(right_cols, out_names)],
    )
    return out


def range_join(left: DataFrame, right: DataFrame, on: List[str],
               left_ts: str = "ts", right_ts: str = "ts",
               lower_seconds: float = 0.0, upper_seconds: float = 3600.0,
               suffix: str = "_right") -> DataFrame:
    """Pairs (l, r) matching on keys with
    l.ts - upper <= r.ts < l.ts - lower  (i.e. r happened between `lower`
    and `upper` seconds before l; lower=0 means "up to and excluding l.ts").

    Band-bucket rewrite: bucket width = (upper - lower); each left row's
    admissible window spans at most two buckets, so the left side explodes
    x2 into (key, bucket) and the join is a plain equi shuffle join,
    followed by the exact range filter.
    """
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")

    r_cols = [c for c in right.columns if c not in on]
    renamed = right
    for c in r_cols:
        if c in left.columns:
            renamed = renamed.withColumnRenamed(c, c + suffix)
    r_ts_out = right_ts + suffix if right_ts in left.columns else right_ts

    r_b = renamed.withColumn(
        "__bucket", F.floor(_ts_seconds(F.col(r_ts_out)) / width))
    # left window [ts-upper, ts-lower) spans buckets floor((ts-upper)/w) ..
    # floor((ts-lower)/w) — at most 2 consecutive buckets since the window
    # length equals the bucket width.
    lo = _ts_seconds(F.col(left_ts)) - F.lit(float(upper_seconds))
    hi = _ts_seconds(F.col(left_ts)) - F.lit(float(lower_seconds))
    l_b = left.withColumn(
        "__bucket",
        F.explode(F.array_distinct(F.array(F.floor(lo / width),
                                           F.floor(hi / width)))))

    joined = l_b.join(r_b, on=on + ["__bucket"], how="inner")
    rd = _ts_seconds(F.col(r_ts_out))
    exact = joined.filter((rd >= lo) & (rd < hi))
    return exact.drop("__bucket")


def time_bucket_gapfill(df: DataFrame, ts_col: str = "ts",
                        key_col: str = "user_id",
                        value_col: str = "value",
                        bucket: str = "hour",
                        agg: str = "sum") -> DataFrame:
    """TimescaleDB-style gap-filled rollup (`time_bucket_gapfill` + `locf`):
    per-key bucket aggregates on a DENSE time grid — every bucket between
    the key's first and last event exists, with NULL for empty buckets and
    a last-observation-carried-forward column beside it.

    Returns (key_col, bucket_ts, <agg>_<value_col> nullable, locf,
    interpolated) — locf carries the last observation forward, interpolated
    fills interior gaps linearly between the bracketing observations
    (TimescaleDB's locf()/interpolate() pair); leading/trailing gaps stay
    NULL in interpolated.

    Scale shape (the hypertable contract): the aggregate is one groupBy
    shuffle on (key, bucket); the dense grid comes from a per-key (min,
    max) aggregate exploded JVM-side with `sequence` over intervals —
    grid size = keys x buckets, generated distributed, never on the
    driver; grid ⋈ agg is an equi join on (key, bucket); the fill is ONE
    window (last ignorenulls over unbounded preceding). Nothing is
    quadratic and nothing round-trips.

    `bucket` is a date_trunc unit (hour/day/week/...) so bucket edges are
    calendar-exact and byte-identical across engines.
    """
    _STEP = {"minute": "INTERVAL 1 MINUTE", "hour": "INTERVAL 1 HOUR",
             "day": "INTERVAL 1 DAY", "week": "INTERVAL 7 DAY"}
    if bucket not in _STEP:
        raise ValueError(f"bucket must be one of {sorted(_STEP)}")
    if agg not in ("sum", "count", "avg", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")

    b = F.date_trunc(bucket, F.col(ts_col))
    out_val = f"{agg}_{value_col}"
    agg_fn = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)),
              "avg": F.avg, "min": F.min, "max": F.max}[agg]
    per_bucket = (df
                  .select(F.col(key_col), b.alias("bucket_ts"),
                          F.col(value_col))
                  .groupBy(key_col, "bucket_ts")
                  .agg(F.round(agg_fn(F.col(value_col)), 6).alias(out_val)))

    step = F.expr(_STEP[bucket])
    grid = (df.select(F.col(key_col), b.alias("__b"))
            .groupBy(key_col)
            .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
            .select(F.col(key_col),
                    F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step))
                    .alias("bucket_ts")))

    filled = grid.join(per_bucket, [key_col, "bucket_ts"], "left")
    wp = (Window.partitionBy(key_col).orderBy("bucket_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key_col).orderBy("bucket_ts")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    # linear interpolation needs the bracketing non-null values AND their
    # bucket positions; epoch seconds of the bucket are the x axis
    x = F.col("bucket_ts").cast("timestamp").cast("double")
    prev_v = F.last(out_val, ignorenulls=True).over(wp)
    prev_x = F.last(F.when(F.col(out_val).isNotNull(), x),
                    ignorenulls=True).over(wp)
    next_v = F.first(out_val, ignorenulls=True).over(wf)
    next_x = F.first(F.when(F.col(out_val).isNotNull(), x),
                     ignorenulls=True).over(wf)
    interp = F.when(F.col(out_val).isNotNull(), F.col(out_val)).otherwise(
        F.when(prev_v.isNotNull() & next_v.isNotNull(),
               prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x)))
    return filled.select(
        key_col, "bucket_ts", out_val,
        prev_v.alias("locf"),
        F.round(interp, 6).alias("interpolated"))
