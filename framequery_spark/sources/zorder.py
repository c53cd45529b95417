"""Z-order (Morton) clustering for multi-column data skipping.

Parquet readers skip row groups / files whose min-max ranges exclude the
query predicate. A layout sorted on one column gives tight ranges for THAT
column only — a filter on any other column still scans everything. Z-order
interleaves the bits of several columns' rank-bucket codes so that rows
close in the Morton curve are close in EVERY clustered dimension: each file
then covers a narrow range of all clustered columns at once, and filters on
any of them prune files. This is the clustering strategy behind Delta Lake
`OPTIMIZE ZORDER BY` and Iceberg's z-ordered rewrites.

Scale design (the 100 TB contract):
  - per-column value→bucket mapping comes from `approxQuantile` boundary
    SAMPLING (a driver collect of 2^bits boundary values per column — KB of
    data, one pass, never the rows themselves), so buckets are
    equi-populated even under skew;
  - the bucket lookup is a row-local JVM binary-search-free HOF count over
    the broadcast boundary array; the Morton interleave is pure bit
    arithmetic — no UDFs, no extra shuffle beyond the ONE
    repartitionByRange that any clustering write must pay;
  - `repartitionByRange(morton)` + `sortWithinPartitions(morton)` gives
    globally ordered files, so file-level min-max stats are tight.

The reference (chmp/framequery) has no physical layout surface at all.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(df: DataFrame, c: str) -> Column:
    """Orderable column -> double, including temporal types (ANSI mode
    rejects a direct temporal->double cast): timestamps map to epoch
    micros, dates to epoch days. Monotone mappings, so quantile buckets
    and min-max spans are preserved."""
    dt = df.schema[c].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(c), F.lit("1970-01-01").cast("date")) \
            .cast("double")
    return F.col(c).cast("double")


def _bucket_code(col: Column, boundaries: List[float], bits: int) -> Column:
    """Map a numeric column to its quantile bucket in [0, 2^bits): the count
    of sampled boundaries <= value (row-local HOF over the broadcast literal
    boundary array; boundaries has 2^bits - 1 entries)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = col.cast("double")
    cnt = F.size(F.filter(arr, lambda b: b <= v))
    # NULLs sort to bucket 0 (filter over NULL comparisons yields empty)
    return F.coalesce(cnt, F.lit(0)).cast("long")


def _interleave(codes: List[Column], bits: int) -> Column:
    """Morton-interleave k bucket codes of `bits` bits each into one long:
    output bit (i*k + j) = bit i of code j. Pure JVM shift/mask arithmetic,
    k*bits <= 62 to stay ANSI-safe."""
    k = len(codes)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(codes):
            bit = F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + j))
    return out


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8,
               rel_error: float = 0.001) -> Column:
    """Morton key column for `cols` (numeric/date/timestamp). Bucket
    boundaries are sampled once per column with approxQuantile (driver
    receives only the 2^bits boundary values). k*bits must be <= 62."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} key "
            "bits; must be <= 62 (lower bits= or cluster fewer columns)")
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bounds)]
    numeric_exprs = {c: _as_double(df, c) for c in cols}
    numeric = df.select(*[e.alias(c) for c, e in numeric_exprs.items()])
    all_bounds = numeric.approxQuantile(cols, probs, rel_error)
    codes = [_bucket_code(numeric_exprs[c], bounds, bits)
             for c, bounds in zip(cols, all_bounds)]
    return _interleave(codes, bits)


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 16, bits: int = 8) -> DataFrame:
    """Write `df` as parquet clustered on the Morton curve of `cols`:
    range-partitioned and sorted by the z-key, so every output file covers a
    narrow min-max range of EVERY clustered column and filter queries on any
    of them skip files. Returns the re-read frame."""
    key = zorder_key(df, cols, bits=bits)
    (df.withColumn("__z", key)
       .repartitionByRange(n_files, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))
    return df.sparkSession.read.parquet(path)


def file_span_stats(df_from_files: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-file min/max span of each column, normalized by the global span —
    the data-skipping figure of merit (mean spans near 1/n_files in every
    dimension mean filters on any clustered column prune most files).
    Diagnostic helper for layout tests/tuning."""
    nums = {c: _as_double(df_from_files, c) for c in cols}
    per_file = (df_from_files
                .groupBy(F.input_file_name().alias("file"))
                .agg(*[f for c in cols
                       for f in (F.min(nums[c]).alias(f"min_{c}"),
                                 F.max(nums[c]).alias(f"max_{c}"))]))
    glob = df_from_files.agg(
        *[f for c in cols
          for f in (F.min(nums[c]).alias(f"gmin_{c}"),
                    F.max(nums[c]).alias(f"gmax_{c}"))])
    out = per_file.crossJoin(F.broadcast(glob))
    for c in cols:
        span = (F.col(f"max_{c}") - F.col(f"min_{c}")).cast("double")
        gspan = (F.col(f"gmax_{c}") - F.col(f"gmin_{c}")).cast("double")
        out = out.withColumn(f"span_{c}", F.round(span / gspan, 4))
    return out.select("file", *[f"span_{c}" for c in cols])
