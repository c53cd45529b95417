"""Dataset profiling: per-column statistics in one scan.

The "look before you train" step of a data pipeline — null rates, ranges
and moments for every numeric column, computed in a single aggregate pass
so profiling 100 TB costs exactly one scan with map-side partial
aggregation and a one-row result.

Engine-exact determinism: sums and sums-of-squares are quantized to
DECIMAL(38,12) BEFORE aggregation (the bigram-NLL discipline), so the
totals are order-independent and mean/stddev derive from exact inputs —
a plain float sum would drift with partition layout and could never
hash-match a single-threaded oracle.

Beyond-reference surface (the reference has no profiling operators).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column: (column, n, n_null, min, max, mean,
    stddev) — n counts non-null values, mean/stddev round to 1e-6,
    stddev is the sample standard deviation (NULL for n < 2), all
    derived from decimal-exact sums.

    Plan shape: ONE aggregate over the input (6 partial aggregates per
    column, all map-side combining) followed by a row-local stack() of
    the single result row — no joins, no windows, no second scan.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("profile_numeric: need at least one column")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"__{c}_n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"__{c}_nn"),
            F.min(x).alias(f"__{c}_min"),
            F.max(x).alias(f"__{c}_max"),
            F.sum(x.cast("decimal(38,12)")).alias(f"__{c}_s"),
            F.sum((x * x).cast("decimal(38,12)")).alias(f"__{c}_ss"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        n = F.col(f"__{c}_n")
        s = F.col(f"__{c}_s").cast("double")
        ss = F.col(f"__{c}_ss").cast("double")
        mean = F.round(s / n, 6)
        var = (n * ss - s * s) / (n * (n - 1))
        std = F.when(n >= 2, F.round(F.sqrt(var), 6))
        parts.append(F.struct(
            F.lit(c).alias("column"), n.alias("n"),
            F.col(f"__{c}_nn").alias("n_null"),
            F.col(f"__{c}_min").alias("min"),
            F.col(f"__{c}_max").alias("max"),
            mean.alias("mean"), std.alias("stddev")))
    return (row.select(F.explode(F.array(*parts)).alias("p"))
            .select("p.*"))


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Corpus snapshot diff: per-document status between two versions of
    a table — 'added' (id only in new), 'removed' (id only in old),
    'changed' (same id, different content fingerprint), 'unchanged'.
    The ingest-ops primitive behind incremental reprocessing: only
    added+changed rows need re-scoring/re-embedding.

    Content equality is the whitespace-normalized lowercase md5
    (text.content_fingerprint) — byte-exact across engines. Returns
    (id, status). Scale shape: one full outer equi join on the id; the
    fingerprint is a row-local projection pushed to both scans.
    """
    from .text import content_fingerprint

    o = old.select(F.col(id_col).alias("__id"),
                   content_fingerprint(F.col(text_col)).alias("__ofp"))
    n = new.select(F.col(id_col).alias("__id"),
                   content_fingerprint(F.col(text_col)).alias("__nfp"))
    j = o.join(n, "__id", "full_outer")
    status = (F.when(F.col("__ofp").isNull(), F.lit("added"))
              .when(F.col("__nfp").isNull(), F.lit("removed"))
              .when(F.col("__ofp") != F.col("__nfp"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(F.col("__id").alias(id_col), status.alias("status"))
