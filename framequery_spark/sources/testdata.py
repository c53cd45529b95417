"""Loader for the driver's TPC-H-ish parquet testdata.

Handles the events table's nanosecond timestamps across Spark versions:

- Spark <=4.0 rejects parquet INT64 TIMESTAMP(NANOS) unless
  `spark.sql.legacy.parquet.nanosAsLong` is set, in which case the column
  reads back as LongType raw nanos -> convert to microsecond timestamps.
- Spark >=4.1 reads TIMESTAMP(NANOS) natively as TIMESTAMP_NTZ (the legacy
  flag is ignored) -> cast to session-timezone TIMESTAMP (sessions run UTC,
  so the cast is value-preserving and matches what DuckDB returns).

`normalize_ts_column` is the single shared normalizer; batch and streaming
paths both go through it so the two can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize_ts_column(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-timezone TIMESTAMP
    regardless of how the source materialized it (raw nanos long,
    TIMESTAMP_NTZ, or already TIMESTAMP). Idempotent."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Harmless no-op on Spark >=4.1; required for the nanos column on <=4.0.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_ts_column(df, "ts")
    return df


_CACHE: dict = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load (and memoize) the full star schema. DataFrames are lazy plans;
    caching here only avoids re-reading parquet footers per query."""
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = {t: load_table(spark, sf_dir, t) for t in TABLES}
    return dict(_CACHE[key])
