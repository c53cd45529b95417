"""Loader for the driver's TPC-H-ish parquet testdata.

Handles the events table's nanosecond timestamps: Spark rejects parquet
INT64 TIMESTAMP(NANOS) outright, so we read them as longs
(`spark.sql.legacy.parquet.nanosAsLong`) and convert to microsecond
timestamps (what DuckDB also returns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


_CACHE: dict = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load (and memoize) the full star schema. DataFrames are lazy plans;
    caching here only avoids re-reading parquet footers per query."""
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = {t: load_table(spark, sf_dir, t) for t in TABLES}
    return dict(_CACHE[key])
