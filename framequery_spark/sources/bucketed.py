"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

At 100 TB the same fact⋈dim or fact⋈fact join often runs per-pipeline-stage;
bucketing both sides by the join key at write time removes the shuffle from
every subsequent join (the scan is already hash-partitioned). This is the
persisted analogue of `repartition()` — pay the shuffle once, at ingest.

Verified in tests/test_plans.py: a join of two tables bucketed on the key
plans as SortMergeJoin with NO Exchange on either side.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, name: str, keys: List[str],
                  buckets: int = 64, sorted_by: bool = True) -> DataFrame:
    """Persist *df* as a bucketed (and bucket-sorted) parquet table in the
    session catalog and return the re-read table.

    buckets: choose ≈ (total data size / 128 MB) rounded to a power of two;
    both sides of a co-located join must use the same keys and bucket count.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # an orphaned managed-table location (e.g. from a previous session)
    # blocks re-creation — clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{path}/{name.lower()}", ignore_errors=True)
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(buckets, *keys))
    if sorted_by:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)
    return spark.table(name)


def bucketed_join(spark: SparkSession, left_name: str, right_name: str,
                  keys: List[str], how: str = "inner") -> DataFrame:
    """Join two previously bucketed catalog tables on their bucket keys —
    planless-shuffle when bucket specs match."""
    return spark.table(left_name).join(spark.table(right_name), keys, how)
