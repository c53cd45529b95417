"""RocksDB state-store provider for the stateful streaming operators.

At 100 TB the default HDFS-backed in-memory state store is the scale limit
for stateful streaming (all keys live on the executor heap between
snapshots); Spark's bundled RocksDB provider spills state to local disk
with incremental checkpointing. These tests prove the repo's stateful
operators (applyInPandasWithState, streaming dedup) run unmodified — and
produce IDENTICAL results — under the RocksDB provider, so flipping the
conf is the only change a cluster deployment needs.

The provider is session-conf-scoped per query start, so the tests set it
inside a save/restore guard.
"""
import contextlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")


@contextlib.contextmanager
def _provider(spark, cls):
    old = spark.conf.get(_KEY, None)
    spark.conf.set(_KEY, cls)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_KEY)
        else:
            spark.conf.set(_KEY, old)


def test_stateful_counts_identical_under_rocksdb(spark):
    from framequery_spark.streaming.stream import stateful_user_stats

    default = sorted(map(tuple, stateful_user_stats(
        spark, f"{SF_DIR}/events.parquet").collect()))
    with _provider(spark, _ROCKSDB):
        rocks = sorted(map(tuple, stateful_user_stats(
            spark, f"{SF_DIR}/events.parquet").collect()))
    assert rocks == default and rocks


def test_stream_dedup_identical_under_rocksdb(spark):
    from framequery_spark.streaming.stream import stream_dedup_counts

    default = sorted(map(tuple, stream_dedup_counts(
        spark, f"{SF_DIR}/events.parquet").collect()))
    with _provider(spark, _ROCKSDB):
        rocks = sorted(map(tuple, stream_dedup_counts(
            spark, f"{SF_DIR}/events.parquet").collect()))
    assert rocks == default and rocks
