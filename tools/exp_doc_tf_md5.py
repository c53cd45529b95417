#!/usr/bin/env python
"""Decompose doc_tf (op_lr_quality's feature pass): how much of the time
is the md5 bucket hash vs the explode/shuffle shape? Variants:

  a) current        md5-bucket per gram occurrence
  b) xxhash-bucket  same shape, xxhash64 % n instead of md5 (NOT oracle
                    equivalent — timing decomposition only)
  c) dict-join      md5 per DISTINCT gram via broadcast dictionary join
                    (oracle-equivalent output)

Never used by the driver. Usage: python tools/exp_doc_tf_md5.py [--reps N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("exp_doc_tf_md5")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "64g"))
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    from framequery_spark.operators.dedup import _spread
    from framequery_spark.operators.dsir import (_grams_with_repeats,
                                                 bucket_of)

    n_buckets = 512

    def exploded():
        grams_arr = F.concat(*[_grams_with_repeats(F.col("text"), n)
                               for n in (1, 2)])
        return (_spread(docs)
                .select(F.col("doc_id"), grams_arr.alias("__ga"))
                .select(F.col("doc_id"), F.size("__ga").alias("__tot"),
                        F.explode("__ga").alias("__gram")))

    def tf_from(bucketed):
        return (bucketed.groupBy("doc_id", "__tot", "bucket")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .select("doc_id", "bucket",
                        (F.col("cnt") / F.col("__tot")).alias("tf")))

    def v_current():
        ex = exploded()
        return tf_from(ex.select(
            "doc_id", "__tot",
            bucket_of(F.col("__gram"), n_buckets).alias("bucket")))

    def v_xxhash():
        ex = exploded()
        return tf_from(ex.select(
            "doc_id", "__tot",
            F.pmod(F.xxhash64("__gram"), F.lit(n_buckets)).alias("bucket")))

    def v_dict():
        ex = exploded()
        vocab = (ex.select("__gram").distinct()
                 .select("__gram",
                         bucket_of(F.col("__gram"), n_buckets).alias("bucket")))
        return tf_from(ex.join(F.broadcast(vocab), "__gram"))

    def time_variant(fn):
        t0 = time.perf_counter()
        df = fn()
        out = df.agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.xxhash64("doc_id", "bucket",
                                      F.round("tf", 10))
                           .cast("decimal(38,0)")).alias("chk")
                     ).collect()[0]
        return time.perf_counter() - t0, (out["n"], out["chk"])

    for label, fn in (("current", v_current), ("xxhash", v_xxhash),
                      ("dict", v_dict), ("current2", v_current),
                      ("dict2", v_dict)):
        times, chks = [], set()
        for _ in range(reps):
            dt, chk = time_variant(fn)
            times.append(round(dt, 3))
            chks.add(chk)
        print(f"{label}: reps={times} median={statistics.median(times):.3f} "
              f"chk={chks}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
