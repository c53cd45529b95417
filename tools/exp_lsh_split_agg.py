#!/usr/bin/env python
"""A/B: _lsh_sigs single ObjectHashAggregate (collect_set + N mins in one
pass) vs split shape (codegen'd HashAggregate for the mins joined with a
collect_set-only ObjectHashAggregate). Times op_dedup_against end-to-end
(noop-style: count + order-invariant checksum of the final frame) under
both shapes and proves output identity. Never used by the driver.

Usage: python tools/exp_lsh_split_agg.py [--reps N]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("exp_lsh_split_agg")
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

    from framequery_spark.operators import dedup
    from framequery_spark.operators.cache import release_cached

    orig_lsh_sigs = dedup._lsh_sigs

    def split_lsh_sigs(df, id_col, text_col, k, params, tag_col=None):
        ex = dedup._shingle_hashes_flat(
            df, id_col, text_col, k, tag_col).withColumn(
            "__h31", F.col("__h64").bitwiseAND(F.lit(dedup._MERSENNE)))
        h31 = F.col("__h31")
        keys = ["__id"] + ([tag_col] if tag_col else [])
        mins = ex.groupBy(*keys).agg(*[
            F.min((h31 * F.lit(a) + F.lit(b)) % F.lit(dedup._MERSENNE))
            .alias(f"__m{i}") for i, (a, b) in enumerate(params)])
        hs = ex.groupBy(*keys).agg(F.collect_set("__h64").alias("__hs"))
        return mins.join(hs, keys)

    import __spark_entry__ as entry

    qs = entry.queries()
    build = qs["op_dedup_against"]

    def run_once():
        t0 = time.perf_counter()
        df = build(spark, sf_dir)
        out = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
            .alias("chk")).collect()[0]
        dt = time.perf_counter() - t0
        release_cached(spark)
        return dt, (out["n"], out["chk"])

    results = {}
    for label, fn in (("single", orig_lsh_sigs), ("split", split_lsh_sigs),
                      ("single2", orig_lsh_sigs), ("split2", split_lsh_sigs)):
        dedup._lsh_sigs = fn
        times, chks = [], set()
        for _ in range(reps):
            dt, chk = run_once()
            times.append(round(dt, 3))
            chks.add(chk)
        results[label] = (times, chks)
        print(f"{label}: reps={times} median={statistics.median(times):.3f} "
              f"chk={chks}", flush=True)

    dedup._lsh_sigs = orig_lsh_sigs
    all_chks = set().union(*(c for _, c in results.values()))
    print(f"IDENTICAL={len(all_chks) == 1} chks={all_chks}")
    spark.stop()


if __name__ == "__main__":
    main()
