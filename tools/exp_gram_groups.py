"""Interleaved same-session A/B: gram-pair self-join (r12 shape) vs
grouped id-list expansion (r13 shape) for the uncapped overlap table.

Usage: python tools/exp_gram_groups.py [k] [reps]

Prints per-variant noop-sink timings (interleaved A,B,A,B,... within one
JVM so JIT/GC state is shared) and an order-invariant checksum
(count + sum(xxhash64 over the row)) proving the two variants produce the
identical (id1, id2, __common, __n1, __n2) multiset.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("exp_gram_groups").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)

    from framequery_spark.operators.cache import release_cached
    from framequery_spark.operators.dedup import (_expand_sorted_pairs,
                                                  _gram_groups,
                                                  _shingle_table)
    from framequery_spark.sources.testdata import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]

    def sh_table():
        return (_shingle_table(docs, "doc_id", "text", k)
                .select("__id", F.xxhash64("__shingle").alias("__g")))

    def old_overlap():
        from framequery_spark.operators.cache import persist_tracked

        sh = persist_tracked(sh_table())
        counts = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
        a = sh.toDF("id1", "__g")
        b = sh.toDF("id2", "__g")
        common = (a.join(b, "__g")
                  .filter(F.col("id1") < F.col("id2"))
                  .groupBy("id1", "id2")
                  .agg(F.count(F.lit(1)).alias("__common")))
        c1 = counts.toDF("id1", "__n1")
        c2 = counts.toDF("id2", "__n2")
        return common.join(c1, "id1").join(c2, "id2")

    def new_overlap():
        from framequery_spark.operators.cache import persist_tracked

        g = persist_tracked(_gram_groups(sh_table()))
        counts = (g.select(F.explode("__ids").alias("__id"))
                  .groupBy("__id").agg(F.count(F.lit(1)).alias("__n")))
        common = (_expand_sorted_pairs(g)
                  .groupBy("id1", "id2")
                  .agg(F.count(F.lit(1)).alias("__common")))
        c1 = counts.toDF("id1", "__n1")
        c2 = counts.toDF("id2", "__n2")
        return common.join(c1, "id1").join(c2, "id2")

    def checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("id1", "id2", "__common", "__n1", "__n2")
                  .bitwiseAND(F.lit((1 << 40) - 1)))
            .alias("h")).collect()[0]
        return row["n"], row["h"]

    ca = checksum(old_overlap()); release_cached(True)
    cb = checksum(new_overlap()); release_cached(True)
    print(f"checksum old={ca} new={cb} equal={ca == cb}")
    assert ca == cb, "variants diverge!"

    def run(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_cached(True)
        spark.catalog.clearCache()
        return dt

    # one untimed warm pass each
    run(old_overlap); run(new_overlap)
    ta, tb = [], []
    for _ in range(reps):
        ta.append(run(old_overlap))
        tb.append(run(new_overlap))
    print("old(join) :", [round(x, 3) for x in ta], "min", round(min(ta), 3))
    print("new(group):", [round(x, 3) for x in tb], "min", round(min(tb), 3))


if __name__ == "__main__":
    main()
