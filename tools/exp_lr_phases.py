"""Decompose op_lr_quality into its serial driver-sync actions:
(a) tf build+persist materialization, (b) gradient collect,
(c) scoring aggregate alone (noop sink), (d) scoring + ORDER BY collect
(the declared entry's tail). Establishes which action carries the time
and whether the orderBy's range-sampling pass re-executes the scoring
plan. Usage: python tools/exp_lr_phases.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("exp_lr_phases").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)
    from framequery_spark.operators.cache import (persist_tracked,
                                                  release_cached)
    from framequery_spark.operators.classifier import (doc_tf, lr_score,
                                                       lr_train)
    from framequery_spark.sources.testdata import load_tables

    docs = load_tables(spark, SF_DIR)["documents"] \
        .withColumn("y", (F.col("lang") == "en").cast("int"))

    def t(fn):
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    for r in range(reps):
        res = {}
        tf = persist_tracked(doc_tf(docs, n_buckets=512))
        res["a_tf_materialize"] = t(lambda: tf.count())
        w = None

        def grad():
            nonlocal w
            w = lr_train(docs, "y", n_buckets=512, iters=1, lr=0.5, tf_df=tf)
        res["b_gradient"] = t(grad)
        out = lr_score(docs, w, n_buckets=512, tf_df=tf)
        scored = out.select(
            "doc_id", F.round(F.col("margin") + 0.0000001, 6).alias("m"))
        res["c_score_noop"] = t(lambda: scored.write.format("noop")
                                .mode("overwrite").save())
        res["d_score_orderby_collect"] = t(
            lambda: scored.orderBy("doc_id").collect())
        release_cached(True)
        spark.catalog.clearCache()
        print(r, res)


if __name__ == "__main__":
    main()
