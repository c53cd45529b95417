"""Profile q47_quantiles: which of the three ordered-set aggregates
carries the time (exact Percentile maps vs the collect_list+sort disc),
and A/B a grid+frequency reformulation for the percentile_cont pair.
Usage: python tools/exp_q47.py [reps]
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
             .appName("exp_q47").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)
    from framequery_spark.sources.testdata import load_tables

    li = load_tables(spark, SF_DIR)["lineitem"]

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    g = li.groupBy("l_returnflag")
    variants = {
        # current engine shapes, isolated
        "cont_only": g.agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("m"),
            F.percentile("l_quantity", F.lit(0.25)).alias("q1")),
        "disc_only": g.agg(
            F.element_at(
                F.sort_array(F.collect_list("l_extendedprice")),
                F.greatest(F.lit(1),
                           F.ceil(F.lit(0.9) * F.size(
                               F.sort_array(F.collect_list(
                                   "l_extendedprice")))).cast("int")))
            .alias("p90")),
        "all_three": g.agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("m"),
            F.percentile("l_quantity", F.lit(0.25)).alias("q1"),
            F.element_at(
                F.sort_array(F.collect_list("l_extendedprice")),
                F.greatest(F.lit(1),
                           F.ceil(F.lit(0.9) * F.size(
                               F.sort_array(F.collect_list(
                                   "l_extendedprice")))).cast("int")))
            .alias("p90")),
        # grid+frequency percentile: pre-count (flag, qty) then exact
        # Percentile with the frequency argument (same Catalyst expr)
        "cont_grid": (li.groupBy("l_returnflag", "l_quantity")
                      .agg(F.count(F.lit(1)).alias("__f"))
                      .groupBy("l_returnflag")
                      .agg(F.percentile("l_quantity", F.lit(0.5),
                                        F.col("__f")).alias("m"),
                           F.percentile("l_quantity", F.lit(0.25),
                                        F.col("__f")).alias("q1"))),
        # disc via per-group count + row_number order statistic
        "disc_window": None,
    }
    from pyspark.sql import Window

    cnt = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = (li.select("l_returnflag", "l_extendedprice")
              .withColumn("__r", F.row_number().over(w)))
    variants["disc_window"] = (
        ranked.join(F.broadcast(cnt), "l_returnflag")
        .where(F.col("__r") == F.greatest(
            F.lit(1), F.ceil(F.lit(0.9) * F.col("__n")).cast("int")))
        .select("l_returnflag", F.col("l_extendedprice").alias("p90")))

    # value check: grid vs plain cont; window vs collect disc
    a = {r["l_returnflag"]: (r["m"], r["q1"])
         for r in variants["cont_only"].collect()}
    b = {r["l_returnflag"]: (r["m"], r["q1"])
         for r in variants["cont_grid"].collect()}
    print("cont grid equal:", a == b, a, b)
    da = {r["l_returnflag"]: r["p90"] for r in variants["disc_only"].collect()}
    db = {r["l_returnflag"]: r["p90"]
          for r in variants["disc_window"].collect()}
    print("disc window equal:", da == db)

    for name, df in variants.items():
        t(df)  # warm
    for _ in range(reps):
        line = []
        for name, df in variants.items():
            line.append(f"{name}={t(df)}")
        print("  ".join(line))


if __name__ == "__main__":
    main()
