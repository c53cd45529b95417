"""Interleaved same-session A/B: band-bucket self-join (r12 shape) vs
per-bucket grouped id-list expansion (r13 candidate shape) for MinHash
LSH and SimHash candidates, with checksum equality.
Usage: python tools/exp_band_groups.py [reps]
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
             .appName("exp_band_groups").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)
    from framequery_spark.operators.cache import (persist_tracked,
                                                  release_cached)
    from framequery_spark.operators.dedup import (_band_buckets,
                                                  _expand_sorted_pairs,
                                                  _lsh_sigs,
                                                  _minhash_params)
    from framequery_spark.sources.testdata import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    num_perm, bands, k = 128, 64, 3
    rows = num_perm // bands
    params = _minhash_params(num_perm, 42)

    def cands_old():
        sigs = persist_tracked(_lsh_sigs(docs, "doc_id", "text", k, params))
        buckets = _band_buckets(sigs, bands, rows)
        a = buckets.toDF("id1", "__band", "__bucket")
        b = buckets.toDF("id2", "__band", "__bucket")
        return (a.join(b, ["__band", "__bucket"])
                .filter(F.col("id1") < F.col("id2"))
                .select("id1", "id2").distinct())

    def cands_new():
        sigs = persist_tracked(_lsh_sigs(docs, "doc_id", "text", k, params))
        groups = (_band_buckets(sigs, bands, rows)
                  .groupBy("__band", "__bucket")
                  .agg(F.sort_array(F.collect_list("__id")).alias("__ids"))
                  .select("__ids"))
        return _expand_sorted_pairs(groups).distinct()

    def checksum(df):
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.xxhash64("id1", "id2")
                         .bitwiseAND(F.lit((1 << 40) - 1))).alias("h")
                   ).collect()[0]
        release_cached(True)
        spark.catalog.clearCache()
        return r["n"], r["h"]

    ca, cb = checksum(cands_old()), checksum(cands_new())
    print("minhash cands checksum equal:", ca == cb, ca, cb)
    assert ca == cb

    def run(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_cached(True)
        spark.catalog.clearCache()
        return round(dt, 3)

    run(cands_old); run(cands_new)
    ta, tb = [], []
    for _ in range(reps):
        ta.append(run(cands_old))
        tb.append(run(cands_new))
    print("minhash old(join):", ta, "min", min(ta))
    print("minhash new(group):", tb, "min", min(tb))

    # simhash shapes: compare the committed function against an inline
    # restatement of the old join form
    from framequery_spark.operators.dedup import (md5_hash60, shingles,
                                                  simhash_near_pairs,
                                                  _spread)

    def simhash_old(max_hamming=8, sig_bits=60):
        n_bands = max_hamming + 1
        width = sig_bits // n_bands
        mask = (1 << width) - 1
        ex = (_spread(docs)
              .select(F.col("doc_id").alias("__id"),
                      F.explode(shingles(F.col("text"), 3)).alias("__s"))
              .select("__id", md5_hash60(F.col("__s")).alias("__h64")))
        votes = ex.groupBy("__id").agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.shiftrightunsigned("__h64", bit).bitwiseAND(F.lit(1)))
              .alias(f"__o{bit}") for bit in range(sig_bits)])
        sim = None
        for bit in range(sig_bits):
            bv = (1 << bit) if bit < 63 else -(1 << 63)
            e = F.when(F.col(f"__o{bit}") * 2 >= F.col("__n"),
                       F.lit(bv).cast("long")).otherwise(F.lit(0).cast("long"))
            sim = e if sim is None else sim.bitwiseOR(e)
        sig_df = persist_tracked(votes.select("__id", sim.alias("__sim")))
        bandc = F.array(*[F.shiftrightunsigned(F.col("__sim"), i * width)
                          .bitwiseAND(F.lit(mask)) for i in range(n_bands)])
        buckets = sig_df.select("__id", "__sim",
                                F.posexplode(bandc).alias("__band",
                                                          "__bucket"))
        a = buckets.toDF("id1", "sim1", "__band", "__bucket")
        b = buckets.toDF("id2", "sim2", "__band", "__bucket")
        ham = F.bit_count(F.col("sim1").bitwiseXOR(F.col("sim2")))
        return (a.join(b, ["__band", "__bucket"])
                .filter(F.col("id1") < F.col("id2"))
                .withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id1", "id2", "hamming").distinct())

    def simhash_new():
        return simhash_near_pairs(docs, max_hamming=8, sig_bits=60,
                                  hash_fn=md5_hash60)

    def checksum3(df):
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.xxhash64("id1", "id2", "hamming")
                         .bitwiseAND(F.lit((1 << 40) - 1))).alias("h")
                   ).collect()[0]
        release_cached(True)
        spark.catalog.clearCache()
        return r["n"], r["h"]

    ca, cb = checksum3(simhash_old()), checksum3(simhash_new())
    print("simhash pairs checksum equal:", ca == cb, ca, cb)
    assert ca == cb
    run(simhash_old); run(simhash_new)
    ta, tb = [], []
    for _ in range(reps):
        ta.append(run(simhash_old))
        tb.append(run(simhash_new))
    print("simhash old(join+60col):", ta, "min", min(ta))
    print("simhash new(group+lane):", tb, "min", min(tb))


if __name__ == "__main__":
    main()
