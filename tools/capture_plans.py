"""Capture `.explain("formatted")` output for declared entries into files.

Usage:
    python tools/capture_plans.py <suffix> [entry ...]

Writes plans/r12/<entry>_<suffix>.txt for each named entry (default: a
built-in list of the bench's most expensive entries). The suffix is
"before" / "after" per the optimization-round deliverable contract.

Streaming entries are skipped (a streaming DataFrame's plan is only
meaningful per micro-batch); their batch twins share the physical shape.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_ENTRIES = [
    "op_dedup_quality", "op_near_dup_sweep", "op_split_leakage",
    "op_lr_quality", "op_decontaminate", "op_minhash_clusters",
    "op_trgm_dedup", "q47_quantiles", "op_dedup_against", "op_containment",
    "op_kmeans", "op_profile", "op_simhash_exact", "op_auc",
    "op_jaccard_pairs", "q68_multirange_coverage", "op_dsir_length_norm",
    "q73_fuzzy_costed", "q65_recursive_cycle", "op_dedup_keep_best",
    "op_winnow_pairs", "op_dsir_select", "q01_pricing_summary",
    "op_textrank", "op_bigram_nll",
]


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_ENTRIES

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("capture_plans").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from framequery_spark.plans.tuning import configure_session

    configure_session(spark, cpus)

    qs = entry.queries()
    streaming = getattr(entry, "STREAMING_ENTRIES", frozenset())
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN entry", file=sys.stderr)
            continue
        if name in streaming:
            print(f"{name}: streaming — skipped", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            print(f"{name}: FAILED: {exc}", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: wrote {path} ({len(txt.splitlines())} lines)")
        from framequery_spark.operators.cache import release_cached

        release_cached(blocking=False)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
