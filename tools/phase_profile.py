#!/usr/bin/env python
"""Per-entry phase decomposition: DataFrame CONSTRUCTION (Python/py4j +
any driver-side materialization the operator does while building) vs
EXECUTION (collect of the returned frame). Mirrors bench.py's session
config and release discipline; never used by the driver.

Usage: python tools/phase_profile.py entry1 entry2 ... [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("phase_profile")
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

    import __spark_entry__ as entry
    from framequery_spark.operators.cache import release_cached

    qs = entry.queries()
    targets = args or []
    missing = [t for t in targets if t not in qs]
    if missing:
        print(f"unknown entries: {missing}", file=sys.stderr)
        sys.exit(1)

    # warmup: every target once at the smallest scale + once at sf
    warm = "/root/testdata/sf0.001"
    for name in targets:
        try:
            qs[name](spark, warm if os.path.isdir(warm) else sf_dir).collect()
        except Exception as exc:
            print(f"warmup {name} failed: {exc}", file=sys.stderr)
        release_cached(blocking=True)
        spark.catalog.clearCache()
    for name in targets:
        try:
            qs[name](spark, sf_dir).collect()
        except Exception:
            pass
        release_cached(blocking=True)
        spark.catalog.clearCache()

    out = {}
    for name in targets:
        build, execu = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            build.append(round(t1 - t0, 3))
            execu.append(round(t2 - t1, 3))
            release_cached(blocking=True)
            spark.catalog.clearCache()
        bm = sorted(build)[(len(build) - 1) // 2]
        em = sorted(execu)[(len(execu) - 1) // 2]
        out[name] = {"build_med": bm, "exec_med": em,
                     "build": build, "exec": execu}
        print(f"{name}: build {bm:.3f}s exec {em:.3f}s  "
              f"build={build} exec={execu}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
