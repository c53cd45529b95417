"""Strict driver-mimic differential check: Spark queries() vs DuckDB
oracle_sql() with TYPE-SENSITIVE comparison (Arrow schema + values), so the
driver's type-sensitive value hash cannot diverge when this passes.

Usage: python tools/strict_compare.py [entry ...]   (default: all with oracle)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(names):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .appName("strict_compare").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    q = entry.queries()
    o = entry.oracle_sql()
    targets = names or [n for n in q if n in o]
    failures = []
    for name in targets:
        if name not in o:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = q[name](spark, SF_DIR)
            s_tab = sdf.toArrow()
            d_tab = con.execute(o[name]).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        probs = []
        s_cols = sorted(s_tab.column_names)
        d_cols = sorted(d_tab.column_names)
        if s_cols != d_cols:
            probs.append(f"cols {s_cols} != {d_cols}")
        elif s_tab.num_rows != d_tab.num_rows:
            probs.append(f"rows {s_tab.num_rows} != {d_tab.num_rows}")
        else:
            for c in s_cols:
                st, dt = s_tab.schema.field(c).type, d_tab.schema.field(c).type
                if str(st) != str(dt):
                    probs.append(f"type[{c}] spark={st} duckdb={dt}")
            if not probs:
                import pandas as pd
                sp = s_tab.to_pandas()[s_cols].sort_values(s_cols).reset_index(drop=True)
                dp = d_tab.to_pandas()[s_cols].sort_values(s_cols).reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(sp, dp, check_exact=True)
                except AssertionError as e:
                    probs.append(f"values: {str(e)[:300]}")
        if probs:
            failures.append(name)
            print(f"{name}: FAIL  " + " | ".join(probs))
        else:
            print(f"{name}: OK ({s_tab.num_rows} rows)")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} strict-green")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
