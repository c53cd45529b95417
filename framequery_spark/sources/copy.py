"""COPY FROM/TO and CSV helpers.

Reference semantics: COPY <t> FROM '<file>' WITH (delimiter ';', format
'csv') loads a CSV into the scope; COPY TO writes one
(src/framequery/executor/_executor.py:417-436, src/framequery/util/_funcs.py:117-131,
src/framequery/executor/_pandas.py:205-220). We extend format support to
parquet and json — they're free on Spark and the natural 100 TB path.
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame


def _resolve(basepath: str, path: str) -> str:
    if os.path.isabs(path) or "://" in path:
        return path
    return os.path.join(basepath or ".", path)


def read_csv(session, path: str, options: Dict[str, str]) -> DataFrame:
    fmt = str(options.get("format", "csv")).lower()
    full = _resolve(session.basepath, path)
    if fmt == "parquet":
        return session.spark.read.parquet(full)
    if fmt == "json":
        return session.spark.read.json(full)
    reader = (session.spark.read
              .option("header", str(options.get("header", "true")).lower())
              .option("sep", options.get("delimiter", ","))
              .option("inferSchema", "true"))
    return reader.csv(full)


def write_csv(session, df: DataFrame, path: str, options: Dict[str, str]) -> None:
    fmt = str(options.get("format", "csv")).lower()
    full = _resolve(session.basepath, path)
    # partition_by 'a, b': hive-style partitioned layout — the 100 TB sink
    # shape (partition pruning on read, per-partition parallel write).
    # Applies to the directory formats (parquet/json/multi-file csv).
    part_cols = [c.strip() for c in
                 str(options.get("partition_by", "")).split(",") if c.strip()]
    if fmt == "parquet":
        w = df.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(full)
        return
    if fmt == "json":
        w = df.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.json(full)
        return
    if part_cols:
        (df.write.mode("overwrite").partitionBy(*part_cols)
         .option("header", "true")
         .option("sep", options.get("delimiter", ","))
         .csv(full))
        return
    sep = options.get("delimiter", ",")
    if str(options.get("single_file", "true")).lower() in ("true", "1", "yes"):
        _write_single_csv(df, full, sep)
    else:
        (df.write.mode("overwrite")
         .option("header", "true")
         .option("sep", sep)
         .csv(full))


def _write_single_csv(df: DataFrame, full: str, sep: str) -> None:
    """Single-file COPY TO (reference parity: one CSV file, not a
    directory) without materializing the result on the driver: executors
    format the CSV in parallel via the distributed writer, then the driver
    streams the part files into the target with constant memory
    (shutil.copyfileobj). Replaces the old `df.toPandas().to_csv(...)`
    path, which held the whole result in driver memory. Part files sort in
    partition order and rows keep their within-partition order, so output
    order matches the frame's order, same as before."""
    import glob
    import shutil

    tmp = full + ".__spark_tmp__"
    (df.write.mode("overwrite")
     .option("header", "false")
     .option("sep", sep)
     .option("emptyValue", "")
     .csv(tmp))
    parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
    with open(full, "w", encoding="utf-8", newline="") as out:
        out.write(sep.join(df.columns) + "\n")
        for p in parts:
            with open(p, "r", encoding="utf-8", newline="") as fh:
                shutil.copyfileobj(fh, out)
    shutil.rmtree(tmp)
