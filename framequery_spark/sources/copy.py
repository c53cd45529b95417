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
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(full)
        return
    if fmt == "json":
        df.write.mode("overwrite").json(full)
        return
    if str(options.get("single_file", "true")).lower() in ("true", "1", "yes"):
        # single-file parity with the reference (pandas .to_csv); only for
        # small results — the distributed path writes a directory
        df.toPandas().to_csv(full, sep=options.get("delimiter", ","), index=False)
    else:
        (df.write.mode("overwrite")
         .option("header", "true")
         .option("sep", options.get("delimiter", ","))
         .csv(full))
