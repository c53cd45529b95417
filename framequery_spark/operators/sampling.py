"""Deterministic sampling and dataset-split operators.

The reproducible-split primitive for a 100 TB training pipeline: bucket every
row by a cryptographic hash of a stable key, then compare the hash against
fraction thresholds. Properties that matter at scale:

- **Narrow transformation** — no shuffle, no sort, no driver state; the
  split/sample predicate evaluates row-local inside whole-stage codegen and
  survives any repartitioning of the input.
- **Reproducible across runs AND engines** — md5 is specified byte-exact, so
  the same key always lands in the same split on Spark, DuckDB, or anything
  else (unlike `rand(seed)`, which depends on partition layout).
- **Leakage-proof grouping** — hashing a *key* (not the row) sends every row
  sharing that key to the same side (all lineitems of one order, all chunks
  of one document).

The hash-threshold comparison is done on the lowercase-hex *string* prefix
(`substr(md5(key || salt), 1, 8) < '<hex threshold>'`) so the exact same
predicate is expressible in ANSI SQL for the DuckDB oracle — no integer
conversion needed; lexicographic order on fixed-width lowercase hex equals
numeric order.

Beyond-reference surface (the reference has no sampling operators at all;
closest is plain SELECT — docs/SQL_Support.md).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_hex(key: Column, salt: str = "") -> Column:
    """First 8 lowercase-hex chars of md5(key || salt) — a uniform draw from
    [0, 2^32) encoded so string order == numeric order."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def fraction_threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P[hash_bucket_hex < t] == fraction (up to
    1/2^32 quantization)."""
    v = max(0, min(int(round(fraction * 2**32)), 2**32 - 1))
    return format(v, "08x")


def hash_split(df: DataFrame, key_col: str,
               weights: Dict[str, float] | None = None,
               salt: str = "split", out_col: str = "split") -> DataFrame:
    """Add a deterministic split-label column ('train'/'val'/'test' by
    default, weights 0.8/0.1/0.1). Weights are normalized; the last label
    takes the remainder so fractions always sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("hash_split needs at least two labels")
    total = float(sum(weights.values()))
    h = hash_bucket_hex(F.col(key_col), salt)
    names = list(weights)
    acc = 0.0
    col = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(fraction_threshold_hex(acc))
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return df.withColumn(out_col, col.otherwise(names[-1]))


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "sample") -> DataFrame:
    """Keep ~`fraction` of distinct keys (every row of a kept key is kept).
    Pure filter — Catalyst pushes it into the scan where possible."""
    thr = fraction_threshold_hex(fraction)
    return df.filter(hash_bucket_hex(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Dict[str, float],
                      seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (Spark `sampleBy`): rebalance skewed
    strata (languages, sources) without a shuffle. Seeded but — unlike the
    hash operators above — dependent on partition layout, so use
    `hash_split`/`deterministic_sample` when byte-exact reproducibility
    across engines matters."""
    return df.sampleBy(strata_col, fractions, seed)
