"""Skew-aware join helpers.

AQE's skew-join handles most runtime skew (enabled in plans/tuning.py), but
two patterns still need explicit handling at corpus scale:

  - joining a huge fact table against a medium dim on a key whose
    distribution is pathological (a handful of keys own most rows) —
    `salted_join` spreads each hot key over `salt` buckets by replicating
    the build side;
  - aggregating by a skewed key — `two_phase_agg` pre-aggregates on
    (key, salt) then re-aggregates on key, cutting the single hot-partition
    reduce into `salt` parallel partials.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, keys: List[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with salting: the fact side gets a random salt in [0,salt),
    the dim side is replicated once per salt value, and the join key becomes
    (keys..., salt). Result equals fact.join(dim, keys, how) for inner/left.

    Use when the fact side is skewed on `keys` and the dim side is too big
    to broadcast but cheap to replicate `salt` times."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, keys + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(df: DataFrame, keys: List[str], aggs: Dict[str, str],
                  salt: int = 16) -> DataFrame:
    """Aggregate by skewed keys in two phases: (key, salt) partials, then a
    final combine on key. Supports count/sum/min/max (algebraic aggregates).

    aggs: {column: 'count'|'sum'|'min'|'max'} -> output column `fn_col`."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial_exprs: List[Column] = []
    final_exprs: List[Column] = []
    for col, fn in aggs.items():
        pname = f"__p_{fn}_{col}"
        out = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(pname))
            final_exprs.append(F.sum(pname).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(pname))
            final_exprs.append(F.min(pname).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(pname))
            final_exprs.append(F.max(pname).alias(out))
        else:
            raise ValueError(f"two_phase_agg: non-algebraic aggregate {fn}")
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
