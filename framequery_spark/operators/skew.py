"""Skew-handling operators: the patterns for hot keys at 100 TB.

AQE's skew-join splitting (on in `plans/tuning.py`) handles most join skew
at runtime; these operators cover the cases AQE cannot re-plan:

  - `skew_safe_count_distinct`: COUNT(DISTINCT col) per key normally hashes
    every value of a hot key into ONE reducer. The two-phase form shuffles
    by (key, value) first — the hot key's values spread across the cluster
    for the dedup — then counts tiny per-key partials. Exact, same answer,
    bounded reducers.

  - `salted_join`: explicit salting for engines/paths where AQE is off or
    the skew is known up front. The big (skewed) side gets a DETERMINISTIC
    pseudo-salt from a row hash (never rand() — results must be stable
    across retries/stragglers, and task retry with rand() silently
    duplicates or drops rows); the small side replicates into every salt
    bucket. The join becomes n_salts smaller joins that land on different
    reducers.

Beyond-reference surface (the reference has no physical tuning at all).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_safe_count_distinct(df: DataFrame, keys: Sequence[str],
                             col: str, out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key distinct count as two shuffles of bounded width:
    dedup on (keys, col) — the value spreads the hot key — then a plain
    count per key (map-side partial combine applies)."""
    return (df.select(*keys, col)
            .distinct()
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias(out_col)))


def salted_join(left: DataFrame, right: DataFrame, on: List[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the left (big/skewed) side salted deterministically
    and the right (small) side replicated n_salts times. Result is
    identical to `left.join(right, on, how)`; the shuffle for a hot key is
    spread over n_salts reducers at the cost of replicating the right side
    n_salts-fold — size the salt count to the skew, not the cluster."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
                  F.lit(n_salts)).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, on=list(on) + ["__salt"], how=how).drop("__salt")
