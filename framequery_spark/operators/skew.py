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
    count per key (map-side partial combine applies). The final count is
    over `col`, not *, so the NULL row the distinct keeps is excluded —
    matching SQL COUNT(DISTINCT col) semantics exactly."""
    return (df.select(*keys, col)
            .distinct()
            .groupBy(*keys)
            .agg(F.count(F.col(col)).alias(out_col)))


def salted_join(left: DataFrame, right: DataFrame, on: List[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the left (big/skewed) side salted deterministically
    and the right (small) side replicated `salt` times. Result is
    identical to `left.join(right, on, how)`; the shuffle for a hot key is
    spread over `salt` reducers at the cost of replicating the right side
    salt-fold — size the salt count to the skew, not the cluster."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt_col = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
                      F.lit(salt)).cast("int")
    l = left.withColumn("__salt", salt_col)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return l.join(r, on=list(on) + ["__salt"], how=how).drop("__salt")


# partial-phase and merge-phase functions per supported aggregate: the
# partial runs per (keys, salt) group, the merge re-aggregates per keys.
_TWO_PHASE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def two_phase_agg(df: DataFrame, keys: Sequence[str], aggs: dict,
                  salt: int = 16) -> DataFrame:
    """Salted two-phase aggregation for hot group keys: rows first
    aggregate per (keys, salt-bucket) — a hot key's rows spread over
    `salt` reducers — then the small per-bucket partials merge per key.
    `aggs` maps column -> one of sum/count/min/max (the decomposable
    aggregates; avg = sum/count composed by the caller). Output columns
    are named `{agg}_{col}`. Exact: each supported aggregate is
    associative, so bucket partials merge losslessly."""
    for col, fn in aggs.items():
        if fn not in _TWO_PHASE:
            raise ValueError(
                f"two_phase_agg supports {sorted(_TWO_PHASE)}; got {fn!r} "
                f"for {col!r} (compose avg from sum and count)")
    salt_col = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
                      F.lit(salt)).cast("int")
    partials = [
        _TWO_PHASE[fn][0](F.col(col)).alias(f"__p_{fn}_{col}")
        for col, fn in aggs.items()]
    merged = [
        _TWO_PHASE[fn][1](F.col(f"__p_{fn}_{col}")).alias(f"{fn}_{col}")
        for col, fn in aggs.items()]
    return (df.withColumn("__salt", salt_col)
            .groupBy(*list(keys), "__salt").agg(*partials)
            .groupBy(*list(keys)).agg(*merged))
