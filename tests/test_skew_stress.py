"""Measured skew evidence (VERDICT r06 #7): a Zipfian key distribution
(alpha ~ 1.1, the shape of natural-language token frequencies) pushed
through `salted_join` and `bigram_lm_nll`. The 100 TB story claims hot keys
never concentrate on one reducer — here that is MEASURED via per-partition
row loads of the actual join output, not just asserted structurally.

AQE is disabled inside these tests: its runtime skew-splitting would mask
the static plan's behavior, and the claim under test is that the operators
are skew-safe even where AQE cannot re-plan (see operators/skew.py).
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _zipf_tokens(n, n_ranks=2000, alpha=1.1, seed=7):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_ranks + 1)
    p = 1.0 / ranks ** alpha
    p /= p.sum()
    return rng.choice(ranks, size=n, p=p), p


def _max_partition_load(df):
    """Row count of the fullest partition of df's output stage (the
    spark_partition_id is evaluated before the measuring re-shuffle)."""
    loads = (df.select(F.spark_partition_id().alias("pid"))
             .groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect())
    return max(r["n"] for r in loads)


@pytest.fixture()
def no_aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


def test_salted_join_bounds_max_reducer_load_on_zipfian_keys(no_aqe):
    spark = no_aqe
    from framequery_spark.operators.skew import salted_join

    n = 1_000_000
    toks, p = _zipf_tokens(n)
    # the head key carries ~17% of all rows — the classic "the"-token skew
    left = spark.createDataFrame(
        pd.DataFrame({"row_id": np.arange(n), "w": toks}))
    right = left.groupBy("w").agg(F.count(F.lit(1)).alias("c"))

    plain = left.join(right, "w")
    salted = salted_join(left, right, ["w"], salt=16)
    assert salted.count() == n == plain.count()  # identical row multiset

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    even = n / nparts
    plain_max = _max_partition_load(plain)
    salted_max = _max_partition_load(salted)
    # the plain equi join concentrates the hot key on one reducer...
    assert plain_max > 1.4 * even, (plain_max, even)
    # ...salting spreads it to within 35% of a perfectly even shuffle
    assert salted_max <= 1.35 * even, (salted_max, even)
    assert salted_max < plain_max


def test_bigram_lm_zipfian_corpus_salted_path(no_aqe):
    """~1M Zipfian tokens end-to-end through bigram_lm_nll with the
    above-threshold salted fallback forced: results must match the
    broadcast path exactly, and the salted plan must key its scoring
    joins on (key, __salt) — never on a bare Zipfian key."""
    import re

    spark = no_aqe
    from framequery_spark.operators.cache import release_cached
    from framequery_spark.operators.text import bigram_lm_nll
    from framequery_spark.plans.explain import formatted_plan

    n_docs, doc_len = 5000, 200
    toks, _ = _zipf_tokens(n_docs * doc_len)
    words = np.char.add("t", toks.astype(str)).reshape(n_docs, doc_len)
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n_docs),
        "text": [" ".join(row) for row in words],
    }))

    salted = bigram_lm_nll(docs, broadcast_vocab_max=0, salt=16)
    plan = formatted_plan(salted)
    assert "__salt" in plan, plan
    # no shuffle join keyed on the bare Zipfian token key
    assert not re.search(
        r"(SortMergeJoin|ShuffledHashJoin) (keys: )?\[(prev|w)#\d+\]", plan
    ), plan
    got = sorted(tuple(r) for r in salted.collect())
    release_cached()
    want = sorted(tuple(r) for r in bigram_lm_nll(docs).collect())
    release_cached()
    assert got == want
    assert len(got) == n_docs


def test_funnel_bot_user_state_stays_funnel_relevant(spark):
    """The 100 TB funnel claim: a bot-scale user's collected state is its
    FUNNEL-RELEVANT events only (the stream is pre-filtered to the stage
    types before the groupBy-user collect). A 50k-event bot whose traffic
    is 98% non-funnel noise must fold only the ~1k relevant events — and
    the result must still be exact."""
    import pandas as pd

    from framequery_spark.operators.events import funnel_counts

    n = 50_000
    rows = []
    for i in range(n):
        # bot user 0: mostly noise, a funnel chain buried inside
        et = ("noise", "view", "click", "purchase")[
            0 if i % 50 else (i // 50) % 3 + 1]
        rows.append((0, f"2024-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:"
                        f"{i % 60:02d}", et))
    rows += [(1, "2024-01-01 00:00:00", "view"),
             (1, "2024-01-01 00:00:01", "click")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {r.stage: r.n_users for r in
           funnel_counts(df, ["view", "click", "purchase"]).collect()}
    # bot completes all three (chain appears in order), user 1 stops at click
    assert out == {"view": 2, "click": 2, "purchase": 1}
