"""Worst-case stress evidence for connected_components.

The O(log n) round bound is the operator's whole value at 100 TB scale: a
naive min-label propagation needs O(diameter) rounds, and the worst case
for diameter is a single long chain. This test builds exactly that — a
chain of 2^16 nodes (diameter 65535) plus a few hub (star) components —
and asserts both

  * correctness against the analytically-known ground truth (every chain
    node labels to node 0; every hub member to its hub min), and
  * the round count stays within ~2*log2(n) (label propagation would need
    ~65k rounds here; large-star/small-star must need ~tens).

A small random graph is additionally checked against a DuckDB recursive-CTE
min-label-propagation oracle — feasible there because the random graph's
diameter is small, while the chain would need 65k CTE iterations.
"""
import duckdb
import pytest
from pyspark.sql import functions as F


CHAIN_N = 1 << 16  # 65 536 nodes, diameter 65 535


@pytest.mark.slow
def test_chain_worst_case_round_bound_and_labels(spark):
    from framequery_spark.operators.graph import connected_components

    # chain 0-1-2-...-(N-1), plus 3 hub components of 1000 spokes each
    chain = spark.range(CHAIN_N - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    hubs = spark.range(3000).select(
        (F.lit(CHAIN_N) + (F.col("id") % 3)).alias("src"),
        (F.lit(CHAIN_N) + 3 + F.col("id")).alias("dst"))
    edges = chain.unionByName(hubs)

    out, rounds = connected_components(edges, max_iterations=64,
                                       return_stats=True,
                                       driver_finish_threshold=0)
    import math
    bound = 2 * int(math.ceil(math.log2(CHAIN_N + 3003))) + 4
    assert rounds <= bound, (
        f"{rounds} rounds for a {CHAIN_N}-node chain — the O(log n) "
        f"contract (≤{bound}) is broken; label-propagation-like behavior")

    # ground truth: chain -> component 0; hub h -> component CHAIN_N+h%3...
    # every spoke CHAIN_N+3+i belongs to hub CHAIN_N + (i % 3)
    bad_chain = (out.where(F.col("node") < CHAIN_N)
                 .where(F.col("component") != 0).count())
    assert bad_chain == 0
    # hub centers CHAIN_N..CHAIN_N+2 are each their component's min; spoke
    # CHAIN_N+3+i hangs off center CHAIN_N + (i % 3)
    expected = (F.when(F.col("node") < CHAIN_N + 3, F.col("node"))
                .otherwise((F.col("node") - CHAIN_N - 3) % 3 + CHAIN_N))
    bad_hub = (out.where(F.col("node") >= CHAIN_N)
               .where(F.col("component") != expected).count())
    assert bad_hub == 0
    assert out.count() == CHAIN_N + 3003


def test_random_graph_matches_duckdb_recursive_cte(spark):
    from framequery_spark.operators.graph import connected_components

    # deterministic pseudo-random sparse graph over 2000 nodes: diameter is
    # small, so a per-round min-propagation recursive CTE terminates fast
    n = 2000
    edges = spark.range(3000).select(
        (F.xxhash64(F.col("id")) % n).alias("src"),
        (F.xxhash64(F.col("id") + 7777) % n).alias("dst")) \
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
    pdf = edges.toPandas()

    out = connected_components(edges, max_iterations=40,
                               driver_finish_threshold=0)
    got = {(r.node, r.component) for r in out.collect()}

    con = duckdb.connect()
    con.register("edges", pdf)
    expect = {tuple(r) for r in con.execute("""
        WITH RECURSIVE
        sym AS (SELECT src AS u, dst AS v FROM edges
                UNION SELECT dst, src FROM edges),
        lab AS (
            SELECT u AS node, LEAST(u, MIN(v)) AS comp FROM sym GROUP BY u
            UNION
            SELECT s.u, LEAST(l.comp, s.u)
            FROM sym s JOIN lab l ON s.v = l.node
        )
        SELECT node, MIN(comp) FROM lab GROUP BY node
    """).fetchall()}
    assert got == expect


def test_shuffle_partition_conf_restored_even_nested(spark):
    # the loop mutates the session-global shuffle-partition conf; sequential
    # and nested use must always restore the entry value (the docstring
    # documents non-reentrancy for CONCURRENT use)
    from framequery_spark.operators.graph import connected_components

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    edges = spark.range(50).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    connected_components(edges, driver_finish_threshold=0).count()
    assert spark.conf.get(key) == before
    # error path restores too
    with pytest.raises(RuntimeError, match="converge"):
        long_chain = spark.range(400).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        connected_components(long_chain, max_iterations=1,
                             driver_finish_threshold=0).count()
    assert spark.conf.get(key) == before
