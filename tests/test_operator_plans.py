"""Plan-shape tests for the pipeline operators: the 100 TB scale contracts
(candidate generation is never an all-pairs cross product; ANN probing
broadcasts the small query side so the corpus never shuffles) must be
visible in the physical plans.

These complement tests/test_operators.py (result correctness) — a future
refactor that silently reintroduces a cartesian candidate join would pass
the correctness suite at test scale and melt down at corpus scale; these
assertions catch it at test time.
"""

import pytest

from pyspark.sql import functions as F

from framequery_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def docs(tpch_scope):
    return tpch_scope["documents"]


@pytest.fixture(scope="module")
def emb(tpch_scope):
    return tpch_scope["embeddings"]


def _assert_no_cartesian(df):
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_minhash_candidates_are_equi_join(docs):
    from framequery_spark.operators.dedup import minhash_lsh_pairs

    _assert_no_cartesian(
        minhash_lsh_pairs(docs, num_perm=16, bands=8, threshold=0.7))


def test_jaccard_candidates_are_equi_join(docs):
    from framequery_spark.operators.dedup import jaccard_pairs

    _assert_no_cartesian(jaccard_pairs(docs, threshold=0.7))


def test_simhash_candidates_are_equi_join(docs):
    from framequery_spark.operators.dedup import simhash_near_pairs

    _assert_no_cartesian(simhash_near_pairs(docs, max_hamming=8))


def test_levenshtein_candidates_are_equi_join(docs):
    from framequery_spark.operators.dedup import levenshtein_pairs

    _assert_no_cartesian(levenshtein_pairs(docs))


def test_lsh_ann_broadcasts_query_side(emb):
    from framequery_spark.operators.similarity import lsh_ann_topk

    df = lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=3,
                      n_bits=4, n_tables=2)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the bucket join must be a broadcast hash join (query side broadcast):
    # the corpus signature stream is map-side only, no corpus shuffle
    assert "BroadcastHashJoin" in plan, plan


def test_ivf_broadcasts_query_side(emb):
    from framequery_spark.operators.similarity import ivf_topk

    df = ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3,
                  n_centroids=4, n_probe=2)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_cosine_topk_broadcasts_query_side(emb):
    from framequery_spark.operators.similarity import cosine_topk

    df = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    plan = formatted_plan(df)
    # brute force is BY DESIGN a broadcast cross product: the query side is
    # built (broadcast), the corpus side streamed — so the corpus is scanned
    # exactly once without a join shuffle. (The only other exchanges are
    # _spread's input repartition — a no-op at cluster scale — and the
    # row_number window shuffle over the scored candidates.)
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan, plan


def test_asof_join_is_single_shuffle(tpch_scope):
    from framequery_spark.operators.asof import asof_join

    ev = tpch_scope["events"]
    left = ev.filter(F.col("event_type") == "purchase") \
             .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click") \
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts"))
    df = asof_join(left, right, on=["user_id"], left_ts="ts",
                   right_ts="click_ts")
    plan = formatted_plan(df)
    # union + window implementation: no join node at all — an SMJ-based
    # as-of would shuffle both sides AND sort twice
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hash_split_is_shuffle_free(tpch_scope):
    from framequery_spark.operators.sampling import hash_split

    plan = formatted_plan(hash_split(tpch_scope["orders"], "o_orderkey"))
    assert "Exchange" not in plan, plan  # narrow: label is row-local


def test_pack_bins_single_shuffle(docs):
    from framequery_spark.operators.packing import pack_bins
    from framequery_spark.operators.text import token_count

    import re

    d = docs.withColumn("n_tokens", token_count(F.col("text")))
    plan = formatted_plan(pack_bins(d, "n_tokens", 2048, "lang", ("doc_id",)))
    # one window shuffle, no more (count detail-section headers, the tree
    # prints each node a second time)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_tf_idf_broadcasts_corpus_size(docs):
    from framequery_spark.operators.text import tf_idf

    plan = formatted_plan(tf_idf(docs))
    # N joins in via BroadcastExchange of a 1-row aggregate; the tf<->df_t
    # join must NOT be a nested loop
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_vocab_topk_avoids_global_sort(docs):
    from framequery_spark.operators.text import vocab_topk

    plan = formatted_plan(vocab_topk(docs, "text", 10))
    assert "TakeOrderedAndProject" in plan, plan
    # partial aggregation must run before the exchange (map-side combine)
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_pii_scrub_and_repetition_are_shuffle_free(docs):
    from framequery_spark.operators.text import pii_scrub, repetition_stats

    for df in (pii_scrub(docs), repetition_stats(docs)):
        plan = formatted_plan(df)
        assert "Exchange" not in plan, plan


def test_bucketed_join_has_no_exchange(spark, tpch_scope, tmp_path):
    """Bucketing contract: two tables bucketed on the same key and count
    join with ZERO Exchange — the write-time shuffle is reused."""
    import uuid

    from framequery_spark.sources.bucketing import write_bucketed

    tag = uuid.uuid4().hex[:8]
    t_o, t_c = f"b_orders_{tag}", f"b_customer_{tag}"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = write_bucketed(tpch_scope["orders"], t_o,
                           ["o_custkey"], 8, sort_cols=["o_custkey"])
        c = write_bucketed(tpch_scope["customer"], t_c,
                           ["c_custkey"], 8, sort_cols=["c_custkey"])
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == tpch_scope["orders"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_asof_sql_join_is_single_window_pass(spark, tpch_scope):
    """ASOF JOIN SQL compiles to the union+window operator: no cartesian,
    no broadcast-nested-loop — the same contract as the DataFrame op."""
    import framequery_spark as fq

    df = fq.execute(
        "SELECT e.event_id, c.click_ts FROM e ASOF LEFT JOIN c "
        "ON e.user_id = c.user_id AND e.ts > c.click_ts",
        {"e": tpch_scope["events"].select("event_id", "user_id", "ts"),
         "c": tpch_scope["events"].selectExpr(
             "event_id AS click_id", "user_id", "ts AS click_ts")},
        spark=spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan


def test_connected_components_rounds_are_equi_joins(spark):
    # each large-star/small-star round must be a grouped-aggregate +
    # hash-partitioned equi join on the node column — never a cartesian or
    # nested-loop expansion of neighborhoods
    from framequery_spark.operators import graph

    e = spark.createDataFrame([(i, i + 1) for i in range(50)],
                              ["u", "v"])
    for step in (graph._large_star, graph._small_star):
        df = step(e)
        _assert_no_cartesian(df)


def test_connected_components_output_plan_is_equi_join(spark):
    from framequery_spark.operators.graph import connected_components

    e = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["src", "dst"])
    out = connected_components(e)
    _assert_no_cartesian(out)


def test_bloom_dedup_joins_only_candidates(docs):
    # the bloom-negative branch must bypass the anti join entirely: exactly
    # one join in the whole plan (the candidate anti join), and the
    # membership check is a single Arrow-batched python stage, not per-row
    from framequery_spark.operators.bloom import bloom_dedup_against

    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    plan = formatted_plan(bloom_dedup_against(new, corpus, ["text"]))
    _assert_no_cartesian(bloom_dedup_against(new, corpus, ["text"]))
    n_joins = plan.count("Join LeftAnti") or plan.count("LeftAnti")
    assert n_joins >= 1, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan, plan  # would be row-at-a-time
    assert "ArrowEvalPython" in plan, plan


def test_contamination_broadcasts_benchmark(docs):
    from framequery_spark.operators.contamination import contaminated_docs

    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    df = contaminated_docs(train, bench, n=8)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan     # bench gram set broadcast
    _assert_no_cartesian(df)


def test_split_leakage_is_equi_join(docs):
    from framequery_spark.operators.contamination import (
        split_leakage_ngrams, split_leakage_pairs)
    from framequery_spark.operators.sampling import hash_split

    tagged = hash_split(docs, "doc_id")
    _assert_no_cartesian(split_leakage_ngrams(tagged, n=8))
    _assert_no_cartesian(split_leakage_pairs(tagged))


def test_bm25_broadcasts_query_side(spark, docs):
    from framequery_spark.operators.retrieval import bm25_topk

    qdf = spark.createDataFrame([(1, "spark shuffle"), (2, "hash join")],
                                "query_id long, query string")
    plan = formatted_plan(bm25_topk(docs, qdf, k=5))
    # the inverted-index probe: query terms + stats broadcast INTO the
    # corpus tf table — the corpus never shuffles for the probe, and the
    # candidate join is an equi join, not a nested loop
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mixture_sample_is_shuffle_free(docs):
    from framequery_spark.operators.sampling import mixture_sample

    out = mixture_sample(docs, "source", {"src1": 0.5, "src2": 0.25},
                         key_col="doc_id", default_rate=0.1)
    plan = formatted_plan(out)
    # row-local hash-threshold CASE: pure filter, no exchange
    assert "Exchange" not in plan, plan


def test_semdedup_pairs_are_cell_equi_join(emb):
    from framequery_spark.operators.similarity import semdedup

    pairs = semdedup(emb.filter(F.col("vec_id") < 200), threshold=0.6,
                     n_clusters=4, return_pairs=True)
    _assert_no_cartesian(pairs)


def test_dsir_scoring_broadcasts_log_ratio_table(docs):
    """DSIR scoring joins the bounded log-ratio table (<= n_buckets rows)
    onto the per-doc feature stream via broadcast — the corpus-sized side
    must never shuffle for that join."""
    from framequery_spark.operators.dsir import dsir_weights

    target = docs.where(F.col("doc_id") % 7 == 0)
    raw = docs.where(F.col("doc_id") % 7 != 0)
    plan = formatted_plan(dsir_weights(raw, target, n_buckets=100))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_lm_vocab_joins_broadcast_at_default_config(docs):
    """The ctx/uni count tables are vocab-bounded but Zipfian-keyed — at
    default config they must broadcast, never shuffle the corpus-sized
    bigram stream on a bare `prev`/`w` key (hot-key stragglers at scale)."""
    import re

    from framequery_spark.operators.cache import release_cached
    from framequery_spark.operators.text import bigram_lm_nll

    plan = formatted_plan(bigram_lm_nll(docs))
    release_cached()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert not re.search(
        r"(SortMergeJoin|ShuffledHashJoin) (keys: )?\[(prev|w)#\d+\]", plan
    ), plan


def test_bigram_lm_salted_path_matches_broadcast_path(docs):
    """Above the vocab threshold the scoring joins fall back to
    deterministic salting; results must be identical to the broadcast
    path (same hash evidence as the driver entry)."""
    from framequery_spark.operators.cache import release_cached
    from framequery_spark.operators.text import bigram_lm_nll

    sample = docs.where(F.col("doc_id") < 100)
    base = sorted(tuple(r) for r in bigram_lm_nll(sample).collect())
    release_cached()
    salted = sorted(
        tuple(r) for r in
        bigram_lm_nll(sample, broadcast_vocab_max=0, salt=4).collect())
    release_cached()
    assert base == salted
    assert len(base) > 0
    # r12: the probe-skipping caller knob must pick the same paths
    pinned = sorted(tuple(r) for r in
                    bigram_lm_nll(sample, vocab_broadcast=True).collect())
    release_cached()
    pinned_salted = sorted(
        tuple(r) for r in
        bigram_lm_nll(sample, vocab_broadcast=False, salt=4).collect())
    release_cached()
    assert pinned == base
    assert pinned_salted == base


def test_ngram_novelty_is_gram_keyed_equi_join(docs):
    """Novelty joins the distinct (gram, id) pairs to the min-id-per-gram
    table on the gram key — a hash equi join whose fan-out is the number
    of documents carrying each gram, never an all-pairs product."""
    from framequery_spark.operators.text import ngram_novelty

    _assert_no_cartesian(ngram_novelty(docs))


def test_source_overlap_broadcasts_size_table(docs):
    """The per-group vocabulary sizes are a group-bounded aggregate and
    must broadcast onto the pair counts; the vocab self-join stays a
    term-keyed equi join (fan-out bounded by #groups per term)."""
    from framequery_spark.operators.cache import release_cached
    from framequery_spark.operators.text import source_overlap

    plan = formatted_plan(source_overlap(docs))
    release_cached()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zipf_slope_aggregates_after_one_vocab_shuffle(docs):
    """Zipf fitting works on the (group, term) count table — vocabulary-
    sized, not corpus-sized; no joins at all appear in the plan."""
    from framequery_spark.operators.text import zipf_slope

    plan = formatted_plan(zipf_slope(docs))
    assert "Join" not in plan, plan


def test_perplexity_buckets_joins_on_id(docs):
    """Bucketing joins the unigram scores back on the id key — a hash
    equi join. (The one BroadcastNestedLoopJoin in the plan is
    unigram_nll's deliberate 1-row corpus-total broadcast, not a
    candidate join.)"""
    from framequery_spark.operators.text import perplexity_buckets

    plan = formatted_plan(perplexity_buckets(docs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_lr_quality_scoring_broadcasts_the_weight_side(docs):
    """The classifier's weight table is <= n_buckets rows by construction
    and must reach the feature stream as a broadcast hash join — never a
    shuffle keyed on the Zipfian bucket distribution, never a cartesian."""
    from framequery_spark.operators.classifier import lr_score

    plan = formatted_plan(lr_score(docs, [0.1] * 256))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_remove_repeated_spans_is_hash_keyed_equi_join(docs):
    from framequery_spark.operators.dedup import remove_repeated_spans

    out = remove_repeated_spans(docs, k=8, min_copies=2)
    _assert_no_cartesian(out)
    plan = formatted_plan(out)
    # the occurrence count must aggregate on the fixed-width md5 gram key
    # (partial map-side combine), never on raw gram text or token columns
    assert "md5" in plan, plan
    # no Python UDF anywhere — span surgery is pure JVM array HOF work
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_take_token_budget_two_phase_prefix_sum_shape(docs):
    from pyspark.sql import functions as F

    from framequery_spark.operators.packing import take_token_budget

    t = docs.select("doc_id", "n_chars",
                    F.size(F.split(F.trim("text"), r"\s+")).cast("long")
                    .alias("n_tokens"))
    out = take_token_budget(t, 15000, score_col="n_chars",
                            token_col="n_tokens", chunk=64)
    _assert_no_cartesian(out)
    plan = formatted_plan(out)
    # the bucket-offset table must come back via broadcast, and the
    # corpus-side running sum must be a window PARTITIONED by
    # (score, chunk). Parse every windowspecdefinition: partition columns
    # are the leading entries before the first ordered (ASC/DESC) entry.
    # The corpus window is the one ordering by doc_id — it must carry
    # __chunk in its PARTITION list (a regression to a global
    # unpartitioned corpus cumsum would order by doc_id with an empty
    # partition spec and still contain "__chunk" elsewhere in the plan,
    # which the old `"__chunk" in plan` check could not catch).
    import re

    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    corpus_windows = 0
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        entries = [e.strip() for e in m.group(1).split(",")]
        partition = []
        order = []
        for e in entries:
            if " ASC" in e or " DESC" in e:
                order.append(e)
            elif not order and "windowframe" not in e:
                partition.append(e)
        if any(o.startswith("doc_id") for o in order):
            corpus_windows += 1
            assert any(p.startswith("__chunk") for p in partition), (
                "corpus-side cumsum window is not partitioned by __chunk "
                f"(partition={partition}, order={order}):\n{plan}")
    assert corpus_windows >= 1, plan


def test_to_tsvector_runs_one_word_parse_per_row(docs):
    """to_tsvector must cost ONE regex word-parse per row (plus one sort):
    the r07 construction re-ran the parse once per distinct lexeme
    (O(lexemes x tokens) per row — a per-row scale-killer on long
    documents at corpus scale even though it is shuffle-free). The split
    pattern appearing once in the projection is the contract."""
    from framequery_spark.functions.textsearch import to_tsvector

    out = docs.select(to_tsvector(F.col("text")).alias("tsv"))
    plan = formatted_plan(out)
    assert plan.count("[^a-z0-9]+") == 1, plan
    # and no Python UDF: the vector is built from JVM array HOFs
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_to_tsvector_english_runs_one_word_parse_per_row(docs):
    from framequery_spark.functions.textsearch import to_tsvector

    out = docs.select(to_tsvector(F.col("text"), "english").alias("tsv"))
    plan = formatted_plan(out)
    assert plan.count("[^a-z0-9]+") == 1, plan


def test_hard_negatives_broadcasts_query_side(emb):
    from framequery_spark.operators.similarity import hard_negatives

    df = hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=3)
    plan = formatted_plan(df)
    # brute force scan shape like cosine_topk: query side built
    # (broadcast), corpus streamed once — never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan and "BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_alpha_mixture_totals_are_broadcast(docs):
    from framequery_spark.operators.sampling import alpha_mixture_weights

    plan = formatted_plan(alpha_mixture_weights(docs))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    # map-side combine on the source groupBy
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_concat_chunks_two_phase_prefix_sum_shape(docs):
    import re

    from framequery_spark.operators.packing import concat_chunks
    from framequery_spark.operators.text import token_count

    t = docs.select("doc_id",
                    token_count(F.col("text")).cast("long")
                    .alias("n_tokens"))
    plan = formatted_plan(concat_chunks(t, block_size=512, chunk=64))
    _assert_no_cartesian(concat_chunks(t, block_size=512, chunk=64))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the corpus-side cumsum window must be PARTITIONED by __chunk; only
    # the bounded bucket table may carry an unpartitioned window
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        entries = [e.strip() for e in m.group(1).split(",")]
        partition, order = [], []
        for e in entries:
            if " ASC" in e or " DESC" in e:
                order.append(e)
            elif not order and "windowframe" not in e:
                partition.append(e)
        if any(o.startswith("doc_id") for o in order):
            assert any(p.startswith("__chunk") for p in partition), plan


# ------------------------------------------------- round 9 scale contracts


@pytest.fixture(scope="module")
def events_t(tpch_scope):
    return tpch_scope["events"]


def test_funnel_is_single_user_shuffle_fold(events_t):
    from framequery_spark.operators.events import funnel_counts

    df = funnel_counts(events_t, ["view", "click", "purchase"],
                       within_seconds=172_800)
    plan = formatted_plan(df)
    _assert_no_cartesian(df)
    # the fold runs on collected per-user lists: exactly one aggregate
    # keyed on the user (partial + final), no window over the full stream
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user") <= 1


def test_retention_joins_are_keyed_and_sizes_broadcast(events_t):
    from framequery_spark.operators.events import retention_cohorts

    df = retention_cohorts(events_t, granularity="day")
    plan = formatted_plan(df)
    _assert_no_cartesian(df)
    # the user-keyed join of first-activity vs distinct activity may be a
    # shuffle join (both sides scale with users); the cohort-size
    # normalizer must be the broadcast side
    assert "BroadcastExchange" in plan
    assert "Window" not in plan  # no global window anywhere


def test_trgm_pairs_is_gram_keyed_equi_join(docs):
    from framequery_spark.operators.dedup import trgm_pairs

    _assert_no_cartesian(trgm_pairs(docs, threshold=0.8))


def test_trgm_pairs_frequency_cap_is_broadcast_anti_join(docs):
    from framequery_spark.operators.dedup import trgm_pairs

    plan = formatted_plan(trgm_pairs(docs, threshold=0.8, max_doc_freq=50))
    # the frequent-trigram screen must broadcast the SMALL frequent set
    # and anti-join map-side BEFORE any wide shuffle — never shuffle the
    # gram stream for it, and never ship dropped grams' occurrences
    # through a grouping (r13 probe: post-group filtering was
    # catastrophic on boilerplate-heavy corpora)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_group_sample_window_is_group_partitioned(docs):
    from framequery_spark.operators.sampling import group_sample_k

    plan = formatted_plan(group_sample_k(docs, "source", "doc_id", k=4))
    # per-group rank: the window must be PARTITIONED by the group —
    # a global (unpartitioned) window would funnel the corpus through
    # one reducer
    assert "Window" in plan
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.strip().startswith("source") for s in specs), specs


def test_source_divergence_vocab_is_topn_not_global_sort(docs):
    from framequery_spark.operators.text import source_divergence

    df = source_divergence(docs, vocab_size=100)
    plan = formatted_plan(df)
    # top-N vocab must compile to TakeOrderedAndProject (per-partition
    # top-N + merge), never a full Sort of the vocabulary
    assert "TakeOrderedAndProject" in plan
    # the vocab grid reaches the group counts via broadcast
    assert "BroadcastExchange" in plan


def test_weighted_sample_global_is_topk_not_global_sort(docs):
    from framequery_spark.operators.sampling import weighted_sample_k

    plan = formatted_plan(weighted_sample_k(docs, "n_chars", "doc_id", k=10))
    # A-Res global top-k must compile to TakeOrderedAndProject —
    # per-partition top-k + merge, never a full Sort + Limit
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_grouped_window_is_group_partitioned(docs):
    import re

    from framequery_spark.operators.sampling import weighted_sample_k

    plan = formatted_plan(weighted_sample_k(docs, "n_chars", "doc_id", k=3,
                                            group_col="source"))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.strip().startswith("source") for s in specs), specs


# ----------------------------------------- round 9 (second pass) contracts


def test_rfm_thresholds_are_broadcast_no_global_window(events_t):
    from framequery_spark.operators.events import rfm_segments

    plan = formatted_plan(rfm_segments(events_t))
    # quartile scoring joins ONE broadcast single-row aggregate; the
    # textbook ntile(4) formulation would put a global Window here and
    # funnel every user through one reducer
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_stratified_split_windows_are_stratum_partitioned(docs):
    import re

    from framequery_spark.operators.sampling import stratified_split

    plan = formatted_plan(stratified_split(docs, ["lang", "source"],
                                           "doc_id"))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    # both window passes (dense_rank, max-rank) partition by the strata —
    # an unpartitioned spec would be the single-reducer failure mode
    assert specs and all(s.strip().startswith("lang") for s in specs), specs
    # and they reuse ONE exchange: a second shuffle for the second pass
    # would double the operator's cost for nothing
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_pmi_topk_is_take_ordered_totals_broadcast(docs):
    from framequery_spark.operators.text import pmi_bigrams

    plan = formatted_plan(pmi_bigrams(docs, min_count=3, top_k=20))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    _assert_no_cartesian_except_broadcast_single_row(plan)


def _assert_no_cartesian_except_broadcast_single_row(plan):
    # the 1-row totals cross joins compile to BroadcastNestedLoopJoin —
    # bounded by construction; a CartesianProduct would not be
    assert "CartesianProduct" not in plan, plan


def test_pagerank_iterations_are_keyed_joins(emb, docs):
    from framequery_spark.operators.graph import pagerank

    edges = docs.limit(200).selectExpr("doc_id AS src",
                                       "(doc_id + 1) AS dst")
    plan = formatted_plan(pagerank(edges, iterations=2))
    # rank propagation must be hash-keyed equi joins on the node id —
    # never a cartesian
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan, plan


def test_profile_is_single_aggregate_pass(docs):
    from framequery_spark.operators.profile import profile_numeric

    plan = formatted_plan(profile_numeric(docs, ["n_chars"]))
    # one scan, one partial+final aggregate, a row-local explode — no
    # joins, no windows, no second scan of the input (one Location line
    # per distinct parquet scan in the formatted details)
    assert plan.count("Location: InMemoryFileIndex") <= 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_ks_drift_window_is_over_bounded_value_table(events_t):
    from framequery_spark.operators.events import ks_drift

    plan = formatted_plan(ks_drift(events_t, "event_type",
                                   "purchase", "click"))
    # the CDF window runs AFTER the value-keyed aggregate (bounded by the
    # quantized dynamic range) — the aggregate must appear below the
    # window in the plan; and the totals join is a broadcast
    assert "Window" in plan
    assert "BroadcastExchange" in plan


def test_oov_vocab_join_is_broadcast(docs):
    from framequery_spark.operators.text import oov_rate

    plan = formatted_plan(oov_rate(docs, vocab_size=50))
    # the vocab side is bounded (top-k) and must broadcast — a shuffled
    # join would move the exploded token stream twice
    assert "BroadcastHashJoin" in plan, plan


def test_rrf_fuse_no_corpus_sized_joins(spark):
    from framequery_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 10, 1)],
                              "query_id long, doc_id long, rank int")
    b = spark.createDataFrame([(1, 11, 1)],
                              "query_id long, doc_id long, rank int")
    plan = formatted_plan(rrf_fuse([a, b], topk=3))
    # rank fusion = union + keyed sum + per-query window: no join at all,
    # and the decimal sum gets a map-side partial
    assert "Join" not in plan, plan
    assert "Union" in plan, plan
    assert "partial_sum" in plan or "partial sum" in plan.lower(), plan


def test_ndcg_joins_are_query_keyed_not_nested(spark):
    from framequery_spark.operators.retrieval import ndcg_at_k

    res = spark.createDataFrame([(1, 10, 1)],
                                "query_id long, neighbor_id long, rank int")
    qr = spark.createDataFrame([(1, 10, 3)],
                               "query_id long, neighbor_id long, rel int")
    plan = formatted_plan(ndcg_at_k(res, qr, k=5))
    # eval tables are queries x k: equi joins only, never a cartesian
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_winnow_fingerprints_row_local_no_udf(docs):
    from framequery_spark.operators.dedup import winnow_fingerprints

    plan = formatted_plan(winnow_fingerprints(docs))
    # fingerprint selection is pure JVM HOF work: no Python, no exchange
    # (the only allowed exchange is the _spread round-robin repartition)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan, plan  # the explode


def test_winnow_pairs_only_join_is_the_cap_anti_join(docs):
    from framequery_spark.operators.dedup import winnow_pairs

    plan = formatted_plan(winnow_pairs(docs, max_doc_freq=20))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # r13: pair generation is group-by-fingerprint + row-local expansion —
    # the only join left is the broadcast anti-join of the tiny frequent
    # set (the boilerplate cap); the fingerprint stream is never a
    # shuffle-join input
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "LeftAnti" in plan and "BroadcastExchange" in plan, plan
    # without a cap there is no join at all
    plan2 = formatted_plan(winnow_pairs(docs, max_doc_freq=None))
    assert "Join" not in plan2, plan2


def test_containment_pairs_blocked_join_shape(docs):
    from framequery_spark.operators.dedup import containment_pairs

    plan = formatted_plan(containment_pairs(docs))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
