"""Sparse lexical retrieval over the document corpus: BM25 top-k.

A training-data pipeline needs lexical retrieval constantly — nearest
neighbors for decontamination triage, seed-query corpus expansion, hard
negatives for embedding training, RAG evaluation sets. Dense ANN lives in
operators/similarity.py; this module is the sparse (inverted-index) side,
as one declarative Spark plan instead of an external search service.

Scale shape (the 100 TB contract):
  - the corpus-wide work is exactly two map-side-combined aggregates over
    the token stream (per-(doc,term) tf, per-doc length) — one shuffle
    each, the same stream feeding both;
  - everything query-dependent is tiny and BROADCAST: the query-term
    table, their document frequencies, and the 1-row corpus stats, so the
    candidate generation is a broadcast hash join against tf — the
    inverted-index probe. Candidates = docs sharing >=1 term with a query
    (never |docs| x |queries|);
  - per-term contributions are cast to DECIMAL(28,12) before the per-doc
    sum (the unigram_nll discipline) so scores are order-independent and
    bit-identical across engines/partitionings for the oracle;
  - top-k per query is a rank window partitioned by query id — k rows per
    query leave the final exchange.

The reference engine (chmp/framequery) has no retrieval surface; this is a
beyond-parity operator graded with the LLM-pipeline suite.
"""

from __future__ import annotations

from functools import reduce
from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import term_table


def bm25_topk(docs: DataFrame, queries: DataFrame,
              text_col: str = "text", id_col: str = "doc_id",
              query_col: str = "query", qid_col: str = "query_id",
              k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents per query under Lucene-flavored BM25.

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (always positive)
    score(q,d) = sum over distinct terms t of q:
                 idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    `queries` is a small relation (qid_col, query_col) — broadcast by
    construction. Tokenization matches term_table (lowercase, whitespace
    split); avgdl averages over ALL docs (empty docs included). Returns
    (query_id, doc_id, score, rank) with rank 1..k per query, ties broken
    by doc_id ascending for full determinism.
    """
    terms = term_table(docs, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))

    # 1-row corpus stats, broadcast — no driver round-trip. (r12 note:
    # the dl / n_terms branches re-run the narrow tokenize map-side, but
    # that is CHEAPER than stacking extra aggregates on tf's (doc, term)
    # exchange — both a derive-everything-from-tf rewrite and a tracked
    # persist of tf measured 0.3-0.4 s slower solo at sf0.1, so the
    # original shape stands.)
    stats = (docs.agg(F.count(F.lit(1)).alias("n_docs"))
             .crossJoin(terms.agg(F.count(F.lit(1)).alias("n_terms")))
             .select("n_docs",
                     (F.col("n_terms") / F.col("n_docs")).alias("avgdl")))

    # distinct query terms (standard practice: unit query-term weight)
    qterms = (term_table(queries, query_col, qid_col)
              .select(F.col(qid_col), "term").distinct())
    # df over query terms only: join the small side INTO the corpus-wide
    # per-term counts, keeping the result query-sized, then broadcast it
    df_t = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
            .join(F.broadcast(qterms.select("term").distinct()), "term"))
    probe = (qterms.join(df_t, "term")
             .crossJoin(stats))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    cand = (tf.join(F.broadcast(probe), "term")
            .join(dl, id_col))
    tfnorm = (F.col("tf") * (k1 + 1)
              / (F.col("tf")
                 + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    contrib = (idf * tfnorm).cast("decimal(28,12)")

    scored = (cand.select(F.col(qid_col), F.col(id_col),
                          contrib.alias("__c"))
              .groupBy(qid_col, id_col)
              .agg(F.round(F.sum("__c").cast("double"), 6).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(),
                                            F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid_col, id_col, "score", "rank"))


def rrf_fuse(rankings: List[DataFrame], k: int = 60, topk: int = 10,
             qid_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    two or more per-query rankings — the standard hybrid-search combiner
    (sparse BM25 + dense ANN) that needs no score calibration because it
    uses only RANKS:

        rrf_score(q, d) = sum over lists L containing d of 1 / (k + rank_L)

    Each input must have at most one row per (query, doc) — the top-k
    output shape of bm25_topk / cosine_topk / lsh_ann_topk. Returns
    (query_id, doc_id, rrf_score, n_lists, rank) with rank 1..topk per
    query; ties break by more lists agreeing, then doc_id ascending.

    Scale shape: the inputs are query-count x k tables — already tiny
    relative to the corpora that produced them — so the fusion is one
    union + one keyed sum + one per-query rank window, all bounded by
    |queries| * k * |lists| rows. Per-list contributions are cast to
    DECIMAL(28,12) before the sum (the bm25_topk discipline) so fused
    scores are order-independent and engine-exact for the oracle.

    The reference engine (chmp/framequery) has no retrieval surface;
    this is a beyond-parity operator graded with the LLM-pipeline suite.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least two rankings to fuse")
    if k < 1 or topk < 1:
        raise ValueError("rrf_fuse: k and topk must be >= 1")
    parts = [r.select(F.col(qid_col).alias(qid_col),
                      F.col(id_col).alias(id_col),
                      F.col(rank_col).cast("long").alias("__r"))
             for r in rankings]
    u = reduce(DataFrame.unionByName, parts)
    contrib = (F.lit(1.0) / (F.lit(float(k)) + F.col("__r"))) \
        .cast("decimal(28,12)")
    scored = (u.select(qid_col, id_col, contrib.alias("__c"))
              .groupBy(qid_col, id_col)
              .agg(F.round(F.sum("__c").cast("double"), 6).alias("rrf_score"),
                   F.count(F.lit(1)).alias("n_lists")))
    w = Window.partitionBy(qid_col).orderBy(F.col("rrf_score").desc(),
                                            F.col("n_lists").desc(),
                                            F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk)
            .select(qid_col, id_col, "rrf_score", "n_lists", "rank"))


def ndcg_at_k(results: DataFrame, qrels: DataFrame, k: int,
              qid_col: str = "query_id", id_col: str = "neighbor_id",
              rel_col: str = "rel") -> DataFrame:
    """nDCG@k of a ranked result table against graded relevance — the
    graded companion of similarity.retrieval_recall (recall@k treats all
    hits equally; nDCG rewards putting the MOST relevant items first).

        dcg@k  = sum over positions p <= k of (2^rel - 1) / log2(p + 1)
        idcg@k = dcg of the ideal ordering (qrels sorted rel desc)
        ndcg@k = dcg / idcg          (0 when a query has no relevant doc)

    `results` needs (query_id, neighbor_id, rank); rows with rank > k are
    ignored. `qrels` is (query_id, neighbor_id, rel) with integer grades
    >= 0; unjudged result docs contribute 0 gain (the trec_eval
    convention). Every query present in qrels appears in the output.

    Scale shape: both inputs are query-count x k / judgment-pool tables —
    the eval is one equi join + two keyed sums, nothing corpus-sized.
    Discounts use ln(p+1)/ln(2) (not a log2 builtin) so Spark and the
    DuckDB oracle evaluate bit-identical doubles; per-position gains are
    cast to DECIMAL(28,12) before summing (order-free, engine-exact).
    """
    if k < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    r = results.filter(F.col("rank") <= k).select(
        F.col(qid_col), F.col(id_col), F.col("rank").cast("long").alias("rank"))
    q = qrels.select(F.col(qid_col), F.col(id_col),
                     F.col(rel_col).cast("long").alias("__rel"))

    def _gain(rel, pos):
        return ((F.pow(F.lit(2.0), rel) - F.lit(1.0))
                / (F.log(pos + F.lit(1.0)) / F.log(F.lit(2.0)))) \
            .cast("decimal(28,12)")

    dcg = (r.join(q, [qid_col, id_col], "left")
           .select(F.col(qid_col),
                   _gain(F.coalesce(F.col("__rel"), F.lit(0)).cast("double"),
                         F.col("rank").cast("double")).alias("__g"))
           .groupBy(qid_col).agg(F.sum("__g").alias("__dcg")))

    iw = Window.partitionBy(qid_col).orderBy(F.col("__rel").desc(),
                                             F.col(id_col).asc())
    ideal = (q.filter(F.col("__rel") > 0)
             .withColumn("__p", F.row_number().over(iw))
             .filter(F.col("__p") <= k)
             .select(F.col(qid_col),
                     _gain(F.col("__rel").cast("double"),
                           F.col("__p").cast("double")).alias("__g"))
             .groupBy(qid_col).agg(F.sum("__g").alias("__idcg")))

    qs = q.select(qid_col).distinct()
    zero = F.lit(0).cast("decimal(28,12)")
    return (qs.join(dcg, qid_col, "left").join(ideal, qid_col, "left")
            .select(F.col(qid_col),
                    F.round(F.coalesce(F.col("__dcg"), zero)
                            .cast("double"), 6).alias("dcg"),
                    F.round(F.coalesce(F.col("__idcg"), zero)
                            .cast("double"), 6).alias("idcg"),
                    F.round(F.when(F.coalesce(F.col("__idcg"), zero)
                                   > zero,
                                   F.coalesce(F.col("__dcg"), zero)
                                   .cast("double")
                                   / F.col("__idcg").cast("double"))
                            .otherwise(F.lit(0.0)), 6).alias("ndcg")))
