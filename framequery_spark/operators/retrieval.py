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

    # 1-row corpus stats, broadcast — no driver round-trip
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
