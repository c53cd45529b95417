#!/usr/bin/env python
"""End-to-end tour of framequery_spark (run: python examples/demo.py).

Mirrors the reference's README example (reference Readme.md:27-35) and then
shows the beyond-parity surface: windows, set ops, LATERAL json, the
Executor session, and the LLM-pipeline operators.
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import framequery_spark as fq

    # --- the reference README example -------------------------------------
    sales = spark.createDataFrame(pd.DataFrame({
        "store_id": [1, 2, 3, 4], "sales": [5, 6, 7, 8]}))
    stores = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3, 4], "country": ["US", "US", "DE", "DE"]}))

    fq.execute("""
        SELECT country, sum(sales) AS total_sales
        FROM sales JOIN stores ON sales.store_id = stores.id
        GROUP BY country
    """, {"sales": sales, "stores": stores}, spark=spark).show()

    # --- persistent session with DDL + user functions ---------------------
    ex = fq.Executor({"sales": sales, "stores": stores}, spark=spark)
    ex.execute("CREATE TABLE by_country AS "
               "SELECT country, sum(sales) AS total FROM sales "
               "JOIN stores ON store_id = id GROUP BY country")
    ex.add_column_function("double_it", lambda c: c * 2)
    ex.execute("SELECT country, double_it(total) AS twice FROM by_country "
               "ORDER BY country").show()

    # --- windows / set ops / lateral json ---------------------------------
    fq.execute("""
        SELECT country, sales,
               rank() OVER (PARTITION BY country ORDER BY sales DESC) AS r
        FROM sales JOIN stores ON store_id = id
    """, ex.scope, spark=spark).show()

    payloads = spark.createDataFrame(pd.DataFrame({
        "id": [1], "j": ['{"lang": "en", "split": "train"}']}))
    fq.execute("SELECT id, key, value FROM p, LATERAL json_each(p.j)",
               {"p": payloads}, spark=spark).show()

    # --- LLM-pipeline operators on the synthetic documents table ----------
    sf_dir = "/root/testdata/sf0.001"
    if os.path.isdir(sf_dir):
        from framequery_spark.operators.dedup import minhash_lsh_pairs
        from framequery_spark.operators.text import text_stats
        from framequery_spark.sources.testdata import load_tables

        scope = load_tables(spark, sf_dir)
        text_stats(scope["documents"]).show(5)
        minhash_lsh_pairs(scope["documents"], threshold=0.7).show(5)

        # the same operators are table functions in the SQL dialect
        fq.execute("""
            SELECT lang_guess, count(*) AS n, round(avg(quality), 3) AS q
            FROM text_stats('documents')
            GROUP BY lang_guess ORDER BY n DESC
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM minhash_pairs('documents', 0.7)
            WHERE jaccard > 0.9 ORDER BY id1 LIMIT 5
        """, scope, spark=spark).show()

        # --- round-4 surface: ASOF JOIN, JSON arrows, HLL sketches --------
        fq.execute("""
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 r AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                       FROM events WHERE event_type = 'click')
            SELECT count(r.click_id) AS purchases_with_prior_click,
                   count(*) AS purchases
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts > r.click_ts
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT props ->> 'k' AS k, count(*) AS n
            FROM events GROUP BY 1 ORDER BY n DESC LIMIT 3
        """, scope, spark=spark).show()
        fq.execute("""
            WITH sk AS (SELECT event_type,
                               hll_sketch_agg(user_id) AS s
                        FROM events GROUP BY event_type)
            SELECT event_type, hll_sketch_estimate(s) AS approx_users
            FROM sk ORDER BY event_type
        """, scope, spark=spark).show()

        # --- round-5 surface: QUALIFY, PIVOT, dup clustering, PQ ANN ------
        fq.execute("""
            SELECT user_id, event_id, value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY value DESC) = 1
            ORDER BY user_id LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("PIVOT documents ON lang USING count(*) GROUP BY source "
                   "ORDER BY source", scope, spark=spark).show(5)
        # near-dup pairs -> transitive clusters -> keep-one-per-cluster
        fq.execute("""
            WITH pairs AS (SELECT id1, id2 FROM minhash_pairs('documents', 0.5))
            SELECT count(*) AS docs_in_dup_clusters,
                   count(DISTINCT cluster_id) AS n_clusters
            FROM dup_clusters('pairs')
        """, scope, spark=spark).show()
        # incremental ingest: drop new docs that near-dup the corpus
        fq.execute("""
            WITH corpus AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
                 batch  AS (SELECT * FROM documents WHERE doc_id % 2 = 1)
            SELECT count(*) AS surviving_new_docs
            FROM dedup_against('batch', 'corpus', 0.7)
        """, scope, spark=spark).show()
        # compressed ANN: PQ codes + ADC scan + exact re-rank
        fq.execute("""
            WITH q AS (SELECT * FROM embeddings WHERE vec_id < 3)
            SELECT query_id, neighbor_id, cosine
            FROM pq_topk('embeddings', 'q', 3) ORDER BY query_id, rank
        """, scope, spark=spark).show()

        # --- round-5 continued: corpus hygiene, upserts, regex ops --------
        # benchmark decontamination: training docs sharing an 8-gram with
        # the benchmark slice
        fq.execute("""
            WITH bench AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
                 train AS (SELECT * FROM documents WHERE doc_id % 10 <> 0)
            SELECT count(*) AS contaminated_docs
            FROM contaminated_docs('train', 'bench', 8)
        """, scope, spark=spark).show()
        # cross-split leakage audit over the deterministic hash split
        fq.execute("""
            WITH tagged AS (SELECT * FROM hash_split('documents', 'doc_id'))
            SELECT split_a, split_b, count(*) AS leaked_pairs
            FROM split_leakage('tagged', 8) GROUP BY 1, 2 ORDER BY 1, 2
        """, scope, spark=spark).show()
        # pg regex operators + array slices
        fq.execute("""
            SELECT count(*) AS n,
                   (string_to_array(min(text), ' '))[1:3] AS first_words
            FROM documents WHERE text ~ 'join.*merge' AND lang !~* '^X'
        """, scope, spark=spark).show(truncate=False)

        # MERGE / ON CONFLICT / RETURNING need a persistent session
        ex = fq.Executor(scope={"inv": spark.createDataFrame(
            pd.DataFrame({"sku": ["a", "b"], "qty": [5, 0]}))}, spark=spark)
        ex.execute("""
            MERGE INTO inv USING (VALUES ('b', 3), ('c', 7)) AS d(sku, qty)
            ON inv.sku = d.sku
            WHEN MATCHED THEN UPDATE SET qty = inv.qty + d.qty
            WHEN NOT MATCHED THEN INSERT VALUES (d.sku, d.qty)
        """)
        ex.execute("""
            INSERT INTO inv VALUES ('a', 1), ('d', 9)
            ON CONFLICT (sku) DO UPDATE SET qty = inv.qty + excluded.qty
            RETURNING sku, qty
        """).show()
        ex.execute("SELECT * FROM inv ORDER BY sku").show()

        # --- full-text search (round 8): Snowball stemming, web syntax,
        # headline, corpus stats — all JVM expressions
        fq.execute("""
            SELECT source,
                   count(*) FILTER (WHERE to_tsvector('english', text)
                     @@ websearch_to_tsquery('english', '"hash join" OR
                     merge -broadcast')) AS n_match
            FROM documents GROUP BY source ORDER BY source LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT ts_headline('english', text,
                     to_tsquery('english', 'join & merge'),
                     'MaxWords=12, MinWords=6') AS snippet
            FROM documents
            WHERE to_tsvector('english', text)
                  @@ to_tsquery('english', 'join & merge')
            LIMIT 3
        """, scope, spark=spark).show(truncate=False)
        fq.execute("""
            SELECT word, ndoc, nentry
            FROM ts_stat('SELECT to_tsvector(''english'', text)
                          FROM documents')
            ORDER BY nentry DESC, word LIMIT 5
        """, scope, spark=spark).show()

        # --- training-mix assembly (round 8): temperature reweighting +
        # hard negatives over the embedding table
        fq.execute("""
            SELECT * FROM alpha_mixture_weights('documents', 'source', 0.3)
            ORDER BY share_after DESC LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            WITH q AS (SELECT * FROM embeddings WHERE vec_id < 3)
            SELECT query_id, neighbor_id, neighbor_label, cosine
            FROM hard_negatives('embeddings', 'q', 3)
            ORDER BY query_id, rank
        """, scope, spark=spark).show()

        # --- round 9: pg_trgm fuzzy matching + cover-density ranking ------
        fq.execute("""
            SELECT p_name,
                   round(cast(similarity(p_name, 'small widgets')
                              AS double), 3) AS sim
            FROM part WHERE p_name % 'small widgets'
            ORDER BY sim DESC, p_partkey LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT doc_id,
                   round(cast(ts_rank_cd(to_tsvector('english', text),
                         to_tsquery('english', 'join & merge'))
                         AS double), 4) AS rank_cd
            FROM documents
            WHERE to_tsvector('english', text)
                  @@ to_tsquery('english', 'join & merge')
            ORDER BY rank_cd DESC, doc_id LIMIT 5
        """, scope, spark=spark).show()

        # --- round 9: event analytics + fuzzy join + mixture diagnostics --
        fq.execute("""
            SELECT * FROM funnel('events', 'view', 'click', 'purchase',
                                 172800)
            ORDER BY stage_idx
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM retention_cohorts('events', 'week')
            ORDER BY cohort, "offset" LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            WITH names AS (SELECT DISTINCT p_name AS doc_id,
                                  p_name AS text FROM part)
            SELECT * FROM trgm_pairs('names', 0.55)
            ORDER BY sim DESC, id1 LIMIT 5
        """, scope, spark=spark).show(truncate=False)
        fq.execute("""
            SELECT source, count(*) AS sampled
            FROM group_sample('documents', 'source', 'doc_id', 2)
            GROUP BY source ORDER BY source LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM source_divergence('documents', 300)
            ORDER BY js DESC LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT doc_id, n_chars
            FROM weighted_sample('documents', 'n_chars', 'doc_id', 5)
            ORDER BY doc_id
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT soundex('Margaret') AS code,
                   difference('Anne', 'Andrew') AS diff,
                   levenshtein('kitten', 'sitting') AS lev,
                   unaccent('Łódź Straße Hôtel') AS plain
        """, scope, spark=spark).show(truncate=False)
        fq.execute("""
            SELECT e.vec_id, round(e.embedding <=> q.embedding, 4) AS cosd
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id <> 0
            ORDER BY cosd, e.vec_id LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            WITH bench AS (SELECT * FROM embeddings WHERE vec_id < 20),
                 train AS (SELECT * FROM embeddings WHERE vec_id >= 20)
            SELECT count(*) AS surviving
            FROM semantic_decontaminate('train', 'bench', 0.35)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM event_anomaly('events', 'day', 1.5)
            WHERE is_anomaly ORDER BY event_type, bucket LIMIT 5
        """, scope, spark=spark).show()

        # --- round 9 continued: analytics + corpus-linguistics operators --
        fq.execute("""
            SELECT lang, split, count(*) AS n
            FROM stratified_split('documents', 'lang', 'source', 'doc_id')
            GROUP BY lang, split ORDER BY lang, split LIMIT 6
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT segment, count(*) AS n_users
            FROM rfm_segments('events')
            GROUP BY segment ORDER BY n_users DESC, segment LIMIT 5
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM ks_drift('events', 'event_type',
                                   'purchase', 'click')
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM changepoint('events', 'hour', 3)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM pmi_bigrams('documents', 5, 5)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM textrank_keywords('documents', 5)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT * FROM profile_numeric('lineitem', 'l_quantity',
                                          'l_extendedprice')
            ORDER BY "column"
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT round(avg(oov_rate), 4) AS mean_oov
            FROM oov_rate('documents', 20)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT encode(digest('framequery', 'sha256'), 'hex') AS sha,
                   get_byte(decode('1234567890', 'hex'), 4) AS b4,
                   encode(decode('YWJj', 'base64'), 'hex') AS rt
        """, scope, spark=spark).show(truncate=False)
        fq.execute("""
            WITH q AS (SELECT * FROM embeddings WHERE vec_id < 3)
            SELECT * FROM mmr_rerank('embeddings', 'q', 3, 10)
            ORDER BY query_id, pos
        """, scope, spark=spark).show()
        fq.execute("""
            WITH scored AS (SELECT lang = 'en' AS y,
                                   CAST(n_chars AS DOUBLE) AS s
                            FROM documents)
            SELECT * FROM auc_score('scored', 'y', 's')
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT ts_rewrite('a & b'::tsquery, 'a'::tsquery,
                              'foo|bar'::tsquery) AS rewritten,
                   to_tsvector('the foo and bar') @@
                   ts_rewrite('a'::tsquery, 'a'::tsquery,
                              'foo & bar'::tsquery) AS matches
        """, scope, spark=spark).show(truncate=False)
        fq.execute("""
            SELECT * FROM event_transitions('events', 5)
        """, scope, spark=spark).show()
        fq.execute("""
            WITH old AS (SELECT * FROM documents WHERE doc_id < 300),
                 new AS (SELECT doc_id,
                                CASE WHEN doc_id % 7 = 0
                                     THEN concat(text, ' v2') ELSE text
                                END AS text
                         FROM documents WHERE doc_id >= 150)
            SELECT status, count(*) AS n
            FROM snapshot_diff('old', 'new')
            GROUP BY status ORDER BY status
        """, scope, spark=spark).show()
        fq.execute("""
            WITH scored AS (SELECT lang = 'en' AS y,
                                   CAST(n_chars AS DOUBLE) / 3000 AS s
                            FROM documents)
            SELECT * FROM confusion_stats('scored', 'y', 's', 0.5)
        """, scope, spark=spark).show()

        # --- round 9: hybrid retrieval fusion + graded eval + MOSS dedup --
        scope["qset"] = spark.createDataFrame(
            [(0, "spark shuffle join")], "query_id long, query string")
        scope["qvec"] = scope["embeddings"].filter("vec_id = 0")
        fq.execute("""
            WITH sparse AS (SELECT * FROM bm25_topk('documents', 'qset', 10)),
                 dense AS (SELECT query_id, neighbor_id AS doc_id, rank
                           FROM cosine_topk('embeddings', 'qvec', 10))
            SELECT * FROM rrf_fuse('sparse', 'dense', 60, 5) ORDER BY rank
        """, scope, spark=spark).show()
        fq.execute("""
            WITH res AS (SELECT * FROM cosine_topk('embeddings', 'qvec', 5)),
                 rels AS (SELECT query_id, neighbor_id,
                                 CASE WHEN rank <= 2 THEN 3 ELSE 1 END AS rel
                          FROM res)
            SELECT * FROM ndcg_at_k('res', 'rels', 5)
        """, scope, spark=spark).show()
        fq.execute("""
            SELECT w.id1, w.id2, w.n_shared, c.containment
            FROM winnow_pairs('documents', 3, 4, 3, 20) w
            LEFT JOIN containment_pairs('documents', 0.8) c
              ON w.id1 = c.id1 AND w.id2 = c.id2
            ORDER BY w.n_shared DESC LIMIT 5
        """, scope, spark=spark).show()
        _round9_dialect(spark, scope)
        _round10(spark, scope)


def _round10(spark, scope):
    import framequery_spark as fq
    from framequery_spark.operators.dedup import near_dup_config_sweep

    # unified near-dup façade: two methods judged against ONE exact truth
    near_dup_config_sweep(scope["documents"], {
        "containment_08": ("containment", {"k": 3, "threshold": 0.8}),
        "winnow_w4": ("winnow", {"k": 3, "window": 4, "min_shared": 3,
                                 "max_doc_freq": 20}),
    }).show()

    # pg array-type casts + rank-normalization bitmask + pg grand-total
    # row over empty input (raw Spark emits zero rows there)
    fq.execute("""
        SELECT ('{10,20,30}'::int[])[2] AS second,
               '{a,"b,c",NULL}'::text[] AS arr,
               ts_rank(to_tsvector('a b c a'), to_tsquery('a | c'), 2|8)
                   AS rank_norm
    """, scope, spark=spark).show(truncate=False)
    fq.execute("""
        SELECT r_name, grouping(r_name) AS g, count(*) AS n
        FROM region WHERE r_regionkey > 99 GROUP BY ROLLUP (r_name)
    """, scope, spark=spark).show()


def _round9_dialect(spark, scope):
    import framequery_spark as fq

    # jsonb operator family + SIMILAR substring + normalize
    fq.execute("""
        SELECT '{"a":1,"b":{"c":2}}'::jsonb ? 'a' AS has_a,
               '{"a":1,"b":2}'::jsonb @> '{"a":1}'::jsonb AS contains,
               '{"a":1,"b":2}'::jsonb - 'a' AS minus_a,
               '{"a":{"b":[1,2,3]}}'::jsonb #- '{a,b,1}' AS del_path,
               '{"a":1}'::jsonb || '{"b":2}'::jsonb AS merged,
               substring('abcdef' SIMILAR '%#"cd#"%' ESCAPE '#') AS sim,
               date_part('epoch', timestamp '2024-01-01') AS epoch,
               normalize(chr(101) || chr(769)) = chr(233) AS nfc
    """, scope, spark=spark).show(truncate=False)


if __name__ == "__main__":
    main()
