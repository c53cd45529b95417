"""Operator unit tests: python-reference cross-checks for the LLM-pipeline
operators (the DuckDB cross-check lives in test_conformance.py)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from framequery_spark.operators import dedup as DD
from framequery_spark.operators import multimodal as MM
from framequery_spark.operators import similarity as SIM
from framequery_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark, tpch_scope):
    return tpch_scope["documents"]


@pytest.fixture(scope="module")
def emb(spark, tpch_scope):
    return tpch_scope["embeddings"]


def _py_shingles(text, k=3):
    ws = text.strip().split()
    return {" ".join(ws[i:i + k]) for i in range(max(len(ws) - k + 1, 0))}


def test_shingles_match_python(spark, docs):
    rows = (docs.limit(20)
            .select("doc_id", "text",
                    DD.shingles(F.col("text")).alias("sh")).collect())
    for r in rows:
        assert set(r.sh) == _py_shingles(r.text), r.doc_id


def test_jaccard_pairs_match_python(spark, docs):
    sample = docs.filter(F.col("doc_id") < 100)
    got = {(r.id1, r.id2): r.jaccard
           for r in DD.jaccard_pairs(sample, threshold=0.5).collect()}
    texts = {r.doc_id: r.text for r in sample.collect()}
    sh = {d: _py_shingles(t) for d, t in texts.items()}
    ids = sorted(sh)
    expect = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            inter = len(sh[d1] & sh[d2])
            union = len(sh[d1] | sh[d2])
            if union and inter / union >= 0.5:
                expect[(d1, d2)] = round(inter / union, 4)
    assert got == expect


def test_minhash_has_full_recall_here(spark, docs):
    exact = {(r.id1, r.id2)
             for r in DD.jaccard_pairs(docs, threshold=0.7).collect()}
    lsh = {(r.id1, r.id2)
           for r in DD.minhash_lsh_pairs(docs, threshold=0.7).collect()}
    assert lsh == exact


def test_simhash_identical_distance_zero(spark, docs):
    two = docs.limit(1).select("doc_id", "text")
    both = two.union(two.withColumn("doc_id", F.col("doc_id") + 1000))
    pairs = DD.simhash_near_pairs(both, max_hamming=0).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 0


def test_simhash_md5_variant_matches_python(spark, docs):
    # md5_hash60 path: recompute signatures in pure python and check the
    # engine's banded pair set equals exact all-pairs hamming <= 8
    import hashlib

    sub = docs.limit(60).select("doc_id", "text")
    sigs = {}
    for r in sub.collect():
        ws = r.text.strip().split()
        sh = list(dict.fromkeys(
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)))
        if not sh:
            continue
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh]
        sig = 0
        for bit in range(60):
            ones = sum((h >> bit) & 1 for h in hs)
            if ones * 2 >= len(hs):
                sig |= 1 << bit
        sigs[r.doc_id] = sig
    expect = {(a, b, bin(sigs[a] ^ sigs[b]).count("1"))
              for a in sigs for b in sigs
              if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 8}
    got = {(r.id1, r.id2, r.hamming) for r in
           DD.simhash_near_pairs(sub, max_hamming=8, sig_bits=60,
                                 hash_fn=DD.md5_hash60).collect()}
    assert got == expect


def test_lsh_ann_exhaustive_equals_exact(spark, emb):
    # n_bits=0: one all-zero hyperplane -> single bucket -> candidates are
    # all pairs -> re-rank must reproduce brute-force top-k exactly
    queries = emb.filter(F.col("vec_id") < 5)
    exact = [(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
             SIM.cosine_topk(emb, queries, k=5)
             .orderBy("query_id", "rank").collect()]
    full = [(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
            SIM.lsh_ann_topk(emb, queries, k=5, n_bits=0, n_tables=1)
            .orderBy("query_id", "rank").collect()]
    assert full == exact


def test_exact_dedup_keeps_min_id(spark, docs):
    deduped = DD.exact_dedup(docs, ["lang", "source"])
    keep = deduped.groupBy("lang", "source").count().collect()
    assert all(r["count"] == 1 for r in keep)
    mins = {(r.lang, r.source): r.m for r in
            docs.groupBy("lang", "source").agg(F.min("doc_id").alias("m")).collect()}
    for r in deduped.collect():
        assert r.doc_id == mins[(r.lang, r.source)]


def test_cosine_topk_matches_numpy(spark, emb):
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    got = [(r.query_id, r.neighbor_id, r.rank) for r in
           SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=4)
           .orderBy("query_id", "rank").collect()]
    expect = []
    for q in range(3):
        qv = vecs[q]
        sims = []
        for nid, v in vecs.items():
            if nid == q:
                continue
            c = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            sims.append((round(c, 6), nid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, nid) in enumerate(sims[:4], 1):
            expect.append((q, nid, rank))
    assert got == expect


def test_ann_is_subset_with_reasonable_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              SIM.lsh_ann_topk(emb, queries, k=5).collect()}
    # every ANN neighbor must be a real vector pair; recall is data-dependent
    # (testdata vectors are weakly similar) — just require non-trivial overlap
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.05, f"recall collapsed: {recall}"


def test_text_stats_reference_values(spark, docs):
    row = (TX.text_stats(docs.filter(F.col("doc_id") == 0))).collect()[0]
    text = docs.filter(F.col("doc_id") == 0).collect()[0].text
    assert row.n_chars == len(text)
    assert row.n_tokens == len(text.split())
    normalized = " ".join(text.split()).lower()
    assert row.fingerprint == hashlib.md5(normalized.encode()).hexdigest()


def test_multimodal_decode_deterministic(spark, docs):
    blobs = MM.attach_blob(docs.limit(5))
    out = {r.doc_id: r for r in MM.decode_image(blobs).collect()}
    texts = {r.doc_id: r.text for r in docs.limit(5).collect()}
    for doc_id, text in texts.items():
        d = MM._fake_decode(text.encode())
        assert out[doc_id].width == d["width"]
        assert out[doc_id].height == d["height"]
        assert len(out[doc_id].feature) == 8


def test_blob_metadata_sha(spark, docs):
    blobs = MM.attach_blob(docs.limit(3))
    for r in MM.blob_metadata(blobs).select("doc_id", "blob_meta").collect():
        pass  # schema materializes; value parity is covered by conformance
    meta = MM.blob_metadata(blobs).select("doc_id", "blob_meta.sha256").collect()
    texts = {r.doc_id: r.text for r in docs.limit(3).collect()}
    for r in meta:
        assert r.sha256 == hashlib.sha256(texts[r.doc_id].encode()).hexdigest()


def test_streaming_matches_batch(spark, tpch_scope):
    from framequery_spark.streaming.stream import run_stream_to_df
    from tests.conftest import SF_DIR

    stream_out = run_stream_to_df(spark, f"{SF_DIR}/events.parquet")
    batch = (tpch_scope["events"]
             .groupBy("event_type", F.date_trunc("hour", "ts").alias("window_start"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
    assert sorted(map(tuple, stream_out.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_to_partitioned_parquet_sink(spark, tpch_scope, tmp_path):
    import os

    from framequery_spark.streaming.stream import stream_events_to_parquet
    from tests.conftest import SF_DIR

    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "ckpt")
    written = stream_events_to_parquet(
        spark, f"{SF_DIR}/events.parquet", out, ckpt)
    batch = tpch_scope["events"]
    assert written.count() == batch.count()
    # hive-partitioned layout by event_type
    parts = [d for d in os.listdir(out) if d.startswith("event_type=")]
    assert len(parts) == batch.select("event_type").distinct().count()
    # idempotent restart: rerunning with the same checkpoint adds nothing
    again = stream_events_to_parquet(
        spark, f"{SF_DIR}/events.parquet", out, ckpt)
    assert again.count() == batch.count()


# ---------------------------------------------------------------- asof/range


def _mk_events(spark):
    import datetime as dt

    rows = [
        # (event_id, user_id, ts-second)
        (1, 1, 10), (2, 1, 20), (3, 1, 20), (4, 1, 30),  # rights for user 1
    ]
    right = spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 0, 0, s)) for i, u, s in rows],
        "click_id long, user_id long, click_ts timestamp")
    left = spark.createDataFrame(
        [(100, 1, dt.datetime(2024, 1, 1, 0, 0, 20)),   # ties with clicks 2,3
         (101, 1, dt.datetime(2024, 1, 1, 0, 0, 25)),
         (102, 2, dt.datetime(2024, 1, 1, 0, 0, 25))],  # no right rows at all
        "event_id long, user_id long, ts timestamp")
    return left, right


def test_asof_strict_excludes_equal_ts(spark):
    from framequery_spark.operators.asof import asof_join

    left, right = _mk_events(spark)
    out = {r["event_id"]: r["click_id"] for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"], strict=True,
        tiebreak="click_id").collect()}
    assert out[100] == 1          # equal-ts clicks 2,3 NOT matched
    assert out[101] in (2, 3)     # any equal-ts click is admissible...
    assert out[101] == 3          # ...tiebreak picks greatest click_id
    assert out[102] is None       # left-outer: no right rows for user 2


def test_asof_non_strict_includes_equal_ts(spark):
    from framequery_spark.operators.asof import asof_join

    left, right = _mk_events(spark)
    out = {r["event_id"]: r["click_id"] for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"], strict=False,
        tiebreak="click_id").collect()}
    assert out[100] == 3          # equal-ts click matched, greatest id wins


def test_asof_tolerance(spark):
    from framequery_spark.operators.asof import asof_join

    left, right = _mk_events(spark)
    out = {r["event_id"]: r["click_id"] for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"], strict=True,
        tolerance_seconds=4, tiebreak="click_id").collect()}
    assert out[100] is None       # nearest prior click (ts=10) is 10s away
    assert out[101] is None       # nearest prior click (ts=20) is 5s > 4s away
    out6 = {r["event_id"]: r["click_id"] for r in asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"], strict=True,
        tolerance_seconds=6, tiebreak="click_id").collect()}
    assert out6[101] == 3         # within a 6s tolerance it matches


def test_range_join_boundaries(spark):
    from framequery_spark.operators.asof import range_join

    left, right = _mk_events(spark)
    got = {(r["event_id"], r["click_id"]) for r in range_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="click_ts",
        lower_seconds=0, upper_seconds=10).collect()}
    # event 100 @20: window [10, 20) -> click 1 (ts=10) only
    # event 101 @25: window [15, 25) -> clicks 2,3 (ts=20)
    assert got == {(100, 1), (101, 2), (101, 3)}


def test_doc_chunks_exact_boundaries(spark):
    from framequery_spark.operators.text import doc_chunks

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, ""), (4, None)],
        "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk"], r["chunk_len"])
            for r in doc_chunks(df, size=4, overlap=1).collect()}
    # stride 3: starts 0,3,6,9 for len 10
    assert rows[(1, 0)] == ("abcd", 4)
    assert rows[(1, 1)] == ("defg", 4)
    assert rows[(1, 2)] == ("ghij", 4)
    assert rows[(1, 3)] == ("j", 1)
    assert rows[(2, 0)] == ("abc", 3)
    assert not any(d in (3, 4) for d, _ in rows)  # empty/null -> no chunks


def test_ivf_recall_vs_exact(spark, emb):
    from framequery_spark.operators.similarity import cosine_topk, ivf_topk

    queries = emb.filter(F.col("vec_id") < 30)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, queries, k=5,
                                n_centroids=16, n_probe=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.3f} too low"


def test_levenshtein_pairs_symmetric_and_bounded(spark, docs):
    got = DD.levenshtein_pairs(docs, max_distance=8).collect()
    assert all(r["id_a"] < r["id_b"] for r in got)
    assert all(0 <= r["distance"] <= 8 for r in got)
    assert len(got) > 0  # the generator plants near-duplicates


# ---------------------------------------------------------------- sampling

def test_hash_split_is_deterministic_and_partitioning_invariant(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    orders = tpch_scope["orders"]
    a = SA.hash_split(orders, "o_orderkey").groupBy("split").count()
    b = SA.hash_split(orders.repartition(13), "o_orderkey") \
        .groupBy("split").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hash_split_matches_python_md5(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    rows = SA.hash_split(tpch_scope["orders"], "o_orderkey") \
        .select("o_orderkey", "split").limit(200).collect()
    for r in rows:
        hx = hashlib.md5(f"{r.o_orderkey}split".encode()).hexdigest()[:8]
        expected = ("train" if hx < SA.fraction_threshold_hex(0.8)
                    else "val" if hx < SA.fraction_threshold_hex(0.9)
                    else "test")
        assert r.split == expected


def test_hash_split_fractions_roughly_hold(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    counts = dict(SA.hash_split(tpch_scope["orders"], "o_orderkey")
                  .groupBy("split").count().collect())
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.05
    assert abs(counts["val"] / total - 0.1) < 0.04


def test_deterministic_sample_groups_keys(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    li = tpch_scope["lineitem"]
    kept = SA.deterministic_sample(li, "l_orderkey", 0.3)
    # every kept order's full lineitem set is kept: per-key row counts match
    orig = dict(li.groupBy("l_orderkey").count().collect())
    for k, n in kept.groupBy("l_orderkey").count().limit(50).collect():
        assert orig[k] == n


def test_deterministic_sample_predicate_is_narrow(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    plan = SA.deterministic_sample(
        tpch_scope["lineitem"], "l_orderkey", 0.3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle


def test_stratified_split_exact_quota_per_stratum(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    docs = tpch_scope["documents"]
    out = SA.stratified_split(docs, ["lang", "source"], "doc_id")
    per = {(r.lang, r.source): dict() for r in
           out.select("lang", "source").distinct().collect()}
    for r in out.groupBy("lang", "source", "split").count().collect():
        per[(r.lang, r.source)][r.split] = r["count"]
    for stratum, counts in per.items():
        n = sum(counts.values())
        t_train = math.floor(n * 0.8 + 0.5)
        t_val = math.floor(n * 0.9 + 0.5) - t_train
        assert counts.get("train", 0) == t_train, (stratum, counts)
        assert counts.get("val", 0) == t_val, (stratum, counts)
        assert counts.get("test", 0) == n - t_train - t_val, (stratum, counts)


def test_stratified_split_deterministic_and_key_grouped(spark, tpch_scope):
    from pyspark.sql import functions as F

    from framequery_spark.operators import sampling as SA

    docs = tpch_scope["documents"]
    a = SA.stratified_split(docs, ["lang"], "doc_id") \
        .select("doc_id", "split").collect()
    b = SA.stratified_split(docs.repartition(17), ["lang"], "doc_id") \
        .select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # rows sharing a key (doc chunks) always land on the same side
    chunks = docs.select("lang", "doc_id", F.explode(F.array(
        F.lit(0), F.lit(1))).alias("part"))
    sides = (SA.stratified_split(chunks, ["lang"], "doc_id")
             .groupBy("doc_id")
             .agg(F.countDistinct("split").alias("k")))
    assert sides.filter("k > 1").count() == 0


def test_stratified_split_validates_args(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    docs = tpch_scope["documents"]
    with pytest.raises(ValueError, match="at least two labels"):
        SA.stratified_split(docs, ["lang"], "doc_id", weights={"train": 1.0})
    with pytest.raises(ValueError, match="stratum column"):
        SA.stratified_split(docs, [], "doc_id")


def test_stratified_sample_respects_fractions(spark, tpch_scope):
    from framequery_spark.operators import sampling as SA

    docs = tpch_scope["documents"]
    out = SA.stratified_sample(docs, "lang", {"en": 0.5}, seed=7)
    assert set(r.lang for r in out.select("lang").distinct().collect()) <= {"en"}
    n_en = docs.filter("lang = 'en'").count()
    assert 0.3 * n_en < out.count() < 0.7 * n_en


# ------------------------------------------------------------- vocab / tfidf

def test_vocab_topk_matches_python(spark, docs):
    from collections import Counter

    from framequery_spark.operators.text import vocab_topk

    got = [(r.term, r.term_count) for r in vocab_topk(docs, "text", 20).collect()]
    c = Counter()
    for r in docs.select("text").collect():
        c.update(w for w in r.text.strip().lower().split() if w)
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expected


def test_pmi_bigrams_matches_python(spark, docs):
    from collections import Counter

    from framequery_spark.operators.text import pmi_bigrams

    got = [(r.w1, r.w2, r.c_xy, r.c_x, r.c_y, r.pmi)
           for r in pmi_bigrams(docs, min_count=3, top_k=25).collect()]
    uni, big = Counter(), Counter()
    n_big = 0
    for r in docs.select("text").collect():
        ws = [w for w in r.text.strip().lower().split() if w]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
        n_big += max(len(ws) - 1, 0)
    n_uni = sum(uni.values())
    exp = []
    for (w1, w2), c in big.items():
        if c < 3:
            continue
        pmi = round(math.log((c * n_uni * n_uni)
                             / (n_big * uni[w1] * uni[w2])), 6)
        exp.append((w1, w2, c, uni[w1], uni[w2], pmi))
    exp.sort(key=lambda t: (-t[5], t[0], t[1]))
    assert got == exp[:25]


def test_pmi_bigrams_perfect_collocation_scores_highest(spark):
    from framequery_spark.operators.text import pmi_bigrams

    # "neo tokyo" always adjacent; "the" everywhere -> low-PMI pairs
    df = spark.createDataFrame(
        [(1, "the cat saw neo tokyo and the dog"),
         (2, "neo tokyo is the place the cat likes"),
         (3, "the dog saw the cat near neo tokyo")],
        "doc_id long, text string")
    top = pmi_bigrams(df, min_count=2, top_k=3).collect()
    assert (top[0].w1, top[0].w2) == ("neo", "tokyo")


def test_oov_rate_with_explicit_vocab(spark):
    from framequery_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "qq zz the"), (3, ""), (4, None)],
        "doc_id long, text string")
    vocab = spark.createDataFrame([("the",), ("cat",), ("sat",)],
                                  ["term"])
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in oov_rate(docs, vocab=vocab).collect()}
    assert got[1] == (3, 0, 0.0)
    assert got[2] == (3, 2, round(2 / 3, 6))
    assert got[3] == (0, 0, None)
    assert got[4] == (0, 0, None)


def test_oov_rate_default_vocab_covers_top_terms(spark, docs):
    from framequery_spark.operators.text import oov_rate, vocab_topk

    out = oov_rate(docs, vocab_size=10)
    # a doc made ONLY of top-10 terms must have rate 0; total oov must
    # equal total tokens minus in-vocab occurrences (python cross-check)
    from collections import Counter

    c = Counter()
    for r in docs.select("text").collect():
        c.update(w for w in r.text.strip().lower().split() if w)
    top = {t for t, _ in sorted(c.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:10]}
    exp_oov = sum(n for t, n in c.items() if t not in top)
    got = out.agg(F.sum("n_oov")).collect()[0][0]
    assert got == exp_oov


def test_pmi_bigrams_validates_min_count(spark, docs):
    from framequery_spark.operators.text import pmi_bigrams

    with pytest.raises(ValueError, match="min_count"):
        pmi_bigrams(docs, min_count=0)


def test_tf_idf_matches_python(spark, docs):
    import math
    from collections import Counter

    from framequery_spark.operators.text import tf_idf

    sample = docs.filter("doc_id < 20")
    n_docs = sample.count()
    got = {(r.doc_id, r.term): (r.tf, r.df_t, r.tfidf)
           for r in tf_idf(sample, "text", "doc_id").collect()}
    texts = {r.doc_id: r.text for r in sample.collect()}
    dft = Counter()
    tfs = {}
    for d, t in texts.items():
        tf = Counter(w for w in t.strip().lower().split() if w)
        tfs[d] = tf
        dft.update(tf.keys())
    for d, tf in tfs.items():
        for w, n in tf.items():
            etf, edf, escore = got[(d, w)]
            assert (etf, edf) == (n, dft[w])
            assert abs(escore - round(n * math.log(n_docs / dft[w]), 6)) < 1e-9


# ---------------------------------------------------------------- packing

def test_pack_bins_respects_order_and_budget(spark, docs):
    from framequery_spark.operators.packing import pack_bins
    from framequery_spark.operators.text import token_count

    d = docs.withColumn("n_tokens", token_count(F.col("text")))
    out = pack_bins(d, "n_tokens", 1000, "lang", ("doc_id",)) \
        .select("lang", "doc_id", "n_tokens", "bin_id").collect()
    by_lang = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        # bin ids are non-decreasing along doc order, and each bin's
        # preceding-sum start lies in [bin*B, (bin+1)*B)
        cum = 0
        last_bin = 0
        for r in rows:
            assert r.bin_id == cum // 1000
            assert r.bin_id >= last_bin
            last_bin = r.bin_id
            cum += r.n_tokens


def test_pack_bins_single_oversized_row_gets_own_bin(spark):
    import pandas as pd

    from framequery_spark.operators.packing import pack_bins

    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3], "n_tokens": [10, 5000, 10]}))
    rows = {r.doc_id: r.bin_id for r in
            pack_bins(df, "n_tokens", 100, None, ("doc_id",)).collect()}
    assert rows[1] == 0 and rows[2] == 0 and rows[3] == 50


def test_deterministic_shuffle_is_stable_permutation(spark, docs):
    from framequery_spark.operators.packing import deterministic_shuffle

    a = [r.doc_id for r in deterministic_shuffle(docs, "doc_id")
         .select("doc_id").collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs.repartition(7), "doc_id")
         .select("doc_id").collect()]
    assert a == b                      # partitioning-invariant
    assert sorted(a) != a              # actually shuffled
    assert len(set(a)) == len(a)       # a permutation
    c = [r.doc_id for r in deterministic_shuffle(docs, "doc_id", salt="epoch2")
         .select("doc_id").collect()]
    assert a != c                      # new salt, new permutation


def test_ngram_counts_match_python(spark, docs):
    from collections import Counter

    from framequery_spark.operators.text import ngram_counts

    got = [(r.ngram, r.ngram_count)
           for r in ngram_counts(docs, "text", 2, 15).collect()]
    c = Counter()
    for r in docs.select("text").collect():
        ws = r.text.strip().lower().split()
        c.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    assert got == sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]


def test_trigram_counts_short_docs_excluded(spark):
    import pandas as pd

    from framequery_spark.operators.text import ngram_counts

    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["a b c d", "x y", "", "one"]}))
    got = dict((r.ngram, r.ngram_count)
               for r in ngram_counts(df, "text", 3, 10).collect())
    assert got == {"a b c": 1, "b c d": 1}


# ------------------------------------------------------------- pii / repetition


def test_scrub_pii_kinds_and_order(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["mail a.b-c@x-mail.co.uk now",
                 "ssn 123-45-6789 ip 10.0.0.255 phone 555-123-4567",
                 "clean text, no pii at all"],
    }))
    out = {r["doc_id"]: (r["clean_text"], r["pii_found"])
           for r in TX.pii_scrub(df).collect()}
    assert out[1] == ("mail <email> now", True)
    assert out[2] == ("ssn <ssn> ip <ipv4> phone <phone>", True)
    assert out[3] == ("clean text, no pii at all", False)


def test_repetition_stats_edges(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a a",                 # one token repeated
                 "x\nx\ny\n\n",             # dup lines (blank dropped)
                 "all words differ here"],
    }))
    out = {r["doc_id"]: r.asDict() for r in TX.repetition_stats(df).collect()}
    assert out[1]["dup_token_ratio"] == 0.75 and out[1]["top_token_ratio"] == 1.0
    assert out[2]["dup_line_ratio"] == round(1 - 2 / 3, 4)
    assert out[3]["dup_token_ratio"] == 0.0 and out[3]["top_token_ratio"] == 0.25


def test_scrub_pii_idempotent_and_ratios_bounded(spark):
    import pandas as pd

    texts = [
        "a@b.co x@y.io back-to-back a@b.co",   # multiple + repeated
        "edge@case.com",                        # entire string is PII
        "unicode ü emails é a@b.de ok",         # non-ascii around PII
        "1.2.3.4 5.6.7.8",                      # adjacent ipv4s
        "",                                     # empty
    ]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    once = TX.pii_scrub(df, out_col="c1")
    twice = once.withColumn("c2", TX.scrub_pii(F.col("c1")))
    for r in twice.collect():
        assert r["c1"] == r["c2"], r  # idempotent: placeholders never re-match
    stats = TX.repetition_stats(df.filter(F.col("text") != ""))
    for r in stats.collect():
        for c in ("dup_line_ratio", "dup_token_ratio", "top_token_ratio"):
            assert 0.0 <= r[c] <= 1.0, r


def test_resize_image_stub_plumbing(spark, docs):
    out = MM.resize_image(MM.attach_blob(docs.limit(4)), target=32).collect()
    assert len(out) == 4
    for r in out:
        assert r.width == 32 and r.height == 32
        assert len(r.resized) == 32 * 32 // 64


# ------------------------------------------------------------------- skew


def test_skew_safe_count_distinct_matches_exact(spark, tpch_scope):
    from framequery_spark.operators.skew import skew_safe_count_distinct

    ev = tpch_scope["events"]
    got = {(r.event_type,): r.n_distinct for r in
           skew_safe_count_distinct(ev, ["event_type"], "user_id").collect()}
    want = {(r.event_type,): r.n for r in
            ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert got == want


def test_skew_safe_count_distinct_excludes_nulls(spark):
    # SQL COUNT(DISTINCT col) excludes NULLs; the distinct() step keeps the
    # NULL row, so the final count must count col, not *
    from framequery_spark.operators.skew import skew_safe_count_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("a", 2), ("b", None)],
        "k string, v int")
    got = {r.k: r.n_distinct for r in
           skew_safe_count_distinct(df, ["k"], "v").collect()}
    assert got == {"a": 2, "b": 0}


def test_salted_join_matches_plain_join(spark, tpch_scope):
    from framequery_spark.operators.skew import salted_join

    o = tpch_scope["orders"].select("o_orderkey", "o_custkey")
    c = tpch_scope["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = sorted(map(tuple, o.join(c, "o_custkey").collect()))
    salted = sorted(map(tuple, salted_join(o, c, ["o_custkey"], 8).collect()))
    assert salted == plain
    # left join keeps unmatched left rows exactly once
    c2 = c.filter(F.col("o_custkey") < 10)
    plain_l = sorted(map(tuple, o.join(c2, "o_custkey", "left").collect()))
    salted_l = sorted(map(tuple,
                          salted_join(o, c2, ["o_custkey"], 8, "left").collect()))
    assert salted_l == plain_l


def test_decode_payload_upgrades_when_pil_importable(monkeypatch):
    # auto-upgrade branch: a mocked Pillow module drives the real-decode
    # path without image libs in the container
    from framequery_spark.operators import multimodal as mm

    class FakeImg:
        size = (320, 200)

        def load(self):
            return None

        def getbands(self):
            return ("R", "G", "B")

        def convert(self, mode):
            return self

        def histogram(self):
            return [1] * 256

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImg()

    monkeypatch.setattr(mm, "_PILImage", FakePIL)
    out = mm._decode_payload(b"anything")
    assert (out["width"], out["height"], out["n_channels"]) == (320, 200, 3)
    assert len(out["feature"]) == 8
    assert abs(sum(out["feature"]) - 1.0) < 1e-9


def test_decode_payload_falls_back_on_decode_failure(monkeypatch):
    # non-image payloads (or absent Pillow) must hit the deterministic stub,
    # never fail the task
    from framequery_spark.operators import multimodal as mm

    class RaisingPIL:
        @staticmethod
        def open(buf):
            raise OSError("cannot identify image file")

    monkeypatch.setattr(mm, "_PILImage", RaisingPIL)
    payload = b"plain text payload"
    assert mm._decode_payload(payload) == mm._fake_decode(payload)
    monkeypatch.setattr(mm, "_PILImage", None)
    assert mm._decode_payload(payload) == mm._fake_decode(payload)


def _write_png(width, height, rgb_rows):
    """A real, valid PNG written with pure-python zlib/struct (no PIL):
    8-bit RGB, filter byte 0 per scanline. Lets the stub-vs-real decoder
    branch selection be covered by CONTENT, not only by mocking."""
    import struct
    import zlib

    def chunk(tag, data):
        payload = tag + data
        return (struct.pack(">I", len(data)) + payload
                + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in rgb_rows)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_decode_image_real_png_content(spark):
    # a genuine 2x2 PNG through the full Spark operator: when Pillow is
    # importable the REAL branch must report the true dimensions; without
    # it the payload deterministically takes the stub
    from framequery_spark.operators import multimodal as mm

    png = _write_png(2, 2, [[255, 0, 0, 0, 255, 0], [0, 0, 255, 10, 20, 30]])
    df = spark.createDataFrame([(1, bytearray(png))],
                               "doc_id long, blob binary")
    row = mm.decode_image(df).collect()[0]
    if mm._PILImage is not None:
        assert (row.width, row.height, row.n_channels) == (2, 2, 3)
        assert abs(sum(row.feature) - 1.0) < 1e-6  # normalized histogram
    else:
        d = mm._fake_decode(png)
        assert (row.width, row.height) == (d["width"], d["height"])
    assert len(row.feature) == 8


def test_pil_decode_real_png_when_available():
    # direct real-branch coverage with content (skipped in containers
    # without Pillow — the operator-level test above covers the stub there)
    from framequery_spark.operators import multimodal as mm

    if mm._PILImage is None:
        pytest.skip("Pillow not installed in this container")
    png = _write_png(3, 1, [[0, 0, 0, 128, 128, 128, 255, 255, 255]])
    out = mm._pil_decode(png)
    assert (out["width"], out["height"], out["n_channels"]) == (3, 1, 3)


def test_train_ivf_sample_cap_enforced(spark, emb):
    with pytest.raises(ValueError, match="driver-collect cap"):
        SIM.train_ivf_centroids(emb, train_sample=10_000_000)


# ------------------------------------------------------- connected components


def _py_components(edges):
    """Union-find reference; components labeled by their minimum node."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return {n: min(groups[find(n)]) for n in parent}


def test_connected_components_matches_union_find(spark):
    import random

    from framequery_spark.operators.graph import connected_components

    rng = random.Random(1234)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(400)]
    out = connected_components(spark.createDataFrame(edges, ["src", "dst"]))
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == _py_components(edges)


def test_connected_components_chain_converges_logarithmically(spark):
    # a 256-node chain has diameter 255; naive min-propagation needs ~255
    # rounds, large-star/small-star must finish in O(log n)
    from framequery_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(255)]
    # driver_finish_threshold=0 forces the pure distributed loop — the
    # hybrid finish would otherwise satisfy the bound trivially
    out, rounds = connected_components(
        spark.createDataFrame(chain, ["src", "dst"]), return_stats=True,
        driver_finish_threshold=0)
    assert 0 < rounds <= 12, rounds
    assert out.where(F.col("component") != 0).count() == 0


def test_connected_components_handles_dirty_input(spark):
    # duplicates, reversed edges, self-loops; edges with a NULL endpoint are
    # invalid and dropped entirely (neither endpoint becomes a node)
    from framequery_spark.operators.graph import connected_components

    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (None, 4), (5, None), (6, 7)]
    out = connected_components(
        spark.createDataFrame(edges, "src: int, dst: int"))
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 6: 6, 7: 6}


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    from framequery_spark.operators.similarity import mmr_rerank

    # query e1; candidates: two near-identical vectors close to the
    # query and one near-orthogonal to BOTH. Plain top-2 = the two
    # dupes; MMR must pick one dupe then the diverse vector (the dupe's
    # ~1.0 redundancy penalty cancels its relevance at lambda = 0.5).
    rows = [(0, [1.0, 0.0, 0.0]),          # query
            (1, [0.995, 0.1, 0.0]),        # dupe A
            (2, [0.995, 0.0995, 0.001]),   # dupe B (sim(A,B) ~ 1)
            (3, [0.1, 0.0, 0.995])]        # diverse
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_rerank(df, df.filter("vec_id = 0"), k=2, pool=3,
                     mmr_lambda=0.5)
    got = [(r.pos, r.neighbor_id) for r in out.orderBy("pos").collect()]
    assert got[0][1] in (1, 2)
    assert got[1] == (2, 3), got


def test_mmr_rerank_matches_python_greedy(spark, tpch_scope):
    import math

    from framequery_spark.operators.similarity import mmr_rerank

    emb = tpch_scope["embeddings"]
    got = sorted(tuple(r) for r in mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 3), k=3, pool=8).collect())

    data = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = sum(float(x) * float(x) for x in a)
        nb = sum(float(y) * float(y) for y in b)
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    # score arithmetic is DECIMAL in the operator (0.7 * rel lands exactly
    # on .xxxxxx5 boundaries where float rounding is ambiguous) — mirror
    # with Decimal HALF_UP
    from decimal import ROUND_HALF_UP, Decimal

    def dscore(rel, mx=None):
        r = Decimal("0.7") * Decimal(f"{rel:.6f}")
        if mx is not None:
            r -= Decimal("0.3") * Decimal(f"{mx:.6f}")
        return float(r.quantize(Decimal("0.000001"),
                                rounding=ROUND_HALF_UP))

    exp = []
    for q in range(3):
        pool = sorted(((cos(data[q], data[c]), c)
                       for c in data if c != q),
                      key=lambda t: (-t[0], t[1]))[:8]
        cand = [(c, s) for s, c in pool]
        sel = [(1, cand[0][0], cand[0][1], dscore(cand[0][1]))]
        chosen = {cand[0][0]}
        for pos in (2, 3):
            best = None
            for c, rel in cand:
                if c in chosen:
                    continue
                mx = max(cos(data[c], data[s]) for _, s, _, _ in sel)
                sc = dscore(rel, mx)
                if best is None or (-sc, c) < (-best[0], best[1]):
                    best = (sc, c, rel)
            sel.append((pos, best[1], best[2], best[0]))
            chosen.add(best[1])
        exp.extend((q, pos, c, rel, sc) for pos, c, rel, sc in sel)
    assert got == sorted(exp)


def test_mmr_rerank_validates_args(spark, tpch_scope):
    from framequery_spark.operators.similarity import mmr_rerank

    emb = tpch_scope["embeddings"]
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(emb, q, k=0)
    with pytest.raises(ValueError, match="pool"):
        mmr_rerank(emb, q, k=5, pool=3)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(emb, q, mmr_lambda=1.5)


def test_pagerank_star_center_ranks_highest_and_mass_conserved(spark):
    from framequery_spark.operators.graph import pagerank

    # symmetric 5-spoke star: center 0
    und = [(0, i) for i in range(1, 6)]
    edges = spark.createDataFrame(und + [(b, a) for a, b in und],
                                  ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(edges, iterations=4).collect()}
    assert got[0] == max(got.values())
    assert len({got[i] for i in range(1, 6)}) == 1  # spokes symmetric
    # symmetric graph has no dangling nodes: total mass stays 1
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_matches_python_recurrence(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from framequery_spark.operators.graph import pagerank

    edges = [(1, 2, 3.0), (2, 3, 1.0), (3, 1, 2.0), (1, 3, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.rank
           for r in pagerank(df, weight="w", iterations=3).collect()}
    nodes = [1, 2, 3]
    deg = {1: 4.0, 2: 1.0, 3: 2.0}
    p = {v: 1.0 / 3 for v in nodes}
    for _ in range(3):
        sums = {}
        for s, d, w in edges:
            c = Decimal(0.85 * p[s] * w / deg[s]).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP)
            sums[d] = sums.get(d, Decimal(0)) + c
        p = {v: 0.15 / 3 + float(sums.get(v, Decimal(0))) for v in nodes}
    assert got == p


def test_pagerank_validates_args(spark):
    from framequery_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)


def test_textrank_keywords_partitioning_invariant(spark, docs):
    from framequery_spark.operators.graph import textrank_keywords

    a = [tuple(r) for r in textrank_keywords(docs, top_k=10).collect()]
    b = [tuple(r) for r in
         textrank_keywords(docs.repartition(17), top_k=10).collect()]
    assert a == b
    assert len(a) == 10


def test_connected_components_string_ids(spark):
    from framequery_spark.operators.graph import connected_components

    out = connected_components(
        spark.createDataFrame([("b", "c"), ("a", "b"), ("x", "y")],
                              ["src", "dst"]))
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_iteration_cap_raises(spark):
    from framequery_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(64)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(spark.createDataFrame(chain, ["src", "dst"]),
                             max_iterations=1, driver_finish_threshold=0)


def test_connected_components_hybrid_equals_distributed(spark):
    # the bounded driver-side union-find finish must be result-identical to
    # the pure distributed star loop
    import random

    from framequery_spark.operators.graph import connected_components

    rng = random.Random(77)
    edges = spark.createDataFrame(
        [(rng.randrange(300), rng.randrange(300)) for _ in range(350)],
        ["src", "dst"])
    hybrid = {(r.node, r.component) for r in
              connected_components(edges).collect()}
    dist = {(r.node, r.component) for r in
            connected_components(edges,
                                 driver_finish_threshold=0).collect()}
    assert hybrid == dist and hybrid


def test_minhash_dup_clusters_groups_near_dups(spark):
    # two fuzzy-dup families + one unique doc; clusters = transitive closure
    from framequery_spark.operators.graph import minhash_dup_clusters

    base_a = "the quick brown fox jumps over the lazy dog again and again " * 4
    base_b = "pack my box with five dozen liquor jugs for the long trip " * 4
    rows = [
        (0, base_a), (1, base_a + "extra tail"), (2, "prefix " + base_a),
        (10, base_b), (11, base_b + "slightly changed tail here"),
        (20, "completely unrelated tiny document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_dup_clusters(df, threshold=0.5, num_perm=32, bands=16)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == 10
    assert 20 not in got  # no pair -> not in the pair graph


# ------------------------------------------------------ incremental dedup


def test_minhash_pairs_against_matches_exact_jaccard(spark, docs):
    # cross-corpus LSH pairs at effectively-exhaustive parameters must equal
    # the exact word-3-gram Jaccard pairs across the parity split
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    got = sorted(
        (r["new_id"], r["corpus_id"])
        for r in DD.minhash_pairs_against(new, corpus, threshold=0.7).collect())

    # python reference over the exact shingle sets
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    sh = {d: _py_shingles(t) for d, t in texts.items()}
    expect = sorted(
        (n, c)
        for n in texts if n % 2 == 1 and sh[n]
        for c in texts if c % 2 == 0 and sh[c]
        if len(sh[n] & sh[c]) / len(sh[n] | sh[c]) >= 0.7)
    assert got == expect


def test_dedup_against_drops_exact_and_near(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    corpus = spark.createDataFrame(
        [(0, base), (1, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, base),                      # exact dup of 0
         (11, base + "small tail"),      # near dup of 0
         (12, "a genuinely different document about something else entirely")],
        ["doc_id", "text"])
    out = DD.dedup_against(new, corpus, threshold=0.5)
    assert [r["doc_id"] for r in out.collect()] == [12]

    # exact_keys-only mode: drop rows whose text already exists verbatim
    out2 = DD.dedup_against(new, corpus, exact_keys=["text"], threshold=None)
    assert sorted(r["doc_id"] for r in out2.collect()) == [11, 12]


# ----------------------------------------------------------- z-order layout


def test_zorder_tightens_all_clustered_dims(spark, tmp_path, tpch_scope):
    from framequery_spark.sources.zorder import (file_span_stats,
                                                 write_zordered)

    ev = tpch_scope["events"]
    z = write_zordered(ev, str(tmp_path / "z"), ["user_id", "value"],
                       n_files=8)
    assert z.count() == ev.count()
    spans = file_span_stats(z, ["user_id", "value"]).agg(
        F.avg("span_user_id").alias("u"), F.avg("span_value").alias("v")
    ).collect()[0]
    # 1-d sorted layout gives ~1/n_files on its key and ~1.0 on the other;
    # z-order must be materially narrow on BOTH clustered dimensions
    assert spans["u"] < 0.7, spans
    assert spans["v"] < 0.7, spans

    naive = str(tmp_path / "naive")
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(naive))
    nspans = file_span_stats(spark.read.parquet(naive),
                             ["user_id", "value"]).agg(
        F.avg("span_value").alias("v")).collect()[0]
    assert spans["v"] < 0.7 * nspans["v"], (spans["v"], nspans["v"])


def test_zorder_key_validates_budget(spark, tpch_scope):
    from framequery_spark.sources.zorder import zorder_key

    ev = tpch_scope["events"]
    with pytest.raises(ValueError, match="<= 62"):
        zorder_key(ev, ["user_id", "value"], bits=32)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(ev, [])


# --------------------------------------------------------- product quantization


def test_pq_lossless_equals_brute_force(spark, emb):
    from framequery_spark.operators import pq as PQ

    queries = emb.filter(F.col("vec_id") < 5)
    exact = [(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
             SIM.cosine_topk(emb, queries, k=5)
             .orderBy("query_id", "rank").collect()]
    # n_centroids covers every distinct subvector -> lossless codes -> the
    # whole train/encode/LUT/ADC/refine pipeline reproduces brute force
    full = [(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
            PQ.pq_topk(emb, queries, k=5, n_subvectors=8, n_centroids=20000)
            .orderBy("query_id", "rank").collect()]
    assert full == exact


def test_pq_encode_matches_numpy(spark, emb):
    import numpy as np

    from framequery_spark.operators import pq as PQ

    books = PQ.train_pq_codebooks(emb, n_subvectors=8, n_centroids=16)
    enc = {r.vec_id: (list(r.pq_code), r.pq_norm)
           for r in PQ.pq_encode(emb.filter(F.col("vec_id") < 20), books).collect()}
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.filter(F.col("vec_id") < 20).collect()}
    cbs = [np.array(b) for b in books]
    for vid, v in vecs.items():
        code, norm = enc[vid]
        norm_sq = 0.0
        for s, cb in enumerate(cbs):
            xs = v[s * 8:(s + 1) * 8]
            d = ((xs - cb) ** 2).sum(axis=1)
            assert code[s] == int(np.argmin(d)), (vid, s)
            norm_sq += (cb[code[s]] ** 2).sum()
        assert abs(norm - np.sqrt(norm_sq)) < 1e-9


def test_pq_approx_recall_reasonable(spark, emb):
    from framequery_spark.operators import pq as PQ

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in
             SIM.cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              PQ.pq_topk(emb, queries, k=5, n_centroids=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"PQ recall collapsed: {recall}"


def test_pq_validates_inputs(spark, emb):
    from framequery_spark.operators import pq as PQ

    with pytest.raises(ValueError, match="not divisible"):
        PQ.train_pq_codebooks(emb, n_subvectors=7)
    with pytest.raises(ValueError, match="driver-collect cap"):
        PQ.train_pq_codebooks(emb, train_sample=10_000_000)


def test_dedup_against_sides_may_share_ids(spark):
    # the tag joins the signature group key, so a new batch may legitimately
    # reuse corpus ids without cross-side aggregation mixing them
    base = "one two three four five six seven eight nine ten " * 3
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different words entirely here")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "unrelated new document with fresh content"), (3, base)],
        ["doc_id", "text"])
    pairs = DD.minhash_pairs_against(new, corpus, threshold=0.7)
    assert sorted((r["new_id"], r["corpus_id"])
                  for r in pairs.collect()) == [(3, 1)]
    out = DD.dedup_against(new, corpus, threshold=0.7)
    assert sorted(r["doc_id"] for r in out.collect()) == [1]


def test_bpe_token_count_matches_python(spark):
    # reference count with python's regex module semantics via re flags
    import re

    texts = ["Hello world, it's 2026!", "don't you'll we're I'm it'd",
             "naïve café №42 — em-dash… 3.14", "  spaced   out\ttabs\n", ""]
    # python re: \p{L}/\p{N} unsupported — translate to unicode-aware classes
    pat = (r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+"
           r"| ?[^\s\w]+| ?_+|\s+")
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = [r[0] for r in df.select(TX.bpe_token_count(F.col("t"))).collect()]
    expect = [len(re.findall(pat, t, re.UNICODE)) for t in texts]
    assert got == expect, (got, expect)


# --------------------------------------------------------- int8 quantization


def test_quantize_roundtrip_error_small(spark, emb):
    from framequery_spark.operators.quantize import quantization_error

    err = quantization_error(emb).agg(F.max("rel_l2_error")).collect()[0][0]
    assert err < 0.05, err


def test_quantize_matches_numpy(spark, emb):
    import numpy as np

    from framequery_spark.operators.quantize import quantize_embeddings

    got = {r["vec_id"]: (list(r["q_codes"]), r["q_scale"])
           for r in quantize_embeddings(emb.filter(F.col("vec_id") < 20)).collect()}
    for r in emb.filter(F.col("vec_id") < 20).collect():
        v = np.array(r["embedding"], dtype=np.float64)
        sc = np.abs(v).max() / 127.0
        codes = np.clip(np.floor(v / sc + 0.5), -127, 127).astype(int)
        gcodes, gsc = got[r["vec_id"]]
        assert gcodes == codes.tolist()
        assert abs(gsc - sc) < 1e-15


def test_quantize_zero_vector(spark):
    from framequery_spark.operators.quantize import (dequantize_embeddings,
                                                     quantize_embeddings)

    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
                               ["vec_id", "embedding"])
    q = quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert list(rows[0]["q_codes"]) == [0, 0, 0] and rows[0]["q_scale"] is None
    de = {r["vec_id"]: list(r["embedding"])
          for r in dequantize_embeddings(q).collect()}
    assert de[0] == [0.0, 0.0, 0.0]
    assert abs(de[1][1] + 2.0) < 0.02


def test_zorder_supports_temporal_columns(spark, tmp_path, tpch_scope):
    # ANSI mode rejects temporal->double casts; zorder must map timestamps
    # to epoch micros internally
    from framequery_spark.sources.zorder import (file_span_stats,
                                                 write_zordered)

    ev = tpch_scope["events"]
    z = write_zordered(ev, str(tmp_path / "zt"), ["ts", "user_id"],
                       n_files=4)
    assert z.count() == ev.count()
    spans = file_span_stats(z, ["ts", "user_id"]).agg(
        F.avg("span_ts").alias("t"), F.avg("span_user_id").alias("u")
    ).collect()[0]
    assert spans["t"] < 0.8 and spans["u"] < 0.8, spans


def test_fuzzy_dedup_keeps_one_per_cluster(spark):
    from framequery_spark.operators.graph import fuzzy_dedup

    base_a = "the quick brown fox jumps over the lazy dog again and again " * 4
    base_b = "pack my box with five dozen liquor jugs for the long trip " * 4
    rows = [(0, base_a), (1, base_a + "tail"), (2, "prefix " + base_a),
            (10, base_b), (11, base_b + "changed tail"),
            (20, "completely unrelated tiny document")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(r["doc_id"] for r in
                 fuzzy_dedup(df, threshold=0.5, num_perm=32).collect())
    assert out == [0, 10, 20]


def test_dedup_keep_best_keeps_highest_score(spark):
    from framequery_spark.operators.graph import dedup_keep_best

    base_a = "the quick brown fox jumps over the lazy dog again and again " * 4
    base_b = "pack my box with five dozen liquor jugs for the long trip " * 4
    rows = [(0, base_a, 5.0), (1, base_a + "tail", 9.0),
            (2, "prefix " + base_a, 7.0),
            (10, base_b, 1.0), (11, base_b + "changed tail", 1.0),
            (20, "completely unrelated tiny document", 0.0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "q"])
    out = sorted(r["doc_id"] for r in
                 dedup_keep_best(df, "q", threshold=0.5,
                                 num_perm=32).collect())
    # cluster {0,1,2}: doc 1 has the top score; cluster {10,11}: tie on
    # score -> lowest id (10); unclustered doc 20 passes through
    assert out == [1, 10, 20]


def test_stream_interval_join_matches_batch(spark, tpch_scope):
    # stream-stream click->purchase attribution must equal the batch
    # interval join exactly (inner matches are emitted eagerly, so the
    # AvailableNow run over the static directory is complete)
    from framequery_spark.streaming.stream import stream_interval_join
    from tests.conftest import SF_DIR

    got = stream_interval_join(spark, f"{SF_DIR}/events.parquet",
                               horizon_minutes=60)
    ev = tpch_scope["events"]
    c = (ev.where(F.col("event_type") == "click")
         .select("user_id", F.col("event_id").alias("left_id"),
                 F.col("ts").alias("lts")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("ru"),
                 F.col("event_id").alias("right_id"),
                 F.col("ts").alias("rts")))
    batch = (c.join(p, [c.user_id == p.ru,
                        F.col("rts") >= F.col("lts"),
                        F.col("rts") <= F.col("lts") + F.expr("INTERVAL 60 MINUTES")])
             .select("user_id", "left_id", "right_id",
                     (F.unix_micros("rts") - F.unix_micros("lts")).alias("delta_us")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert sorted(map(tuple, got.collect()))  # non-empty at test scale


# ---- contamination / split-leakage ----------------------------------------

def test_ngram_strings_edges(spark):
    from framequery_spark.operators.contamination import ngram_strings

    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("  x  Y  z ",)], ["text"])
    rows = df.select(ngram_strings(F.col("text"), 3).alias("g")).collect()
    assert rows[0].g == ["a b c", "b c d"]
    assert rows[1].g == []          # shorter than n: empty, never sequence(1,0)
    assert rows[2].g == []
    assert rows[3].g == ["x y z"]   # lowercased, whitespace-run split


def test_ngram_strings_distinct(spark):
    from framequery_spark.operators.contamination import ngram_strings

    df = spark.createDataFrame([("a b a b a b",)], ["text"])
    (row,) = df.select(ngram_strings(F.col("text"), 2).alias("g")).collect()
    assert sorted(row.g) == ["a b", "b a"]  # duplicates collapsed row-local


def test_decontaminate_drops_flagged(spark):
    from framequery_spark.operators.contamination import (
        contaminated_docs, decontaminate)

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated text about training pipelines"),
         (3, "ok THE QUICK  BROWN fox Jumps Over The Lazy dog extra")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "benchmark says the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    flagged = {r.doc_id for r in
               contaminated_docs(train, bench, n=8).collect()}
    assert flagged == {1, 3}  # case/spacing-normalized span match
    kept = {r.doc_id for r in decontaminate(train, bench, n=8).collect()}
    assert kept == {2}


def test_split_leakage_pairs_exact(spark):
    from framequery_spark.operators.contamination import (
        split_leakage_pairs, split_leakage_summary)

    df = spark.createDataFrame(
        [(1, "train", "same  CONTENT here"),
         (2, "test", "same content HERE"),      # normalized-identical to 1
         (3, "test", "different content"),
         (4, "train", "same content here"),     # same split as 1 -> excluded
         (5, "val", "different content")],      # pairs with 3
        ["doc_id", "split", "text"])
    pairs = {(r.id_a, r.id_b) for r in split_leakage_pairs(df).collect()}
    assert pairs == {(1, 2), (2, 4), (3, 5)}
    summ = {(r.split_a, r.split_b): r.n_pairs
            for r in split_leakage_summary(df).collect()}
    assert sum(summ.values()) == 3


def test_split_leakage_ngrams_min_shared(spark):
    from framequery_spark.operators.contamination import split_leakage_ngrams

    df = spark.createDataFrame(
        [(1, "train", "a b c d e f"),
         (2, "test", "a b c d e f g"),   # shares 4 distinct 3-grams with 1
         (3, "test", "z z z")],
        ["doc_id", "split", "text"])
    out = split_leakage_ngrams(df, n=3, min_shared=4).collect()
    assert [(r.id_a, r.id_b, r.n_shared) for r in out] == [(1, 2, 4)]
    assert split_leakage_ngrams(df, n=3, min_shared=5).count() == 0


def test_chunk_dedup_keeps_canonical(spark):
    df = spark.createDataFrame(
        [(1, "AAAABBBB"), (2, "AAAACCCC"), (3, "BBBBAAAA")],
        ["doc_id", "text"])
    out = {(r.doc_id, r.chunk_id): r.n_copies
           for r in TX.chunk_dedup(df, size=4).collect()}
    # contents: AAAA x3 (keeper 1/0), BBBB x2 (keeper 1/1), CCCC x1 (2/1)
    assert out == {(1, 0): 3, (1, 1): 2, (2, 1): 1}


def test_strip_html(spark):
    df = spark.createDataFrame(
        [("<html><style>p{c:r}</style><p>Hello &amp; <b>world</b></p>"
          "<script>var x = 1 < 2;</script>tail<!-- c -->",),
         ("plain  text",),
         ("<div class='a'>A&nbsp;&lt;tag&gt; &#39;q&#39;</div>",)],
        ["text"])
    out = [r.clean_text for r in TX.html_to_text(df).collect()]
    # script/style contents removed entirely (incl. the 1 < 2 that would
    # otherwise confuse the tag regex), entities decoded, spacing collapsed
    assert out == ["Hello & world tail", "plain text", "A <tag> 'q'"]


def test_stream_ingest_dedup_matches_batch_and_is_idempotent(spark, tmp_path):
    from framequery_spark.operators.dedup import dedup_against
    from framequery_spark.streaming.stream import stream_ingest_dedup

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    out = stream_ingest_dedup(
        spark, f"{sf}/documents.parquet", corpus,
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"),
        doc_filter=F.col("doc_id") % 2 == 1)
    # schema-identical to the batch result — in particular, the sink's
    # batch=<id>/ partition-discovery column must NOT leak through
    assert sorted(out.columns) == sorted(new.columns)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    expect = sorted(r.doc_id for r in
                    dedup_against(new, corpus, threshold=0.7, num_perm=64,
                                  bands=32).select("doc_id").collect())
    assert got == expect and got

    # restart with the same checkpoint: the drained source replays nothing,
    # so the sink must not grow
    again = stream_ingest_dedup(
        spark, f"{sf}/documents.parquet", corpus,
        out_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"),
        doc_filter=F.col("doc_id") % 2 == 1)
    assert again.count() == len(got)


def test_assign_shards_deterministic_and_balanced(spark, docs):
    from framequery_spark.operators.packing import assign_shards

    out = assign_shards(docs, "doc_id", 8)
    counts = {r.shard: r.n for r in
              out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(8))           # every shard populated
    n = sum(counts.values())
    assert max(counts.values()) < n / 8 * 1.5     # roughly uniform
    # layout-invariant: same assignment after an arbitrary repartition
    again = {r.doc_id: r.shard
             for r in assign_shards(docs.repartition(13), "doc_id", 8)
             .select("doc_id", "shard").collect()}
    first = {r.doc_id: r.shard
             for r in out.select("doc_id", "shard").collect()}
    assert again == first


def test_write_training_shards_layout(spark, docs, tmp_path):
    import glob

    from framequery_spark.operators.packing import write_training_shards

    out = write_training_shards(docs, str(tmp_path / "shards"), "doc_id", 4,
                                max_records_per_file=50)
    assert out.count() == docs.count()
    dirs = sorted(glob.glob(str(tmp_path / "shards" / "shard=*")))
    assert [d.split("=")[-1] for d in dirs] == ["0", "1", "2", "3"]
    # maxRecordsPerFile bounds every parquet file
    for f in glob.glob(str(tmp_path / "shards" / "shard=*" / "*.parquet")):
        assert spark.read.parquet(f).count() <= 50


def test_unigram_nll_ranks_rare_tokens(spark):
    df = spark.createDataFrame(
        [(1, "the the the the"),            # most common token only
         (2, "the the zxqv the"),           # one rare token
         (3, "zxqv qqfl wwro plmb")],       # all singletons
        ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.unigram_nll(df).collect()}
    assert out[1].avg_nll < out[2].avg_nll < out[3].avg_nll
    assert out[1].n_tokens == 4
    import math
    # doc 1: all tokens p = 7/12 -> avg_nll = -ln(7/12)
    assert abs(out[1].avg_nll - (-math.log(7 / 12))) < 1e-6
    assert abs(out[1].ppl - math.exp(out[1].avg_nll)) < 1e-3


def test_gopher_quality_filter_rules(spark):
    from framequery_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today ok"),
         (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
         (3, "tiny"),
         (4, "aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb cccccccccccccccccccc "
             "dddddddddddddddddddd eeeeeeeeeeeeeeeeeeee ffffffffffffffffffff "
             "gggggggggggggggggggg hhhhhhhhhhhhhhhhhhhh iiiiiiiiiiiiiiiiiiii "
             "jjjjjjjjjjjjjjjjjjjj the")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_filter(
        df, min_tokens=5, max_tokens=100, max_dup_token_ratio=0.5,
        max_top_token_ratio=0.4, min_stopword_ratio=0.01).collect()}
    assert out[1].keep                      # normal English text
    assert not out[2].ok_dup_tokens         # all-repeats
    assert not out[2].ok_top_token
    assert not out[2].keep
    assert not out[3].ok_length             # too short
    assert not out[4].ok_avg_token_len      # 20-char "words"
    assert out[4].ok_length


def test_time_bucket_gapfill_locf(spark):
    import datetime

    from framequery_spark.operators.asof import time_bucket_gapfill

    ts = datetime.datetime
    df = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 10), 5.0),
         (1, ts(2024, 1, 1, 10, 30), 7.0),   # same hour as above
         (1, ts(2024, 1, 1, 13), 2.0),       # hours 11,12 are gaps
         (2, ts(2024, 1, 1, 0), 1.0)],
        ["user_id", "ts", "value"])
    out = [(r.user_id, r.bucket_ts.hour, r.sum_value, r.locf,
            r.interpolated)
           for r in time_bucket_gapfill(df, bucket="hour")
           .orderBy("user_id", "bucket_ts").collect()]
    # interior gaps interpolate linearly between 12.0 (hour 10) and 2.0
    # (hour 13); locf carries 12.0 flat
    assert out == [
        (1, 10, 12.0, 12.0, 12.0),
        (1, 11, None, 12.0, round(12.0 + (2.0 - 12.0) * 1 / 3, 6)),
        (1, 12, None, 12.0, round(12.0 + (2.0 - 12.0) * 2 / 3, 6)),
        (1, 13, 2.0, 2.0, 2.0),
        (2, 0, 1.0, 1.0, 1.0)]
    import pytest as _pt
    with _pt.raises(ValueError, match="bucket"):
        time_bucket_gapfill(df, bucket="fortnight")


# ------------------------------------------------------------ BM25 retrieval


def test_bm25_topk_ranks_and_determinism(spark, docs):
    from framequery_spark.operators.retrieval import bm25_topk

    qdf = spark.createDataFrame([(1, "spark shuffle join")],
                                "query_id long, query string")
    out = bm25_topk(docs, qdf, k=5).collect()
    assert len(out) == 5
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    scores = [r.score for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # byte-stable across layouts: same result after a repartition
    again = bm25_topk(docs.repartition(7), qdf, k=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_bm25_term_absent_from_corpus_is_ignored(spark, docs):
    from framequery_spark.operators.retrieval import bm25_topk

    qdf = spark.createDataFrame(
        [(1, "zzzznosuchtermzzzz"), (2, "spark zzzznosuchtermzzzz")],
        "query_id long, query string")
    rows = bm25_topk(docs, qdf, k=3).collect()
    # query 1 matches nothing -> no rows; query 2 scores on 'spark' alone
    assert {r.query_id for r in rows} == {2}


# ------------------------------------------------------------ mixture sample


def test_mixture_sample_matches_duckdb(spark, docs):
    import duckdb

    from framequery_spark.operators.sampling import mixture_sample

    out = mixture_sample(docs, "source", {"src1": 0.8, "src2": 0.5},
                         key_col="doc_id", default_rate=0.1)
    got = sorted(r.doc_id for r in out.select("doc_id").collect())
    con = duckdb.connect()
    con.register("documents", docs.select("doc_id", "source").toPandas())
    exp = [r[0] for r in con.execute("""
        SELECT doc_id FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'mixture'), 1, 8) <
              CASE source WHEN 'src1' THEN 'cccccccd'
                          WHEN 'src2' THEN '80000000'
                          ELSE '1999999a' END
        ORDER BY doc_id""").fetchall()]
    assert got == exp and got


def test_mixture_rates_solves_target_proportions(spark, docs):
    from framequery_spark.operators.sampling import (
        mixture_rates, mixture_sample,
    )

    # equal source sizes + 3:1 weights -> the heavy source is exhausted
    # (rate 1.0) and the light one takes 1/3
    rates = mixture_rates(docs, "source", {"src1": 3, "src2": 1})
    assert rates["src1"] == pytest.approx(1.0)
    assert rates["src2"] == pytest.approx(1 / 3, rel=1e-6)
    # capping total_rows shrinks both proportionally
    capped = mixture_rates(docs, "source", {"src1": 3, "src2": 1},
                           total_rows=10)
    assert capped["src1"] == pytest.approx(rates["src1"] * 10 / (
        docs.filter("source = 'src1'").count() +
        docs.filter("source = 'src2'").count() // 3 * 1), rel=0.5)
    assert 0 < capped["src2"] < capped["src1"]
    # unknown source raises
    with pytest.raises(ValueError, match="absent"):
        mixture_rates(docs, "source", {"nope": 1})


# ---------------------------------------------------------------- SemDeDup


def test_semdedup_exact_matches_numpy_greedy(spark, emb):
    from framequery_spark.operators.similarity import semdedup

    sub = emb.filter(F.col("vec_id") < 200)
    got = sorted(r.vec_id for r in
                 semdedup(sub, threshold=0.6, n_clusters=1).collect())
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in sub.collect()}
    keep = []
    for vid in sorted(vecs):
        v = vecs[vid]
        # greedy rule: ANY lower id (kept or not) similar enough drops vid
        dup = any(
            float(v @ vecs[k] / (np.linalg.norm(v) * np.linalg.norm(vecs[k])))
            >= 0.6 for k in sorted(vecs) if k < vid)
        if not dup:
            keep.append(vid)
    assert got == keep and got


def test_semdedup_clustered_is_superset_of_exact(spark, emb):
    # clustering can only MISS cross-cluster pairs, so the clustered
    # survivor set contains every exact survivor
    from framequery_spark.operators.similarity import semdedup

    sub = emb.filter(F.col("vec_id") < 300)
    exact = {r.vec_id for r in
             semdedup(sub, threshold=0.6, n_clusters=1).collect()}
    approx = {r.vec_id for r in
              semdedup(sub, threshold=0.6, n_clusters=6).collect()}
    assert exact <= approx
    assert len(approx) <= sub.count()


def test_semdedup_return_pairs_within_cluster_only(spark, emb):
    from framequery_spark.operators.similarity import semdedup

    sub = emb.filter(F.col("vec_id") < 200)
    pairs = semdedup(sub, threshold=0.6, n_clusters=4,
                     return_pairs=True).collect()
    assert all(r.id1 < r.id2 and r.cosine >= 0.6 for r in pairs)


# ------------------------------------------------------------------- DSIR


def test_dsir_select_prefers_target_like_docs(spark):
    """Synthetic two-domain corpus: target talks about 'quantum physics',
    raw mixes matching and off-domain docs — DSIR must rank the on-domain
    raw docs first, and weights must be monotone in domain affinity."""
    import pandas as pd

    from framequery_spark.operators.dsir import dsir_select, dsir_weights

    target = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100, 101],
        "text": ["quantum physics entanglement theory",
                 "quantum field physics lectures"]}))
    raw = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["quantum physics introduction",
                 "cooking pasta with tomato sauce",
                 "physics of quantum entanglement",
                 "football match results today"]}))
    top = dsir_select(raw, target, k=2, n_buckets=500)
    ids = {r.doc_id for r in top.collect()}
    assert ids == {1, 3}
    w = {r.doc_id: r.dsir_weight
         for r in dsir_weights(raw, target, n_buckets=500).collect()}
    assert w[1] > w[2] and w[3] > w[4]


def test_dsir_weights_deterministic_and_bounded_distribution(spark):
    import pandas as pd

    from framequery_spark.operators.dsir import (bucket_distribution,
                                                 dsir_weights)

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(20)),
        "text": [f"token{i} alpha beta gamma token{i % 3}"
                 for i in range(20)]}))
    dist = bucket_distribution(df, n_buckets=50)
    assert dist.count() <= 50  # bounded regardless of corpus size
    a = sorted(map(tuple, dsir_weights(df, df, n_buckets=50).collect()))
    b = sorted(map(tuple, dsir_weights(df, df, n_buckets=50).collect()))
    assert a == b  # deterministic


def test_dsir_sql_table_function(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT * FROM dsir_select('documents', 'documents', 5, 200)",
        tpch_scope, spark=spark)
    assert out.count() == 5 and "dsir_weight" in out.columns


def test_bigram_lm_nll_flags_shuffled_text(spark):
    """A document with corpus-frequent words in an order never seen
    elsewhere must score worse (higher avg nll) than fluent repeats."""
    import pandas as pd

    from framequery_spark.operators.text import bigram_lm_nll

    fluent = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [fluent, fluent, fluent,
                 "dog the over quick lazy fox brown jumps the"]}))
    out = {r.doc_id: r.avg_nll for r in bigram_lm_nll(df).collect()}
    assert out[4] > out[1]
    assert out[1] == out[2] == out[3]


# ------------------------------------------------ round-7 corpus diagnostics

def test_ngram_novelty_first_seen_semantics(spark):
    """A gram is novel only in the document with the smallest id carrying
    it; docs with < n tokens vanish (no grams)."""
    df = spark.createDataFrame(
        [(1, "a b c"),    # grams {a b, b c} -> both first here
         (2, "a b d"),    # {a b (seen in 1), b d (new)} -> 1/2
         (3, "a b c"),    # both grams first seen elsewhere -> 0/2
         (4, "x")],       # no bigram -> absent
        ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.ngram_novelty(df, n=2).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_novel, out[2].novelty) == (2, 1, 0.5)
    assert (out[3].n_grams, out[3].n_novel, out[3].novelty) == (2, 0, 0.0)


def test_ngram_novelty_counts_distinct_grams(spark):
    # repeated gram inside one doc counts once
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    row = TX.ngram_novelty(df, n=2).collect()[0]
    assert row.n_grams == 2  # occurrences (a b),(b a),(a b) -> 2 distinct


def test_zipf_slope_matches_polyfit(spark):
    import math

    df = spark.createDataFrame(
        [(1, "w w w w v v u", "A"),
         (2, "p p p q", "B")],
        ["doc_id", "text", "source"])
    out = {r.source: r for r in TX.zipf_slope(df).collect()}
    # group A: freqs 4,2,1 at ranks 1,2,3
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    expect = np.polyfit(xs, ys, 1)[0]
    assert abs(out["A"].zipf_slope - round(expect, 6)) < 1e-6
    assert out["A"].n_terms == 3
    # group B: freqs 3,1 at ranks 1,2 -> exact slope ln(1/3)/ln(2)
    assert abs(out["B"].zipf_slope
               - round(math.log(1 / 3) / math.log(2), 6)) < 1e-6


def test_source_overlap_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "b c d", "B"), (3, "b c", "A")],
        ["doc_id", "text", "source"])
    rows = TX.source_overlap(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.g1, r.g2, r.n_common, r.v1, r.v2) == ("A", "B", 2, 3, 3)
    assert abs(r.jaccard - 0.5) < 1e-9


def test_perplexity_buckets_tiers(spark):
    """Buckets are per-language ntiles over ascending avg_nll: tier 1 is
    the most fluent; tiers are deterministic and ordered."""
    rare = ["zxq", "qfl", "wro", "plm", "kjh", "vbn"]
    docs = [(i, "the and of to is the and of", "en") for i in range(3)]
    docs += [(3 + i, f"the and {rare[i]} {rare[i + 3]}", "en")
             for i in range(3)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    out = TX.perplexity_buckets(df, n_buckets=3).collect()
    assert len(out) == 6
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.avg_nll)
    assert sorted(by_bucket) == [1, 2, 3]
    assert all(len(v) == 2 for v in by_bucket.values())
    assert max(by_bucket[1]) <= min(by_bucket[2])
    assert max(by_bucket[2]) <= min(by_bucket[3])


def test_round7_diagnostics_sql_table_functions(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute("SELECT * FROM ngram_novelty('documents', 2)",
                     tpch_scope, spark=spark)
    assert {"n_grams", "n_novel", "novelty"} <= set(out.columns)
    out = fq.execute("SELECT * FROM zipf_slope('documents')",
                     tpch_scope, spark=spark)
    assert "zipf_slope" in out.columns and out.count() > 0
    out = fq.execute("SELECT * FROM source_overlap('documents')",
                     tpch_scope, spark=spark)
    assert "jaccard" in out.columns
    out = fq.execute(
        "SELECT * FROM perplexity_buckets('documents') WHERE bucket = 1",
        tpch_scope, spark=spark)
    assert out.count() > 0


# ------------------------------------------ repeated-span removal (Lee et al.)


def _span_rows(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f g h unique tail one"),
         (2, "prefix two a b c d e f g h suffix two"),
         (3, "short doc"),
         (4, "x1 x2 x3 x4 x5 x6 x7 x8 x9 mid x1 x2 x3 x4 x5 x6 x7 x8 x9")],
        ["doc_id", "text"])


def test_remove_repeated_spans_cuts_shared_span_everywhere(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    out = {r.doc_id: r for r in
           remove_repeated_spans(_span_rows(spark), k=8).collect()}
    # the shared 8-gram "a b c d e f g h" is cut from BOTH documents
    # (all-occurrences policy), the unique remainder survives verbatim
    assert out[1].clean_text == "unique tail one"
    assert out[1].n_removed_tokens == 8
    assert out[2].clean_text == "prefix two suffix two"
    assert out[2].n_removed_tokens == 8


def test_remove_repeated_spans_short_docs_untouched(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    out = {r.doc_id: r for r in
           remove_repeated_spans(_span_rows(spark), k=8).collect()}
    assert out[3].clean_text == "short doc"
    assert out[3].n_removed_tokens == 0


def test_remove_repeated_spans_merges_overlapping_grams(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    # a 9-token run repeated within one doc yields two overlapping sets of
    # duplicated 8-grams; the span union removes 18 tokens, not 2*8 per copy
    out = {r.doc_id: r for r in
           remove_repeated_spans(_span_rows(spark), k=8).collect()}
    assert out[4].clean_text == "mid"
    assert out[4].n_removed_tokens == 18


def test_remove_repeated_spans_deterministic_under_repartition(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    df = _span_rows(spark)
    a = sorted(map(tuple, remove_repeated_spans(df, k=3).collect()))
    b = sorted(map(tuple,
                   remove_repeated_spans(df.repartition(7), k=3).collect()))
    assert a == b


def test_remove_repeated_spans_param_validation(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    df = _span_rows(spark)
    with pytest.raises(ValueError, match="k must be"):
        remove_repeated_spans(df, k=0)
    with pytest.raises(ValueError, match="min_copies"):
        remove_repeated_spans(df, min_copies=1)


def test_remove_repeated_spans_sql_table_function(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT * FROM remove_repeated_spans('documents', 8, 2) "
        "WHERE n_removed_tokens > 0", tpch_scope, spark=spark)
    assert set(out.columns) == {"doc_id", "clean_text", "n_removed_tokens"}
    assert out.count() > 0


# ------------------------------------------------- token-budget selection


def _budget_rows(spark):
    rows = [(i, float(100 - i % 7), 10 + i % 5) for i in range(100)]
    return rows, spark.createDataFrame(rows,
                                       ["doc_id", "quality", "n_tokens"])


def test_take_token_budget_is_exact_maximal_prefix(spark):
    from framequery_spark.operators.packing import take_token_budget

    rows, df = _budget_rows(spark)
    cum, want = 0, []
    for r in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + r[2] > 500:
            break
        cum += r[2]
        want.append((r[0], r[2], cum))
    got = sorted(map(tuple, take_token_budget(df, 500, chunk=16).collect()))
    assert got == sorted(want)


def test_take_token_budget_partition_and_chunk_invariant(spark):
    from framequery_spark.operators.packing import take_token_budget

    _, df = _budget_rows(spark)
    base = sorted(map(tuple, take_token_budget(df, 500, chunk=16).collect()))
    # different physical partitioning and different bucket widths (including
    # one bucket per row and all rows in one bucket) select the same prefix
    for variant in (take_token_budget(df.repartition(13), 500, chunk=7),
                    take_token_budget(df, 500, chunk=1),
                    take_token_budget(df, 500, chunk=10**6)):
        assert sorted(map(tuple, variant.collect())) == base


def test_take_token_budget_excludes_null_score_and_tokens(spark):
    from framequery_spark.operators.packing import take_token_budget

    df = spark.createDataFrame(
        [(1, None, 10), (2, 5.0, None), (3, 5.0, 10)],
        "doc_id long, quality double, n_tokens long")
    assert ([tuple(r) for r in take_token_budget(df, 100).collect()]
            == [(3, 10, 10)])


def test_take_token_budget_zero_budget_and_validation(spark):
    from framequery_spark.operators.packing import take_token_budget

    _, df = _budget_rows(spark)
    assert take_token_budget(df, 0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        take_token_budget(df, -1)
    with pytest.raises(ValueError, match="chunk"):
        take_token_budget(df, 10, chunk=0)


def test_take_token_budget_sql_table_function(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT count(*) AS n, max(cum_tokens) AS mx FROM "
        "take_token_budget('documents', 'n_chars', 'n_chars', 20000)",
        tpch_scope, spark=spark).collect()[0]
    assert out.n > 0 and out.mx <= 20000


def test_remove_repeated_spans_null_text_survives_with_zero_count(spark):
    from framequery_spark.operators.dedup import remove_repeated_spans

    rows = spark.createDataFrame(
        [(1, "a b c d e f g h tail"), (2, "a b c d e f g h other"),
         (3, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_repeated_spans(rows, k=8).collect()}
    # the NULL-text doc is normalized to '' — emitted, untouched, and the
    # n_removed_tokens contract (0 for untouched docs) holds, never -1
    assert out[3].clean_text == ""
    assert out[3].n_removed_tokens == 0
    assert out[1].n_removed_tokens == 8 and out[2].n_removed_tokens == 8


# -------------------------------------------- mixture weights / negatives


def test_alpha_mixture_weights_temperatures(spark):
    import math

    from framequery_spark.operators.sampling import alpha_mixture_weights

    df = spark.createDataFrame(
        [("a",)] * 80 + [("b",)] * 19 + [("c",)] * 1, ["source"])
    nat = {r.source: r for r in
           alpha_mixture_weights(df, alpha=1.0).collect()}
    assert abs(nat["a"].share_after - 0.8) < 1e-6
    assert abs(nat["a"].share_before - nat["a"].share_after) < 1e-6
    uni = {r.source: r for r in
           alpha_mixture_weights(df, alpha=0.0).collect()}
    assert all(abs(uni[s].share_after - 1 / 3) < 1e-5 for s in "abc")
    # alpha < 1 up-weights the scarce source relative to its natural
    # share and down-weights the dominant one; shares still sum to 1
    t = {r.source: r for r in
         alpha_mixture_weights(df, alpha=0.3).collect()}
    assert t["c"].share_after > t["c"].share_before
    assert t["a"].share_after < t["a"].share_before
    assert abs(sum(t[s].share_after for s in "abc") - 1.0) < 1e-4
    # closed form
    tot = sum(math.pow(n, 0.3) for n in (80, 19, 1))
    assert abs(t["b"].share_after - math.pow(19, 0.3) / tot) < 1e-5


def test_alpha_mixture_weights_token_mass(spark):
    from framequery_spark.operators.sampling import alpha_mixture_weights

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 600)], ["source", "n_tokens"])
    t = {r.source: r for r in
         alpha_mixture_weights(df, alpha=1.0,
                               count_col="n_tokens").collect()}
    assert abs(t["a"].share_after - 0.25) < 1e-6
    assert abs(t["b"].share_after - 0.75) < 1e-6


def test_hard_negatives_excludes_same_label(tpch_scope):
    from pyspark.sql import functions as F

    from framequery_spark.operators.similarity import hard_negatives

    emb = tpch_scope["embeddings"]
    out = hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=3)
    rows = out.collect()
    labels = {r.vec_id: r.label for r in
              emb.select("vec_id", "label").collect()}
    assert rows and all(r.neighbor_label != labels[r.query_id]
                        for r in rows)
    assert all(r["rank"] <= 3 for r in rows)
    # per query the ranks are 1..k without gaps
    from collections import defaultdict
    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per.values())


def test_to_tsvector_linear_on_long_documents(spark):
    """Linearity guard for the r08 to_tsvector construction: a 30k-token
    document with high lexeme cardinality builds in one sort pass. The
    r07 per-distinct-lexeme construction was O(lexemes x tokens) — on
    this input that is ~4.5e8 filter steps and minutes of wall clock,
    so completing promptly IS the regression check (the plan contract in
    test_operator_plans.py pins the single word-parse)."""
    import time

    from pyspark.sql import functions as F

    from framequery_spark.functions.textsearch import to_tsvector

    text = " ".join(f"w{i % 15000}" for i in range(30000))
    df = spark.createDataFrame([(text,)], "t string")
    t0 = time.time()
    out = df.select(F.size(to_tsvector(F.col("t"))).alias("n")).collect()
    assert out[0]["n"] == 15000
    assert time.time() - t0 < 60, "to_tsvector is not linear anymore"


def test_audio_chunks_byte_ranges(spark):
    from pyspark.sql import functions as F

    from framequery_spark.operators.multimodal import (attach_blob,
                                                       audio_chunks)

    df = spark.createDataFrame(
        [(1, "a" * 70), (2, "xy"), (3, "")], ["doc_id", "text"])
    out = {(r.doc_id, r.chunk_idx): r for r in
           audio_chunks(attach_blob(df), sample_rate=16, sample_width=2,
                        chunk_seconds=1.0).collect()}
    # 70 bytes at 32 bytes/chunk -> 32, 32, 6 (short tail); empty blob
    # yields no chunks
    assert {k for k in out} == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert out[(1, 0)].chunk_bytes == 32
    assert out[(1, 2)].chunk_bytes == 6
    assert bytes(out[(1, 2)].chunk) == b"a" * 6
    # chunk sha is the content address: identical content, identical sha
    assert out[(1, 0)].chunk_sha == out[(1, 1)].chunk_sha
    import hashlib
    assert out[(2, 0)].chunk_sha == hashlib.sha256(b"xy").hexdigest()


def test_concat_chunks_block_invariants(spark):
    from collections import defaultdict

    from framequery_spark.operators.packing import concat_chunks

    df = spark.createDataFrame(
        [(1, 3), (2, 5), (3, 2), (4, 9), (5, None)],
        "doc_id long, n_tokens long")
    rows = concat_chunks(df, block_size=4).collect()
    per_block = defaultdict(int)
    per_doc = defaultdict(int)
    for r in rows:
        assert 0 <= r.tok_from < r.tok_to
        per_block[r.block_id] += r.n_in_block
        per_doc[r.doc_id] += r.n_in_block
    # every block is exactly full except the last partial one
    total = 3 + 5 + 2 + 9
    last = max(per_block)
    assert all(v == 4 for b, v in per_block.items() if b != last)
    assert per_block[last] == total - 4 * last
    # every document's tokens are fully assigned exactly once
    assert per_doc == {1: 3, 2: 5, 3: 2, 4: 9}


def test_concat_chunks_chunk_width_invariant(spark):
    from framequery_spark.operators.packing import concat_chunks

    df = spark.createDataFrame(
        [(i, (i * 7) % 11 + 1) for i in range(200)],
        "doc_id long, n_tokens long")
    a = sorted(map(tuple, concat_chunks(df, 16, chunk=1).collect()))
    b = sorted(map(tuple,
                   concat_chunks(df.repartition(7), 16,
                                 chunk=64).collect()))
    assert a == b


def test_char_entropy_closed_forms(spark):
    from framequery_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None),
         (6, "aab")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in char_entropy(df).collect()}
    assert rows[1].entropy == 0.0          # single symbol
    assert rows[2].entropy == 1.0          # two equiprobable symbols
    assert rows[3].entropy == 2.0          # four equiprobable symbols
    assert rows[4].entropy == 0.0 and rows[4].n_chars_counted == 0
    assert rows[5].entropy == 0.0          # NULL normalizes like empty
    # H(2/3, 1/3) = log2(3) - 2/3 ~ 0.918296
    assert abs(rows[6].entropy - 0.918296) < 1e-6


def test_compression_ratio_separates_floods_from_text(spark):
    import zlib

    from framequery_spark.operators.text import compression_ratio

    natural = ("the quick brown fox jumps over the lazy dog and keeps "
               "going with varied words here")
    df = spark.createDataFrame(
        [(1, "spam " * 400), (2, natural), (3, None), (4, "")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert rows[1].ratio < 0.05 < rows[2].ratio  # flood vs natural text
    assert rows[3].ratio == 1.0 and rows[4].ratio == 1.0
    # byte counts are exactly stdlib zlib's
    assert rows[2].n_compressed == len(
        zlib.compress(natural.encode("utf-8"), 6))


# ----------------------------------------- round 9: event-sequence analytics


def _funnel_rows(spark):
    # user 1: clean view->click->purchase chain
    # user 2: click BEFORE the first view (must not count), then view only
    # user 3: view and click at the SAME timestamp (strict > : no advance)
    # user 4: full chain but purchase outside the within window
    return spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view"),
         (1, "2024-01-01 00:10:00", "click"),
         (1, "2024-01-01 00:20:00", "purchase"),
         (2, "2024-01-01 00:00:00", "click"),
         (2, "2024-01-01 00:05:00", "view"),
         (3, "2024-01-01 00:00:00", "view"),
         (3, "2024-01-01 00:00:00", "click"),
         (4, "2024-01-01 00:00:00", "view"),
         (4, "2024-01-01 00:01:00", "click"),
         (4, "2024-01-02 00:00:00", "purchase")],
        "user_id long, ts string, event_type string").withColumn(
            "ts", F.col("ts").cast("timestamp"))


def test_funnel_strict_order_and_within(spark):
    from framequery_spark.operators.events import funnel_counts

    out = {r.stage: r for r in funnel_counts(
        _funnel_rows(spark), ["view", "click", "purchase"],
        within_seconds=3600).collect()}
    # views: users 1,2,3,4; clicks after view: 1,4 (2 clicked before,
    # 3 tied); purchases within 1h: only 1 (4 purchased next day)
    assert out["view"].n_users == 4
    assert out["click"].n_users == 2
    assert out["purchase"].n_users == 1
    assert out["view"].pct == 1.0 and out["purchase"].pct == 0.25
    assert [r.stage_idx for r in sorted(out.values(),
                                        key=lambda r: r.stage_idx)] == [1, 2, 3]


def test_funnel_no_within_counts_late_purchase(spark):
    from framequery_spark.operators.events import funnel_counts

    out = {r.stage: r.n_users for r in funnel_counts(
        _funnel_rows(spark), ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 2}


def test_funnel_validation(spark):
    from framequery_spark.operators.events import funnel_counts

    with pytest.raises(ValueError):
        funnel_counts(_funnel_rows(spark), [])
    with pytest.raises(ValueError):
        funnel_counts(_funnel_rows(spark), ["view", "view"])


def test_retention_cohorts_day_offsets(spark):
    from framequery_spark.operators.events import retention_cohorts

    df = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00"), (1, "2024-01-02 09:00:00"),
         (1, "2024-01-04 10:00:00"),
         (2, "2024-01-01 23:00:00"),
         (3, "2024-01-02 01:00:00"), (3, "2024-01-04 02:00:00")],
        "user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")).withColumn(
            "event_type", F.lit("e"))
    out = {(str(r.cohort), r.offset): (r.n_active, r.retention)
           for r in retention_cohorts(df, granularity="day").collect()}
    assert out[("2024-01-01 00:00:00", 0)] == (2, 1.0)
    assert out[("2024-01-01 00:00:00", 1)] == (1, 0.5)   # user 1 on day 2
    assert out[("2024-01-01 00:00:00", 3)] == (1, 0.5)   # user 1 on day 4
    assert out[("2024-01-02 00:00:00", 0)] == (1, 1.0)   # user 3 cohort
    assert out[("2024-01-02 00:00:00", 2)] == (1, 1.0)
    assert len(out) == 5


def test_profile_numeric_matches_python(spark):
    import statistics

    from framequery_spark.operators.profile import profile_numeric

    vals = [1.5, 2.0, None, 4.25, 10.0, -3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = profile_numeric(df, ["x"]).collect()[0]
    present = [v for v in vals if v is not None]
    assert (r.column, r.n, r.n_null) == ("x", 5, 1)
    assert (r.min, r.max) == (min(present), max(present))
    assert r.mean == round(statistics.mean(present), 6)
    assert r.stddev == round(statistics.stdev(present), 6)


def test_profile_numeric_single_value_has_null_stddev(spark):
    from framequery_spark.operators.profile import profile_numeric

    df = spark.createDataFrame([(7.0,)], "x double")
    r = profile_numeric(df, ["x"]).collect()[0]
    assert r.stddev is None and r.mean == 7.0


def test_profile_numeric_partitioning_invariant(spark, tpch_scope):
    from framequery_spark.operators.profile import profile_numeric

    li = tpch_scope["lineitem"]
    a = [tuple(r) for r in profile_numeric(li, ["l_quantity"]).collect()]
    b = [tuple(r) for r in
         profile_numeric(li.repartition(23), ["l_quantity"]).collect()]
    assert a == b


def test_profile_numeric_validates_cols(spark, tpch_scope):
    from framequery_spark.operators.profile import profile_numeric

    with pytest.raises(ValueError, match="at least one column"):
        profile_numeric(tpch_scope["lineitem"], [])


def test_rfm_segments_scores_known_quartiles(spark):
    from framequery_spark.operators.events import rfm_segments

    # 4 users with strictly increasing recency/frequency/spend: each must
    # land in its own quartile, user k scoring (k,k,k)
    rows = []
    for u in range(1, 5):
        for i in range(u):  # frequency = u events
            rows.append((u, f"2024-01-0{u} 0{i}:00:00", "purchase",
                         float(u)))  # per-event spend u -> total u*u
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user: r for r in rfm_segments(df).collect()}
    for u in range(1, 5):
        r = out[u]
        assert (r.r_score, r.f_score, r.m_score) == (u, u, u), r
        assert r.segment == f"{u}{u}{u}"
        assert r.m_micro == u * u * 1_000_000


def test_rfm_segments_monetary_counts_only_purchases(spark):
    from framequery_spark.operators.events import rfm_segments

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view", 100.0),
         (1, "2024-01-01 01:00:00", "purchase", 2.5),
         (2, "2024-01-02 00:00:00", "view", 9.0)],
        "user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user: r.m_micro for r in rfm_segments(df).collect()}
    assert out == {1: 2_500_000, 2: 0}


def test_rfm_segments_partitioning_invariant(spark, tpch_scope):
    from framequery_spark.operators.events import rfm_segments

    ev = tpch_scope["events"]
    a = rfm_segments(ev).select("user", "segment").collect()
    b = rfm_segments(ev.repartition(17)).select("user", "segment").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ks_drift_identical_distributions_is_zero(spark):
    from framequery_spark.operators.events import ks_drift

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v)) for v in range(10)],
        "g string, value double")
    r = ks_drift(df, "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d_num, r.ks_stat) == (10, 10, 0, 0.0)


def test_ks_drift_disjoint_distributions_is_one(spark):
    from framequery_spark.operators.events import ks_drift

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(5)]
        + [("b", float(v) + 100.0) for v in range(8)],
        "g string, value double")
    r = ks_drift(df, "g", "a", "b").collect()[0]
    assert r.ks_stat == 1.0 and r.d_num == 5 * 8


def test_ks_drift_matches_scipy_formula(spark):
    import bisect

    from framequery_spark.operators.events import ks_drift

    rng = np.random.RandomState(7)
    a = sorted(int(math.floor(v * 1e6)) for v in rng.normal(0, 1, 200))
    b = sorted(int(math.floor(v * 1e6)) for v in rng.normal(0.3, 1.2, 150))
    df = spark.createDataFrame(
        [("a", v / 1e6) for v in a] + [("b", v / 1e6) for v in b],
        "g string, value double")
    dmax = max(abs(bisect.bisect_right(a, v) * len(b)
                   - bisect.bisect_right(b, v) * len(a))
               for v in sorted(set(a) | set(b)))
    r = ks_drift(df, "g", "a", "b").collect()[0]
    assert r.d_num == dmax
    assert r.ks_stat == round(dmax / (len(a) * len(b)), 6)


def test_ks_drift_ignores_other_groups_and_nulls(spark):
    from framequery_spark.operators.events import ks_drift

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0), ("c", 99.0)],
        "g string, value double")
    r = ks_drift(df, "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (1, 1)


def test_changepoint_finds_obvious_rate_shift(spark):
    from framequery_spark.operators.events import changepoint_mean_shift

    # 2 events/hour for 12 hours, then 10/hour for 12 hours
    rows = []
    eid = 0
    for h in range(24):
        for _ in range(2 if h < 12 else 10):
            rows.append((eid, f"2024-01-01 {h:02d}:{eid % 60:02d}:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    top = changepoint_mean_shift(df, top_k=1).collect()[0]
    assert str(top.split_period) == "2024-01-01 11:00:00"
    assert (top.n_before, top.n_after) == (12, 12)
    assert (top.mean_before, top.mean_after) == (2.0, 10.0)
    assert top.score == round((12 * 12 / 24) ** 0.5 * 8.0, 6)


def test_changepoint_validates_args(spark, tpch_scope):
    from framequery_spark.operators.events import changepoint_mean_shift

    with pytest.raises(ValueError, match="granularity"):
        changepoint_mean_shift(tpch_scope["events"], granularity="year")
    with pytest.raises(ValueError, match="top_k"):
        changepoint_mean_shift(tpch_scope["events"], top_k=0)


def test_retention_granularity_validation(spark):
    from framequery_spark.operators.events import retention_cohorts

    with pytest.raises(ValueError):
        retention_cohorts(_funnel_rows(spark), granularity="hour")


# --------------------------------------------- round 9: trigram fuzzy join


def test_trgm_pairs_matches_scalar_similarity(spark):
    """The blocked join must produce exactly the scalar
    similarity(a, b) >= threshold matrix (pg_trgm % self-join)."""
    from framequery_spark.functions.trigram import similarity as trgm_sim
    from framequery_spark.operators.dedup import trgm_pairs

    names = [(i, n) for i, n in enumerate(
        ["word", "two words", "words", "sword", "world", "completely other"])]
    df = spark.createDataFrame(names, "id long, name string")
    got = {(r.id1, r.id2): r.sim
           for r in trgm_pairs(df, "id", "name", threshold=0.3).collect()}

    a = df.toDF("id1", "n1")
    b = df.toDF("id2", "n2")
    expected = {(r.id1, r.id2): round(r.s, 6) for r in
                a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
                .select("id1", "id2",
                        trgm_sim(F.col("n1"), F.col("n2")).alias("s"))
                .filter(F.col("s") >= 0.3).collect()}
    assert got == expected and len(got) >= 3


def test_trgm_pairs_max_doc_freq_caps_both_sides(spark):
    """Regression: the left_anti frequency-cap join hoists the key column;
    a positional rename then swapped (id, gram) and silently emptied the
    result. The cap must keep rare-trigram pairs and drop common-trigram
    mass from the denominator on BOTH sides."""
    from framequery_spark.operators.dedup import trgm_pairs

    # 'zq' trigrams are rare (2 docs); 'common'-word trigrams span all 4
    df = spark.createDataFrame(
        [(1, "common zqa"), (2, "common zqa"), (3, "common alpha"),
         (4, "common beta")],
        "id long, name string")
    out = {(r.id1, r.id2): r.sim
           for r in trgm_pairs(df, "id", "name", threshold=0.5,
                               max_doc_freq=3).collect()}
    # docs 1,2 share ALL their surviving (rare) trigrams -> sim 1.0
    assert out == {(1, 2): 1.0}


def test_jaccard_pairs_max_doc_freq_regression(spark, docs):
    """Same column-swap regression for jaccard_pairs: with a cap high
    enough to drop nothing, capped == uncapped."""
    from framequery_spark.operators.dedup import jaccard_pairs

    sample = docs.filter(F.col("doc_id") < 60)
    n_docs = sample.count()
    base = {(r.id1, r.id2): r.jaccard
            for r in jaccard_pairs(sample, threshold=0.5).collect()}
    capped = {(r.id1, r.id2): r.jaccard
              for r in jaccard_pairs(sample, threshold=0.5,
                                     max_doc_freq=n_docs).collect()}
    assert base == capped and len(base) > 0


# ------------------------------------- round 9: deterministic group sample


def test_group_sample_k_exact_and_deterministic(spark, docs):
    from framequery_spark.operators.sampling import group_sample_k

    out = group_sample_k(docs, "source", "doc_id", k=4)
    per_group = {r.source: r.n for r in
                 out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_group == {g: min(4, n) for g, n in sizes.items()}

    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in group_sample_k(
        docs.repartition(7), "source", "doc_id", k=4)
        .select("doc_id").collect())
    assert ids1 == ids2  # layout-independent

    # matches an explicit python md5 ranking
    import hashlib as _h
    rows = [(r.source, r.doc_id) for r in
            docs.select("source", "doc_id").collect()]
    expect = set()
    by_group = {}
    for g, i in rows:
        by_group.setdefault(g, []).append(i)
    for g, ids in by_group.items():
        ranked = sorted(ids, key=lambda i: (
            _h.md5(f"{i}gk".encode()).hexdigest(), str(i)))
        expect.update(ranked[:4])
    assert set(ids1) == expect

    with pytest.raises(ValueError):
        group_sample_k(docs, "source", "doc_id", k=0)


# --------------------------------------- round 9: source mixture divergence


def test_source_divergence_single_source_is_zero(spark):
    from framequery_spark.operators.text import source_divergence

    df = spark.createDataFrame(
        [(1, "a", "alpha beta gamma"), (2, "a", "beta gamma delta")],
        "doc_id long, source string, text string")
    rows = source_divergence(df, vocab_size=10).collect()
    assert len(rows) == 1 and rows[0].js == 0.0


def test_source_divergence_matches_numpy(spark, docs):
    import numpy as np

    from framequery_spark.operators.text import source_divergence

    got = {r.source: (r.n_tokens, r.js)
           for r in source_divergence(docs, vocab_size=200).collect()}

    rows = [(r.source, r.text) for r in
            docs.select("source", "text").collect()]
    from collections import Counter
    per = {}
    corpus = Counter()
    for g, t in rows:
        toks = [w for w in t.strip().lower().split() if w]
        per.setdefault(g, Counter()).update(toks)
        corpus.update(toks)
    vocab = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    vterms = [t for t, _ in vocab]
    cf = np.array([c for _, c in vocab], dtype=float)
    q = cf / cf.sum()
    for g, cnt in per.items():
        f = np.array([cnt.get(t, 0) for t in vterms], dtype=float)
        gt = int(f.sum())
        p = f / f.sum()
        m = (p + q) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            js = float(np.where(p > 0, p * np.log(p / m), 0.0).sum() / 2
                       + (q * np.log(q / m)).sum() / 2)
        assert got[g][0] == gt
        assert abs(got[g][1] - js) < 1e-6, g


# ---------------------------------------- round 9: SQL table functions


def test_round9_sql_table_functions(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT * FROM funnel('events', 'view', 'click', 'purchase')",
        tpch_scope, spark=spark)
    assert [r.stage for r in out.orderBy("stage_idx").collect()] == [
        "view", "click", "purchase"]
    out = fq.execute("SELECT * FROM retention_cohorts('events', 'week')",
                     tpch_scope, spark=spark)
    assert {"cohort", "offset", "n_active", "retention"} <= set(out.columns)
    out = fq.execute("SELECT * FROM trgm_pairs('documents', 0.95)",
                     tpch_scope, spark=spark)
    assert {"id1", "id2", "sim"} <= set(out.columns)
    out = fq.execute(
        "SELECT * FROM group_sample('documents', 'source', 'doc_id', 2)",
        tpch_scope, spark=spark)
    assert out.groupBy("source").count().agg(
        F.max("count")).collect()[0][0] <= 2
    out = fq.execute("SELECT * FROM source_divergence('documents', 100)",
                     tpch_scope, spark=spark)
    assert {"source", "n_tokens", "js"} <= set(out.columns)


def test_round9b_sql_table_functions(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT split, count(*) AS n FROM "
        "stratified_split('documents', 'lang', 'doc_id') "
        "GROUP BY split ORDER BY split",
        tpch_scope, spark=spark)
    assert [r.split for r in out.collect()] == ["test", "train", "val"]
    out = fq.execute("SELECT * FROM rfm_segments('events') "
                     "WHERE segment = '444'", tpch_scope, spark=spark)
    assert {"user", "r_score", "f_score", "m_score", "segment"} \
        <= set(out.columns)
    out = fq.execute(
        "SELECT * FROM ks_drift('events', 'event_type', "
        "'purchase', 'click')", tpch_scope, spark=spark)
    r = out.collect()[0]
    assert 0.0 <= r.ks_stat <= 1.0
    out = fq.execute("SELECT * FROM changepoint('events', 'hour', 3)",
                     tpch_scope, spark=spark)
    assert out.count() == 3
    out = fq.execute("SELECT * FROM pmi_bigrams('documents', 3, 10)",
                     tpch_scope, spark=spark)
    assert out.count() == 10
    out = fq.execute("SELECT * FROM textrank_keywords('documents', 5)",
                     tpch_scope, spark=spark)
    assert out.count() == 5
    out = fq.execute(
        "SELECT * FROM profile_numeric('lineitem', 'l_quantity') ",
        tpch_scope, spark=spark)
    assert out.collect()[0].column == "l_quantity"
    out = fq.execute("SELECT max(oov_rate) AS m FROM "
                     "oov_rate('documents', 15)", tpch_scope, spark=spark)
    assert 0.0 <= out.collect()[0].m <= 1.0


# --------------------------------- round 9: weighted sampling (A-Res)


def test_weighted_sample_k_matches_python_ares(spark, docs):
    import hashlib as _h
    import math

    from framequery_spark.operators.sampling import weighted_sample_k

    got = sorted(r.doc_id for r in
                 weighted_sample_k(docs, "n_chars", "doc_id", k=20)
                 .select("doc_id").collect())

    rows = [(r.doc_id, r.n_chars) for r in
            docs.select("doc_id", "n_chars").collect()]

    def score(i, w):
        v = int(_h.md5(f"{i}ws".encode()).hexdigest()[:15], 16)
        return math.log((v + 1) / float(1 << 60)) / w

    ranked = sorted(((score(i, w), str(i), i) for i, w in rows if w and w > 0),
                    key=lambda t: (-t[0], t[1]))
    assert got == sorted(i for _, _, i in ranked[:20])


def test_weighted_sample_k_is_weight_proportional(spark):
    """Statistical sanity over many salts: a row with 9x the weight must be
    selected roughly 9x as often in 1-of-n samples (A-Res correctness)."""
    from framequery_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(i, 9.0 if i == 0 else 1.0) for i in range(10)], "id long, w double")
    wins = 0
    n_trials = 120
    for t in range(n_trials):
        picked = weighted_sample_k(df, "w", "id", k=1, salt=f"s{t}").collect()
        wins += picked[0].id == 0
    # P(pick id 0) = 9/18 = 0.5; binomial(120, 0.5) within 5 sigma
    assert 0.25 <= wins / n_trials <= 0.75, wins


def test_weighted_sample_k_excludes_nonpositive_and_groups(spark):
    from framequery_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 0.0), ("a", 3, None), ("a", 4, 2.0),
         ("b", 5, 1.0)],
        "g string, id long, w double")
    out = weighted_sample_k(df, "w", "id", k=2, group_col="g")
    rows = {(r.g, r.id) for r in out.collect()}
    assert rows == {("a", 1), ("a", 4), ("b", 5)}
    with pytest.raises(ValueError):
        weighted_sample_k(df, "w", "id", k=0)


def test_stream_funnel_equals_batch(spark):
    """The stateful streaming funnel's final emissions must equal the
    batch operator over the same static events (the driver-oracle
    identity)."""
    from framequery_spark.operators.events import funnel_counts
    from framequery_spark.streaming.stream import stream_funnel_counts

    path = "/root/testdata/sf0.001/events.parquet"
    from framequery_spark.sources.testdata import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    stages = ["view", "click", "purchase"]
    batch = [(r.stage_idx, r.stage, r.n_users, r.pct) for r in
             funnel_counts(ev, stages, within_seconds=3600)
             .orderBy("stage_idx").collect()]
    stream = [(r.stage_idx, r.stage, r.n_users, r.pct) for r in
              stream_funnel_counts(spark, path, stages, within_seconds=3600)
              .orderBy("stage_idx").collect()]
    assert stream == batch

    with pytest.raises(ValueError):
        stream_funnel_counts(spark, path, [])


def test_stream_anomaly_equals_batch(spark):
    """The streaming rate-anomaly monitor's AvailableNow replay must
    equal the batch operator over the same static events (the
    driver-oracle identity)."""
    from framequery_spark.operators.events import event_rate_anomaly
    from framequery_spark.sources.testdata import load_tables
    from framequery_spark.streaming.stream import stream_event_anomaly

    path = "/root/testdata/sf0.001/events.parquet"
    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    batch = sorted(tuple(r) for r in
                   event_rate_anomaly(ev, bucket="hour").collect())
    stream = sorted(tuple(r) for r in
                    stream_event_anomaly(spark, path,
                                         bucket="hour").collect())
    assert stream == batch

    with pytest.raises(ValueError, match="bucket"):
        stream_event_anomaly(spark, path, bucket="year")


def test_semantic_decontaminate_drops_near_benchmark_rows(spark, emb):
    from framequery_spark.operators.contamination import (
        semantic_decontaminate)

    bench = emb.filter(F.col("vec_id") < 20)
    train = emb.filter(F.col("vec_id") >= 20)
    kept = {r.vec_id for r in
            semantic_decontaminate(train, bench, threshold=0.35)
            .select("vec_id").collect()}

    # python reference: exact cosine against every benchmark vector
    import numpy as np
    b = {r.vec_id: np.array(r.embedding, dtype=float)
         for r in bench.collect()}
    dropped_ref = set()
    for r in train.collect():
        v = np.array(r.embedding, dtype=float)
        for bv in b.values():
            c = float(v @ bv / (np.linalg.norm(v) * np.linalg.norm(bv)))
            if c >= 0.35:
                dropped_ref.add(r.vec_id)
                break
    all_train = {r.vec_id for r in train.select("vec_id").collect()}
    assert kept == all_train - dropped_ref and dropped_ref


def test_semantic_decontaminate_plan_broadcasts_benchmark(spark, emb):
    from framequery_spark.operators.contamination import (
        semantic_decontaminate)
    from framequery_spark.plans.explain import formatted_plan

    plan = formatted_plan(semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 20), emb.filter(F.col("vec_id") < 20),
        threshold=0.35))
    # benchmark broadcast, corpus streamed, anti join — never a shuffle
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_decontaminate_sql_table_function(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        """WITH bench AS (SELECT * FROM embeddings WHERE vec_id < 20),
                train AS (SELECT * FROM embeddings WHERE vec_id >= 20)
           SELECT count(*) AS n
           FROM semantic_decontaminate('train', 'bench', 0.35)""",
        tpch_scope, spark=spark)
    n_total = fq.execute(
        "SELECT count(*) AS n FROM embeddings WHERE vec_id >= 20",
        tpch_scope, spark=spark).collect()[0].n
    assert 0 < out.collect()[0].n < n_total


def test_event_rate_anomaly_flags_the_spike(spark):
    import numpy as np

    from framequery_spark.operators.events import event_rate_anomaly

    # 24 calm hours of ~5 events + one 50-event spike hour
    rows = []
    for h in range(24):
        for i in range(5):
            rows.append((f"2024-01-01 {h:02d}:00:{i:02d}", "click"))
    rows += [(f"2024-01-02 00:00:{i % 60:02d}.{i // 60}", "click")
             for i in range(50)]
    df = spark.createDataFrame(rows, "ts string, event_type string") \
              .withColumn("ts", F.col("ts").cast("timestamp")) \
              .withColumn("user_id", F.lit(1))
    out = event_rate_anomaly(df, bucket="hour", z_threshold=3.0)
    flagged = [(str(r.bucket), r.n, r.z) for r in
               out.filter("is_anomaly").collect()]
    assert len(flagged) == 1 and flagged[0][0].startswith("2024-01-02 00")
    assert flagged[0][1] == 50

    # z matches numpy's sample-std z-score
    counts = np.array([5] * 24 + [50], dtype=float)
    z_ref = (50 - counts.mean()) / counts.std(ddof=1)
    assert abs(flagged[0][2] - round(z_ref, 4)) < 1e-9

    with pytest.raises(ValueError):
        event_rate_anomaly(df, bucket="fortnight")


def test_event_anomaly_constant_rate_is_all_zero(spark):
    from framequery_spark.operators.events import event_rate_anomaly

    rows = [(f"2024-01-01 {h:02d}:00:00", "view") for h in range(12)]
    df = spark.createDataFrame(rows, "ts string, event_type string") \
              .withColumn("ts", F.col("ts").cast("timestamp"))
    out = event_rate_anomaly(df, bucket="hour").collect()
    assert all(r.z == 0.0 and not r.is_anomaly for r in out)


def test_event_anomaly_sql_table_function(spark, tpch_scope):
    import framequery_spark as fq

    out = fq.execute(
        "SELECT * FROM event_anomaly('events', 'day', 2.0)",
        tpch_scope, spark=spark)
    assert {"event_type", "bucket", "n", "z", "is_anomaly"} \
        <= set(out.columns)
    assert out.count() > 0


# -------------------------------------------- round 9: exact ROC-AUC


def test_auc_perfect_and_random_rankers(spark):
    from framequery_spark.operators.classifier import auc_score

    # perfectly separated scores -> AUC 1; inverted -> 0
    rows = [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    assert auc_score(df, "y", "s").collect()[0].auc == 1.0
    inv = spark.createDataFrame([(y, -s) for y, s in rows],
                                "y boolean, s double")
    assert auc_score(inv, "y", "s").collect()[0].auc == 0.0


def test_auc_handles_ties_like_sklearn(spark):
    from framequery_spark.operators.classifier import auc_score

    # 2 pos at .5, 1 neg at .5 (ties), 1 neg at .1, 1 pos at .9
    rows = [(True, 0.5), (True, 0.5), (False, 0.5),
            (False, 0.1), (True, 0.9)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    r = auc_score(df, "y", "s").collect()[0]
    # sklearn roc_auc_score for this set = (2*1*2/2 + 1*1*... ) compute:
    # pairs: pos@.5 vs neg@.1 -> 2 wins; pos@.5 vs neg@.5 -> 2 ties (0.5
    # each); pos@.9 beats both negs -> 2 wins; total = (2 + 1 + 2) / 6
    assert r.auc == round((2 + 1 + 2) / 6, 6)
    assert (r.n_pos, r.n_neg) == (3, 2)


def test_auc_empty_class_is_null_and_validates(spark):
    from framequery_spark.operators.classifier import auc_score

    df = spark.createDataFrame([(True, 0.5), (True, 0.7), (None, 0.2)],
                               "y boolean, s double")
    r = auc_score(df, "y", "s").collect()[0]
    assert r.auc is None and (r.n_pos, r.n_neg) == (2, 0)
    with pytest.raises(ValueError, match="quantize"):
        auc_score(df, "y", "s", quantize=-1)


def test_retrieval_recall_counts_overlap(spark):
    from framequery_spark.operators.similarity import retrieval_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3),
         (2, 23, 4)],  # rank 4 must be ignored at k=3
        "query_id long, neighbor_id long, rank int")
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 77)],
        "query_id long, neighbor_id long")
    got = {r.query_id: (r.n_hits, r.recall)
           for r in retrieval_recall(approx, exact, k=3).collect()}
    assert got == {1: (2, round(2 / 3, 6)), 2: (0, 0.0)}
    with pytest.raises(ValueError, match="k must be"):
        retrieval_recall(approx, exact, k=0)


def test_ann_recall_exhaustive_config_is_perfect(spark, tpch_scope):
    from framequery_spark.operators.similarity import (cosine_topk,
                                                       lsh_ann_topk,
                                                       retrieval_recall)

    emb = tpch_scope["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    # n_bits=0 puts everything in one bucket: recall must be exactly 1
    approx = lsh_ann_topk(emb, q, k=5, n_bits=0, n_tables=1)
    exact = cosine_topk(emb, q, k=5)
    out = retrieval_recall(approx, exact, k=5).collect()
    assert len(out) == 5 and all(r.recall == 1.0 for r in out)


def test_confusion_stats_known_matrix(spark):
    from framequery_spark.operators.classifier import confusion_stats

    rows = [(True, 0.9), (True, 0.4), (False, 0.8), (False, 0.1),
            (None, 0.9), (True, None)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    r = confusion_stats(df, "y", "s", threshold=0.5).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 1, 1)
    assert r.accuracy == 0.5 and r.precision == 0.5 and r.recall == 0.5
    assert r.f1 == round(2 * 1 / (2 * 1 + 1 + 1), 6)


def test_confusion_stats_degenerate_denominators_null(spark):
    from framequery_spark.operators.classifier import confusion_stats

    df = spark.createDataFrame([(False, 0.1), (False, 0.2)],
                               "y boolean, s double")
    r = confusion_stats(df, "y", "s").collect()[0]
    assert r.precision is None and r.recall is None and r.f1 is None
    assert r.accuracy == 1.0


def test_calibration_bins_matches_python(spark):
    from framequery_spark.operators.classifier import calibration_bins

    rows = [(True, 0.95), (False, 0.92), (True, 1.0),   # bin 9
            (False, 0.05), (False, 0.01),               # bin 0
            (True, 0.55)]                               # bin 5
    df = spark.createDataFrame(rows, "y boolean, s double")
    got = {r.bin: (r.n, r.mean_score, r.frac_pos)
           for r in calibration_bins(df, "y", "s", bins=10).collect()}
    assert got[9] == (3, round((0.95 + 0.92 + 1.0) / 3, 6),
                      round(2 / 3, 6))
    assert got[0] == (2, round(0.06 / 2, 6), 0.0)
    assert got[5] == (1, 0.55, 1.0)
    with pytest.raises(ValueError, match="bins"):
        calibration_bins(df, "y", "s", bins=0)


def test_snapshot_diff_statuses(spark):
    from framequery_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C changed"), (4, "d")], "doc_id long, text string")
    got = {r.doc_id: r.status
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_fingerprint_normalizes_whitespace(spark):
    from framequery_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame([(1, "Hello   World ")],
                                "doc_id long, text string")
    new = spark.createDataFrame([(1, "hello world")],
                                "doc_id long, text string")
    assert snapshot_diff(old, new).collect()[0].status == "unchanged"


def test_event_transitions_known_chain(spark):
    from framequery_spark.operators.events import event_transitions

    rows = [(1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 00:01:00", "b"),
            (1, "2024-01-01 00:02:00", "a"),
            (1, "2024-01-01 00:03:00", "c"),
            (2, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 00:01:00", "b")]
    df = spark.createDataFrame(rows, "user_id long, ts string, "
                               "event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r.from_type, r.to_type): (r.n, r.prob)
           for r in event_transitions(df).collect()}
    # from 'a': a->b twice, a->c once; from 'b': b->a once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3  # no cross-user transition (user 2 -> user 1)


def test_event_transitions_topk_and_validation(spark, tpch_scope):
    from framequery_spark.operators.events import event_transitions

    ev = tpch_scope["events"]
    out = event_transitions(ev, top_k=3).collect()
    assert len(out) == 3
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)
    with pytest.raises(ValueError, match="top_k"):
        event_transitions(ev, top_k=0)


def test_stream_upsert_latest_equals_batch_argmax(spark, tmp_path):
    from framequery_spark.sources.testdata import load_tables
    from framequery_spark.streaming.stream import stream_upsert_latest

    sf = "/root/testdata/sf0.001"
    out = stream_upsert_latest(
        spark, f"{sf}/events.parquet",
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    got = sorted((r.user_id, r.event_id) for r in out.collect())
    ev = load_tables(spark, sf)["events"]
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                         F.col("event_id").desc())
    exp = sorted((r.user_id, r.event_id) for r in
                 ev.withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1").collect())
    assert got == exp
    # one row per key
    assert len({u for u, _ in got}) == len(got)


def test_rrf_fuse_known_values(spark):
    from framequery_spark.operators.retrieval import rrf_fuse

    sparse = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int")
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 99, 3)],
        "query_id long, doc_id long, rank int")
    got = {r.doc_id: (r.rrf_score, r.n_lists, r.rank)
           for r in rrf_fuse([sparse, dense], k=60, topk=10).collect()}
    # both-list docs beat single-list docs; 10 and 11 tie exactly
    # (1/61 + 1/62 both ways) -> doc_id ascending breaks the tie
    s_both = round(1 / 61 + 1 / 62, 6)
    assert got[10] == (s_both, 2, 1)
    assert got[11] == (s_both, 2, 2)
    assert got[12] == (round(1 / 63, 6), 1, 3)
    assert got[99] == (round(1 / 63, 6), 1, 4)


def test_rrf_fuse_topk_cut_and_partition_invariance(spark):
    from framequery_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, d, d) for d in range(1, 9)],
                              "query_id long, doc_id long, rank int")
    b = spark.createDataFrame([(1, d + 4, d) for d in range(1, 9)],
                              "query_id long, doc_id long, rank int")
    out = rrf_fuse([a, b], k=60, topk=3).collect()
    assert len(out) == 3 and [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    again = rrf_fuse([a.repartition(7), b.repartition(3)], k=60, topk=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rrf_fuse_validation(spark):
    from framequery_spark.operators.retrieval import rrf_fuse

    df = spark.createDataFrame([(1, 1, 1)],
                               "query_id long, doc_id long, rank int")
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([df])
    with pytest.raises(ValueError, match="k and topk"):
        rrf_fuse([df, df], k=0)


def _py_ndcg(results, qrels, k):
    """Independent float mirror: results = {q: [doc by rank]},
    qrels = {(q, doc): rel}."""
    out = {}
    qs = {q for q, _ in qrels}
    for q in qs:
        dcg = sum((2 ** qrels.get((q, d), 0) - 1) / (math.log(p + 2) / math.log(2))
                  for p, d in enumerate(results.get(q, [])[:k]))
        rels = sorted((r for (qq, _), r in qrels.items() if qq == q and r > 0),
                      reverse=True)[:k]
        idcg = sum((2 ** r - 1) / (math.log(p + 2) / math.log(2))
                   for p, r in enumerate(rels))
        out[q] = (dcg, idcg, dcg / idcg if idcg > 0 else 0.0)
    return out


def test_ndcg_known_values_match_python(spark):
    from framequery_spark.operators.retrieval import ndcg_at_k

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rank int")
    qrels = spark.createDataFrame(
        [(1, 11, 3), (1, 12, 1), (1, 13, 2),   # 10 unjudged, 13 missed
         (2, 99, 2),                            # query 2 finds nothing
         (3, 30, 1)],                           # query 3 has no results
        "query_id long, neighbor_id long, rel int")
    got = {r.query_id: (r.dcg, r.idcg, r.ndcg)
           for r in ndcg_at_k(results, qrels, k=3).collect()}
    exp = _py_ndcg({1: [10, 11, 12], 2: [20, 21]},
                   {(1, 11): 3, (1, 12): 1, (1, 13): 2,
                    (2, 99): 2, (3, 30): 1}, k=3)
    assert set(got) == {1, 2, 3}
    for q in got:
        for a, b in zip(got[q], exp[q]):
            assert a == pytest.approx(b, abs=2e-6), q
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(results, qrels, k=0)


def test_ndcg_perfect_ranking_is_one(spark):
    from framequery_spark.operators.retrieval import ndcg_at_k

    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 2), (1, 12, 1)],
        "query_id long, neighbor_id long, rel int")
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int")
    r = ndcg_at_k(results, qrels, k=3).collect()[0]
    assert r.ndcg == 1.0 and r.dcg == r.idcg > 0


def _py_winnow(text, k=3, w=4):
    ws = text.strip().split()
    grams = [" ".join(ws[i:i + k]) for i in range(max(len(ws) - k + 1, 0))]
    hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
    n = len(hs)
    if n == 0:
        return set()
    sel = set()
    for s in range(0, max(n - w + 1, 1)):
        mn = min(hs[s:s + w])
        pos = max(p for p in range(s, min(s + w, n)) if hs[p] == mn)
        sel.add((pos, mn))
    return sel


def test_winnow_fingerprints_match_python(spark, docs):
    got = {}
    for r in DD.winnow_fingerprints(docs.filter(F.col("doc_id") < 60)).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for r in docs.filter(F.col("doc_id") < 60).collect():
        assert got.get(r.doc_id, set()) == _py_winnow(r.text), r.doc_id


def test_winnow_fp_set_equals_fingerprint_set(spark, docs):
    # the min-only pair-key pass (r12) must select exactly the distinct
    # fingerprint VALUES of the positioned pass, for several window/k
    # shapes including degenerate short docs
    deg = spark.createDataFrame(
        [(1001, ""), (1002, "one"), (1003, "one two three"),
         (1004, "a b c d e f g h")],
        "doc_id long, text string")
    for frame in (docs.filter(F.col("doc_id") < 80), deg):
        for k, w in ((3, 4), (2, 2), (1, 3)):
            full = {(r.doc_id, r.fp) for r in DD.winnow_fingerprints(
                frame, "doc_id", "text", k, w).collect()}
            mins = [(r.doc_id, r.fp) for r in DD._winnow_fp_set(
                frame, "doc_id", "text", k, w).collect()]
            assert set(mins) == full, (k, w)
            # per-doc distinct already: no duplicate (id, fp) rows
            assert len(mins) == len(set(mins)), (k, w)


def test_winnow_degenerate_docs(spark):
    deg = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two three"), (4, "a b c d e f")],
        "doc_id long, text string")
    got = {}
    for r in DD.winnow_fingerprints(deg).collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.fp))
    # no grams -> no fingerprints; 1..window-1 grams -> exactly one
    assert 1 not in got and 2 not in got
    assert len(got[3]) == 1 and len(got[4]) == 1
    with pytest.raises(ValueError, match="window must be"):
        DD.winnow_fingerprints(deg, window=0)


def test_winnow_shared_substring_guarantee(spark):
    # MOSS guarantee: a common substring of >= window + k - 1 words (here
    # 4 + 3 - 1 = 6) always yields a shared fingerprint hash
    common = "quick brown fox jumps over the"
    df = spark.createDataFrame(
        [(1, f"aa bb cc {common} dd ee"),
         (2, f"xx yy {common} zz ww vv uu")],
        "doc_id long, text string")
    fp1 = {r.fp for r in DD.winnow_fingerprints(df.filter("doc_id = 1")).collect()}
    fp2 = {r.fp for r in DD.winnow_fingerprints(df.filter("doc_id = 2")).collect()}
    assert fp1 & fp2


def test_winnow_pairs_doc_freq_cap(spark):
    boiler = "this exact boilerplate footer appears on every single page"
    rows = [(i, f"unique{i} body{i} words{i} {boiler}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = DD.winnow_pairs(df, min_shared=1).count()
    # cap=1 removes every fingerprint selected by more than one doc — no
    # shared fingerprints can survive, so no pairs (cap counts SELECTED
    # fingerprints: a boilerplate gram picked by only 2 docs' windows
    # legitimately survives a looser cap)
    capped = DD.winnow_pairs(df, min_shared=1, max_doc_freq=1).count()
    assert uncapped == 15 and capped == 0  # 6 choose 2, then all capped away
    with pytest.raises(ValueError, match="min_shared"):
        DD.winnow_pairs(df, min_shared=0)


def test_containment_catches_embedded_doc(spark):
    sub = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [(1, sub),
         (2, f"{sub} zeta eta theta iota kappa lambda mu nu xi"),
         (3, "unrelated words entirely different content here")],
        "doc_id long, text string")
    cont = DD.containment_pairs(df, threshold=0.9).collect()
    assert [(r.id1, r.id2, r.containment) for r in cont] == [(1, 2, 1.0)]
    assert cont[0].n1 == 3 and cont[0].n2 == 12
    # the same pair is invisible to Jaccard at any usable threshold
    assert DD.jaccard_pairs(df, threshold=0.5).count() == 0


def test_containment_matches_python(spark, docs):
    sample = docs.filter(F.col("doc_id") < 100)
    got = {(r.id1, r.id2): (r.n1, r.n2, r.containment)
           for r in DD.containment_pairs(sample, threshold=0.6).collect()}
    sh = {r.doc_id: _py_shingles(r.text) for r in sample.collect()}
    ids = sorted(sh)
    expect = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            inter = len(sh[d1] & sh[d2])
            mn = min(len(sh[d1]), len(sh[d2]))
            if mn and inter / mn >= 0.6:
                expect[(d1, d2)] = (len(sh[d1]), len(sh[d2]),
                                    round(inter / mn, 4))
    assert got == expect


def _py_kmeans(vecs, init, iters):
    from decimal import Decimal

    cents = [list(map(float, c)) for c in init]
    members = {}
    for _ in range(iters):
        assign = []
        for row in vecs:
            best = None
            for ci, c in enumerate(cents):
                c2 = 0.0
                for x in c:
                    c2 += x * x
                vv = 0.0
                for a in row:
                    vv += a * a
                vc = 0.0
                for a, b in zip(row, c):
                    vc += a * b
                d = round(vv - 2 * vc + c2, 6)
                if best is None or (d, ci) < best:
                    best = (d, ci)
            assign.append(best[1])
        new = [list(c) for c in cents]
        members = {}
        for ci in range(len(cents)):
            rows = [vecs[i] for i, a in enumerate(assign) if a == ci]
            if rows:
                members[ci] = len(rows)
                for d in range(len(cents[0])):
                    s = sum((Decimal(str(float(r[d])))
                             .quantize(Decimal("1." + "0" * 12))
                             for r in rows), Decimal(0))
                    new[ci][d] = round(float(s) / len(rows), 6)
        cents = new
    return cents, members


def test_kmeans_fit_matches_python(spark, emb):
    from framequery_spark.operators.similarity import (
        fixed_random_centroids, kmeans_fit)

    init = fixed_random_centroids(3, 64, seed=7)
    got = {(r.cluster_id, r.dim): (r.value, r.n_members)
           for r in kmeans_fit(emb, 3, iters=2, init=init).collect()}
    vecs = [[float(x) for x in r.embedding]
            for r in emb.orderBy("vec_id").collect()]
    cents, members = _py_kmeans(vecs, init, iters=2)
    assert len(got) == 3 * 64
    for (ci, d), (v, n) in got.items():
        assert v == pytest.approx(cents[ci][d], abs=2e-6), (ci, d)
        assert n == members.get(ci, 0), ci


def test_kmeans_fit_empty_cluster_carries_init(spark):
    from framequery_spark.operators.similarity import kmeans_fit

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [10.0, 10.0])],
        "vec_id long, embedding array<double>")
    init = [[0.0, 0.0], [10.0, 10.0], [99.0, 99.0]]
    rows = kmeans_fit(df, 3, iters=2, init=init).collect()
    by = {(r.cluster_id, r.dim): r for r in rows}
    assert by[(2, 0)].value == 99.0 and by[(2, 0)].n_members == 0
    assert by[(0, 0)].value == pytest.approx(0.05) and by[(0, 0)].n_members == 2
    assert by[(1, 0)].value == 10.0 and by[(1, 0)].n_members == 1


def test_kmeans_fit_partition_invariant(spark, emb):
    from framequery_spark.operators.similarity import (
        fixed_random_centroids, kmeans_fit)

    init = fixed_random_centroids(2, 64, seed=11)
    a = sorted(map(tuple, kmeans_fit(emb, 2, iters=1, init=init).collect()))
    b = sorted(map(tuple,
                   kmeans_fit(emb.repartition(13), 2, iters=1,
                              init=init).collect()))
    assert a == b
    with pytest.raises(ValueError, match="n_clusters"):
        kmeans_fit(emb, 0, init=init)
    with pytest.raises(ValueError, match="len\\(init\\)"):
        kmeans_fit(emb, 3, init=init)


def test_dedup_pair_quality_known_counts(spark):
    approx = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (4, 5)],  # duplicate collapses
        "id1 long, id2 long")
    exact = spark.createDataFrame(
        [(1, 2), (4, 5), (6, 7)], "id1 long, id2 long")
    r = DD.dedup_pair_quality(approx, exact).collect()[0]
    assert (r.n_approx, r.n_exact, r.n_hit) == (3, 3, 2)
    assert r.precision == r.recall == round(2 / 3, 6)
    assert r.f1 == round(2 * 2 / 6, 6)


def test_dedup_pair_quality_zero_denominators_null(spark):
    empty = spark.createDataFrame([], "id1 long, id2 long")
    exact = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    r = DD.dedup_pair_quality(empty, exact).collect()[0]
    assert (r.n_approx, r.n_hit) == (0, 0)
    assert r.precision is None and r.recall == 0.0 and r.f1 is None


def test_near_dup_facade_normalizes_every_method(spark, docs):
    """near_dup_pairs: uniform (id1, id2, score) contract across the
    whole candidate->verify family."""
    import framequery_spark.operators.dedup as DD

    sub = docs.limit(60)
    for method, knobs in [
        ("jaccard", {"threshold": 0.7}),
        ("containment", {"threshold": 0.8}),
        ("minhash", {"num_perm": 32, "bands": 16, "threshold": 0.7}),
        ("winnow", {"min_shared": 3, "max_doc_freq": 20}),
        ("simhash", {"max_hamming": 3}),
    ]:
        out = DD.near_dup_pairs(sub, method=method, **knobs)
        assert out.columns == ["id1", "id2", "score"], method
        rows = out.collect()
        assert all(r.id1 < r.id2 for r in rows), method
    with pytest.raises(ValueError, match="unknown near-dup method"):
        DD.near_dup_pairs(sub, method="nope")
    from framequery_spark.operators.cache import release_cached

    release_cached()


def test_near_dup_config_sweep_matches_individual_gates(spark, docs):
    """The sweep's per-config row equals running dedup_pair_quality by
    hand for that config against the same truth."""
    import framequery_spark.operators.dedup as DD

    sweep = DD.near_dup_config_sweep(docs, {
        "containment_08": ("containment", {"k": 3, "threshold": 0.8}),
        "winnow_w4": ("winnow", {"k": 3, "window": 4, "min_shared": 3,
                                 "max_doc_freq": 20}),
    }).collect()
    assert [r.config for r in sorted(sweep, key=lambda r: r.config)] == \
        ["containment_08", "winnow_w4"]
    exact = DD.jaccard_pairs(docs, k=3, threshold=0.7)
    solo = DD.dedup_pair_quality(
        DD.winnow_pairs(docs, k=3, window=4, min_shared=3,
                        max_doc_freq=20), exact).collect()[0]
    sweep_w = [r for r in sweep if r.config == "winnow_w4"][0]
    for f in ("n_approx", "n_exact", "n_hit", "precision", "recall", "f1"):
        assert getattr(sweep_w, f) == getattr(solo, f), f
    with pytest.raises(ValueError, match="configs is empty"):
        DD.near_dup_config_sweep(docs, {})
    from framequery_spark.operators.cache import release_cached

    release_cached()


def test_stream_upsert_contract_equals_engine_merge_into(spark, tmp_path):
    """Pin the documented claim (streaming/stream.py stream_upsert_latest:
    'at production scale this foreachBatch body is one MERGE INTO
    delta/iceberg statement'): replay the SAME deterministic 3-batch
    sequence through (a) the foreachBatch upsert sink and (b) the
    engine's own conditional-arm MERGE INTO, and assert the final keyed
    tables are identical row for row."""
    import glob
    import os
    import shutil

    import framequery_spark as fq
    from framequery_spark.sources.testdata import load_tables
    from framequery_spark.streaming.stream import stream_upsert_latest

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    slices = []
    for i in range(3):
        sl = ev.filter(F.col("event_id") % 3 == i)
        slices.append(sl)
        tmp_out = str(tmp_path / f"slice{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        part = glob.glob(tmp_out + "/part-*.parquet")[0]
        dst = str(stream_dir / f"b{i}.parquet")
        shutil.copy(part, dst)
        # FileStreamSource orders files oldest-mtime-first: make the
        # replay order b0, b1, b2 explicit
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))

    got = stream_upsert_latest(
        spark, str(stream_dir), out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1)
    got_rows = sorted(tuple(r) for r in
                      got.select("user_id", "event_id", "ts").collect())

    # engine MERGE INTO over the same batch sequence: target starts as
    # batch 0's per-key latest, then each later batch merges with the
    # same (ts, event_id) latest-wins arms the sink implements
    ex = fq.Executor({f"b{i}": s for i, s in enumerate(slices)},
                     spark=spark)
    ex.execute("CREATE TABLE tgt AS SELECT DISTINCT ON (user_id) * "
               "FROM b0 ORDER BY user_id, ts DESC, event_id DESC")
    for i in (1, 2):
        ex.execute(f"""
            MERGE INTO tgt USING (
                SELECT DISTINCT ON (user_id) * FROM b{i}
                ORDER BY user_id, ts DESC, event_id DESC) s
            ON tgt.user_id = s.user_id
            WHEN MATCHED AND (s.ts > tgt.ts
                              OR (s.ts = tgt.ts
                                  AND s.event_id > tgt.event_id))
              THEN UPDATE SET event_id = s.event_id, ts = s.ts,
                              event_type = s.event_type, value = s.value,
                              props = s.props
            WHEN NOT MATCHED THEN
              INSERT VALUES (s.event_id, s.ts, s.user_id, s.event_type,
                             s.value, s.props)
        """)
    merged = ex.execute("SELECT user_id, event_id, ts FROM tgt")
    merged_rows = sorted(tuple(r) for r in merged.collect())

    assert got_rows == merged_rows
    assert len({u for u, _, _ in got_rows}) == len(got_rows)  # 1 row/key
    # multi-batch actually happened (otherwise the contract test proves
    # nothing about cross-batch merge semantics)
    assert len(got_rows) < sum(s.count() for s in slices)
