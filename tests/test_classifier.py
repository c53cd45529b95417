"""Hashed n-gram logistic-regression quality classifier
(operators/classifier.py): python cross-checks, bit-determinism under
repartitioning, separability, and the bounded-collect contract."""

import hashlib
import math

import pandas as pd
import pytest

from framequery_spark.operators.classifier import (
    doc_tf, lr_score, lr_train, quality_classifier_scores)

N_BUCKETS = 64


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _py_tf(text: str) -> dict:
    toks = text.lower().strip().split()
    grams = list(toks) + [" ".join(toks[i:i + 2])
                          for i in range(len(toks) - 1)]
    counts = {}
    for g in grams:
        b = _bucket(g)
        counts[b] = counts.get(b, 0) + 1
    tot = sum(counts.values())
    return {b: c / tot for b, c in counts.items()}


DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5, 6],
    "text": ["good clean prose here", "good solid clean text",
             "clean good writing style", "spam spam buy now",
             "buy spam click now", "now spam buy clicks"],
    "y": [1, 1, 1, 0, 0, 0],
})


def _py_train(docs, iters, lr=0.5):
    feats = {r.doc_id: _py_tf(r.text) for r in docs.itertuples()}
    ys = dict(zip(docs.doc_id, docs.y))
    n = len(ys)  # ALL training rows, matching lr_train's 1/N convention
    w = [0.0] * N_BUCKETS
    for _ in range(iters):
        grad = [0.0] * N_BUCKETS
        for d, tf in feats.items():
            m = sum(w[b] * v for b, v in sorted(tf.items()))
            r = 1.0 / (1.0 + math.exp(-m)) - ys[d]
            for b, v in tf.items():
                grad[b] += r * v
        for b in range(N_BUCKETS):
            w[b] -= lr * grad[b] / n
    return w, feats


def test_doc_tf_matches_python(spark):
    sdf = spark.createDataFrame(DOCS)
    got = {(r["doc_id"], r["bucket"]): r["tf"]
           for r in doc_tf(sdf, n_buckets=N_BUCKETS).collect()}
    for row in DOCS.itertuples():
        for b, v in _py_tf(row.text).items():
            assert got[(row.doc_id, b)] == pytest.approx(v, abs=1e-12)
    assert len(got) == sum(len(_py_tf(r.text)) for r in DOCS.itertuples())


def test_train_matches_python_closed_form(spark):
    sdf = spark.createDataFrame(DOCS)
    for iters in (1, 3):
        w = lr_train(sdf, "y", n_buckets=N_BUCKETS, iters=iters, lr=0.5)
        pw, _ = _py_train(DOCS, iters)
        assert w == pytest.approx(pw, abs=1e-8)


def test_training_is_bit_deterministic_across_partitioning(spark):
    sdf = spark.createDataFrame(DOCS)
    w1 = lr_train(sdf, "y", n_buckets=N_BUCKETS, iters=2)
    w2 = lr_train(sdf.repartition(7), "y", n_buckets=N_BUCKETS, iters=2)
    assert w1 == w2  # exact — decimal-quantized sums


def test_classifier_separates_seed_from_spam(spark):
    sdf = spark.createDataFrame(DOCS)
    out = quality_classifier_scores(sdf, "y", n_buckets=N_BUCKETS,
                                    iters=5).collect()
    probs = {r["doc_id"]: r["prob"] for r in out}
    assert min(probs[d] for d in (1, 2, 3)) > max(probs[d]
                                                  for d in (4, 5, 6))


def test_score_with_given_weights_and_empty_text(spark):
    sdf = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["good clean", "   "]}))
    w = [0.0] * N_BUCKETS
    for b in _py_tf("good clean"):
        w[b] = 1.0
    out = {r["doc_id"]: (r["margin"], r["prob"])
           for r in lr_score(sdf, w, n_buckets=N_BUCKETS).collect()}
    # doc 1: every feature weighted 1 -> margin == sum(tf) == 1
    assert out[1][0] == pytest.approx(1.0, abs=1e-9)
    # empty text: no features -> margin 0, prob 0.5
    assert out[2] == (0.0, 0.5)


def test_weight_length_validation(spark):
    sdf = spark.createDataFrame(DOCS)
    with pytest.raises(ValueError, match="n_buckets"):
        lr_score(sdf, [0.0] * 8, n_buckets=16)


def test_nothing_left_cached(spark):
    # quality_classifier_scores intentionally leaves its shared tf
    # tracked for the harness to release; standalone lr_train must
    # clean up its own (release_one)
    from framequery_spark.operators.cache import _TRACKED, release_cached

    release_cached()  # drop leftovers from earlier tests (convention)
    sdf = spark.createDataFrame(DOCS)
    lr_train(sdf, "y", n_buckets=N_BUCKETS, iters=2)
    assert not _TRACKED
