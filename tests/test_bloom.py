"""Bloom-filter incremental dedup: exact equivalence with the plain anti
join (no false negatives by construction), pruning effectiveness, and
parameter validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from framequery_spark.operators.bloom import (
    bloom_dedup_against, build_bloom_words, suggest_params)


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_equivalent_to_anti_join(docs):
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    got = sorted(r["doc_id"] for r in
                 bloom_dedup_against(new, corpus, ["text"]).collect())
    want = sorted(r["doc_id"] for r in
                  new.join(corpus.select("text").distinct(),
                           on="text", how="left_anti").collect())
    assert got == want


def test_no_false_negatives_all_dups_dropped(docs):
    # new == corpus: every row is a duplicate; the result must be empty no
    # matter how small (collision-prone) the filter is.
    small = docs.limit(50)
    out = bloom_dedup_against(small, small, ["text"],
                              num_bits=256, num_hashes=2)
    assert out.count() == 0


def test_bitset_build_and_probe_agree(docs):
    # every corpus key must probe positive against the built bitset
    corpus = docs.limit(100)
    bits = build_bloom_words(corpus, ["text"], num_bits=1 << 16,
                             num_hashes=4)
    assert bits.dtype == np.uint64
    assert int(bits.sum()) != 0
    out = bloom_dedup_against(corpus, corpus, ["text"], num_bits=1 << 16,
                              num_hashes=4)
    assert out.count() == 0


def test_pruning_effectiveness(docs):
    # disjoint batch vs corpus: at fpp-scale bits, most rows must take the
    # no-join path (bloom-negative). Verify via the filter directly.
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    n_new = new.count()
    bits, k = suggest_params(corpus.count(), fpp=0.01)
    surv = bloom_dedup_against(new, corpus, ["doc_id"],
                               num_bits=bits, num_hashes=k)
    # doc_id keys are disjoint, so everything survives...
    assert surv.count() == n_new


def test_suggest_params():
    bits, k = suggest_params(1_000_000, fpp=0.01)
    assert 9_000_000 < bits < 11_000_000  # ~9.6M bits for 1M keys @ 1%
    assert 5 <= k <= 9
    with pytest.raises(ValueError):
        suggest_params(10, fpp=0.0)


def test_num_bits_bounds(docs):
    with pytest.raises(ValueError):
        build_bloom_words(docs.limit(1), ["text"], num_bits=32, num_hashes=1)
