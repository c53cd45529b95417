"""fastText-style quality classifier: hashed n-gram logistic regression.

The CCNet / GPT-3 / LLaMA data pipelines all filter with a linear
classifier over hashed n-gram features (seed "good" corpus vs random
crawl). This is that operator, Spark-first and beyond-reference surface
(the reference engine has no ML ops):

- features are :func:`framequery_spark.operators.dsir.doc_features`
  (uni+bigram md5 buckets — engine-exact in any md5-capable engine),
  L1-normalized per document so margins stay bounded;
- TRAINING is distributed: each iteration is one broadcast weight join +
  one per-doc margin aggregate + one per-bucket gradient aggregate
  (<= n_buckets rows, the only collect — bounded by construction, same
  O(features) driver state every LR trainer holds). Margin and gradient
  terms are quantized to DECIMAL(28,12) before summing, so aggregation
  order cannot drift the result: training is bit-deterministic at any
  partitioning;
- SCORING is one broadcast join + one grouped sum — corpus-size
  independent shuffle width (the feature table shuffles on doc id once).

At 100 TB the feature table is the big object; everything keyed on it is
an equi shuffle on (id, bucket) with map-side combine, and the weight
side stays <= n_buckets rows, always broadcast. One gradient step from
zero init has a closed form (sigmoid(0) = 1/2), which the driver entry
exploits for a full cross-engine differential against DuckDB.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.local_relation import local_relation
from .cache import persist_tracked, release_one
from .dsir import doc_features

# decimal quantization for order-independent float sums (the repo-wide
# idiom: round each term, sum exactly)
_DEC = "decimal(28,12)"


def _q12(c):
    return F.round(c, 12).cast(_DEC)


def doc_tf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           n_buckets: int = 4096,
           ngram_sizes: Sequence[int] = (1, 2)) -> DataFrame:
    """(id, bucket, tf): L1-normalized hashed n-gram features.

    ONE shuffle: the L1 denominator (per-doc total gram occurrences) is
    the SIZE of the gram array, known row-locally BEFORE the explode, so
    it rides through the (id, total, bucket) groupBy as a grouping key —
    no second aggregate and no per-doc totals join (the previous shape
    re-shuffled the whole feature table just to attach a count the scan
    already knew; sum(cnt) per doc == exploded row count == array size
    by construction, so the values are identical)."""
    from .dedup import _spread
    from .dsir import _grams_with_repeats, bucket_of

    grams_arr = F.concat(*[_grams_with_repeats(F.col(text_col), n)
                           for n in ngram_sizes])
    ex = (_spread(df)
          .select(F.col(id_col), grams_arr.alias("__ga"))
          .select(F.col(id_col), F.size("__ga").alias("__tot"),
                  F.explode("__ga").alias("__gram")))
    return (ex.select(F.col(id_col), "__tot",
                      bucket_of(F.col("__gram"), n_buckets).alias("bucket"))
            .groupBy(id_col, "__tot", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(id_col, "bucket",
                    (F.col("cnt") / F.col("__tot")).alias("tf")))


def _weights_df(spark, weights, partial: bool = False):
    """<= n_buckets-row (bucket, w) frame, always broadcast. `partial`
    drops zero weights (zero-init first iteration: margin is 0 anyway)."""
    rows = [(b, float(w)) for b, w in enumerate(weights)
            if not (partial and w == 0.0)]
    # LocalTableScan (not parallelize): the weight frame is re-scanned by
    # every margin/gradient job, and a Python-RDD scan pays per-slice
    # Python-worker round trips each time (r12 local_relation measurement)
    df = local_relation(spark, rows or [(0, 0.0)], "bucket long, w double")
    return F.broadcast(df)


def lr_margins(tf_df: DataFrame, weights, spark,
               id_col: str = "doc_id") -> DataFrame:
    """(id, margin): decimal-exact dot product of per-doc tf with the
    broadcast weight vector."""
    w = _weights_df(spark, weights)
    return (tf_df.join(w, "bucket")
            .groupBy(id_col)
            .agg(F.sum(_q12(F.col("tf") * F.col("w")))
                 .cast("double").alias("margin")))


def lr_train(df: DataFrame, label_col: str, text_col: str = "text",
             id_col: str = "doc_id", n_buckets: int = 4096,
             ngram_sizes: Sequence[int] = (1, 2), iters: int = 5,
             lr: float = 0.5, l2: float = 0.0,
             tf_df: Optional[DataFrame] = None,
             spark=None) -> "list[float]":
    """Train logistic-regression weights on `df` (label_col: 0/1) and
    return them as a Python list of length n_buckets (the driver-side
    model state — n_buckets floats, the same bounded footprint every LR
    trainer keeps). Deterministic: zero init, decimal-quantized sums,
    fixed iteration count — bit-identical at any partitioning.

    `tf_df`: a precomputed (and typically caller-persisted) doc_tf
    result — pass it when scoring follows training so the gram
    explosion runs ONCE for the whole train+score pipeline; the caller
    then owns its lifetime. Without it, lr_train persists its own and
    releases exactly that one (release_one) before returning."""
    spark = spark or df.sparkSession
    own = tf_df is None
    if own:
        tf_df = persist_tracked(
            doc_tf(df, text_col=text_col, id_col=id_col,
                   n_buckets=n_buckets, ngram_sizes=ngram_sizes))
    feats = tf_df.join(
        df.select(id_col,
                  F.col(label_col).cast("double").alias("__y")), id_col)
    try:
        # gradient normalizer = ALL training rows (a featureless doc —
        # empty text — contributes zero gradient but still counts, the
        # standard 1/N convention; also what the driver oracle states).
        # Computed INSIDE the first gradient job (broadcast 1-row
        # aggregate cross-joined onto the <= n_buckets gradient rows)
        # instead of as a separate up-front action: the count stage runs
        # concurrently with the feature pipeline and saves one serial
        # driver round trip per training call. The null-id adjustment
        # keeps count(distinct)+has-null == distinct().count() exactly.
        n_docs_expr = (
            F.countDistinct(F.col(id_col))
            + F.coalesce(F.max(F.when(F.col(id_col).isNull(), 1)
                               .otherwise(0)), F.lit(0))).alias("__n")
        n_docs: Optional[int] = None
        weights = [0.0] * n_buckets
        for it in range(iters):
            if it == 0:
                # zero init: every margin is 0, sigmoid(0) = 1/2
                resid = feats.select(
                    id_col, (F.lit(0.5) - F.col("__y")).alias("__r"),
                    "bucket", "tf")
            else:
                w = _weights_df(spark, weights, partial=True)
                margins = (feats.join(w, "bucket")
                           .groupBy(id_col)
                           .agg(F.sum(_q12(F.col("tf") * F.col("w")))
                                .cast("double").alias("__m")))
                # LEFT join: a doc whose every bucket weight is zero has
                # no margin row under the partial weight frame but still
                # contributes residual sigmoid(0) - y
                resid = (feats.join(margins, id_col, "left")
                         .select(id_col,
                                 (F.lit(1.0)
                                  / (F.lit(1.0)
                                     + F.exp(-F.coalesce(F.col("__m"),
                                                         F.lit(0.0))))
                                  - F.col("__y")).alias("__r"),
                                 "bucket", "tf"))
            grad_plan = (resid
                         .groupBy("bucket")
                         .agg(F.sum(_q12(F.col("__r") * F.col("tf")))
                              .cast("double").alias("__s")))
            if n_docs is None:
                grad = grad_plan.crossJoin(
                    F.broadcast(df.agg(n_docs_expr))).collect()
                if grad:
                    n_docs = int(grad[0]["__n"])
                else:
                    # featureless corpus (or empty frame): the gradient
                    # has no rows to carry the count — fall back to the
                    # standalone action to distinguish the two
                    n_docs = df.select(id_col).distinct().count()
                if n_docs == 0:
                    raise ValueError("lr_train: empty training frame")
            else:
                grad = grad_plan.collect()
            # <= n_buckets rows by construction; the division by n_docs
            # happens here in python — float(sum)/int is the same IEEE754
            # double as the previous cast("double")/lit division in SQL
            for row in grad:
                b = int(row["bucket"])
                if not 0 <= b < n_buckets:
                    raise ValueError(
                        f"lr_train: tf_df bucket {b} out of range for "
                        f"n_buckets={n_buckets} — the precomputed table "
                        "was hashed with a different bucket count")
                weights[b] -= lr * (row["__s"] / n_docs + l2 * weights[b])
    finally:
        if own:
            release_one(tf_df)
    return weights


def lr_score(df: DataFrame, weights, text_col: str = "text",
             id_col: str = "doc_id", n_buckets: Optional[int] = None,
             ngram_sizes: Sequence[int] = (1, 2),
             tf_df: Optional[DataFrame] = None,
             spark=None) -> DataFrame:
    """(id, margin, prob): classifier scores for every document — one
    broadcast weight join over the hashed features, one grouped decimal
    sum. Documents with no features (empty text) score margin 0.
    `tf_df` as in lr_train (reuse the cached feature table)."""
    spark = spark or df.sparkSession
    n_buckets = n_buckets if n_buckets is not None else len(weights)
    if n_buckets != len(weights):
        raise ValueError("n_buckets must match len(weights)")
    if tf_df is None:
        tf_df = doc_tf(df, text_col=text_col, id_col=id_col,
                       n_buckets=n_buckets, ngram_sizes=ngram_sizes)
    margins = lr_margins(tf_df, weights, spark, id_col=id_col)
    out = (df.select(id_col).join(margins, id_col, "left")
           .select(id_col,
                   F.coalesce(F.col("margin"), F.lit(0.0)).alias("margin")))
    return out.withColumn(
        "prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))


def quality_classifier_scores(df: DataFrame, label_col: str,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              n_buckets: int = 4096,
                              iters: int = 5, lr: float = 0.5,
                              spark=None) -> DataFrame:
    """Train on the labeled frame, score every row of it: the one-call
    seed-classifier filter (label 1 = seed/"good" corpus). One gram
    pass total: the tf table is persisted once and shared by training
    and the returned (lazy) scoring plan — the caller releases it after
    materializing, via the release_cached() harness convention."""
    tf = persist_tracked(doc_tf(df, text_col=text_col, id_col=id_col,
                                n_buckets=n_buckets))
    weights = lr_train(df, label_col, text_col=text_col, id_col=id_col,
                       n_buckets=n_buckets, iters=iters, lr=lr,
                       tf_df=tf, spark=spark)
    return lr_score(df, weights, text_col=text_col, id_col=id_col,
                    n_buckets=n_buckets, tf_df=tf, spark=spark)


def auc_score(df: DataFrame, label_col: str, score_col: str,
              quantize: int = 6) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` as a ranker of the boolean/0-1
    ``label_col`` — the evaluation half of the quality-classifier loop
    (is the filter's score actually separating good from bad?).

    Computed as the tie-corrected Mann-Whitney U over a QUANTIZED score
    grid: scores collapse onto floor(score * 10^quantize) cells (exact
    IEEE floor, the ks_drift discipline), and

        AUC = sum_g [ neg_below(g) * pos(g) + neg(g) * pos(g) / 2 ]
              / (n_pos * n_neg)

    with cumulative counts over the ascending grid. The numerator is
    kept as the INTEGER 2*neg_below*pos + neg*pos; no float appears
    until the final single row, so the value restates bit-exact in SQL.
    Quantization only merges scores closer than 10^-quantize — ties the
    correction term already handles.

    Returns one row (n_pos, n_neg, auc_num2, auc). NULL labels/scores
    are excluded; AUC is NULL when either class is empty.

    Scale shape: one groupBy on the quantized score (state bounded by
    the score's quantized range, not row count), one cumsum window over
    that bounded grid, a single-row final aggregate.
    """
    if quantize < 0:
        raise ValueError("auc_score: quantize must be >= 0")
    scale = float(10 ** quantize)
    y = F.col(label_col).cast("boolean")
    s = F.col(score_col).cast("double")
    grid = (df.filter(y.isNotNull() & s.isNotNull())
            .groupBy(F.floor(s * F.lit(scale)).cast("long").alias("g"))
            .agg(F.sum(F.when(y, 1).otherwise(0)).alias("pos"),
                 F.sum(F.when(y, 0).otherwise(1)).alias("neg")))
    w = (Window.orderBy("g")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = grid.select(
        "g", "pos", "neg",
        (F.sum("neg").over(w) - F.col("neg")).alias("neg_below"))
    agg = cum.agg(
        F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg"),
        F.sum(F.lit(2) * F.col("neg_below") * F.col("pos")
              + F.col("neg") * F.col("pos")).alias("auc_num2"))
    return agg.select(
        "n_pos", "n_neg", "auc_num2",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.round(F.col("auc_num2").cast("double")
                       / (2.0 * F.col("n_pos") * F.col("n_neg")), 6))
        .alias("auc"))


def confusion_stats(df: DataFrame, label_col: str, score_col: str,
                    threshold: float = 0.5) -> DataFrame:
    """Thresholded binary-classification quality: one row of
    (tp, fp, fn, tn, accuracy, precision, recall, f1) for
    ``score >= threshold`` against the boolean label — the operating-
    point companion to :func:`auc_score`'s ranking view.

    All four cells are one conditional-sum aggregate (map-side combine,
    single-row result); the ratios derive from exact integers, rounded
    to 1e-6, NULL when their denominator is 0. NULL labels/scores are
    excluded.
    """
    y = F.col(label_col).cast("boolean")
    pred = F.col(score_col).cast("double") >= F.lit(float(threshold))
    base = df.filter(y.isNotNull()
                     & F.col(score_col).cast("double").isNotNull())
    agg = base.agg(
        F.sum(F.when(y & pred, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~y & pred, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(y & ~pred, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~y & ~pred, 1).otherwise(0)).alias("tn"))
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    n = tp + fp + fn + tn

    def ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6))

    return agg.select(
        "tp", "fp", "fn", "tn",
        ratio(tp + tn, n).alias("accuracy"),
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(2 * tp, 2 * tp + fp + fn).alias("f1"))


def calibration_bins(df: DataFrame, label_col: str, score_col: str,
                     bins: int = 10) -> DataFrame:
    """Reliability-diagram bins for a [0, 1] score: per bin
    (bin, n, mean_score, frac_pos) — a well-calibrated score has
    mean_score ~ frac_pos in every bin. Scores clamp into
    [0, bins-1] via least(floor(score*bins), bins-1), so 1.0 lands in
    the top bin like sklearn's calibration_curve.

    Determinism: mean_score sums DECIMAL(28,12)-quantized scores
    (order-free); frac_pos is integer counts. One groupBy with at most
    ``bins`` groups.
    """
    if bins < 1:
        raise ValueError("calibration_bins: bins must be >= 1")
    y = F.col(label_col).cast("boolean")
    s = F.col(score_col).cast("double")
    b = F.least(F.floor(s * F.lit(float(bins))),
                F.lit(bins - 1)).cast("int")
    base = df.filter(y.isNotNull() & s.isNotNull())
    return (base.groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(s.cast("decimal(28,12)")).cast("double")
                         / F.count(F.lit(1)), 6).alias("mean_score"),
                 F.round(F.sum(F.when(y, 1).otherwise(0)).cast("double")
                         / F.count(F.lit(1)), 6).alias("frac_pos"))
            .orderBy("bin"))
