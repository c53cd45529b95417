"""Deterministic sampling and dataset-split operators.

The reproducible-split primitive for a 100 TB training pipeline: bucket every
row by a cryptographic hash of a stable key, then compare the hash against
fraction thresholds. Properties that matter at scale:

- **Narrow transformation** — no shuffle, no sort, no driver state; the
  split/sample predicate evaluates row-local inside whole-stage codegen and
  survives any repartitioning of the input.
- **Reproducible across runs AND engines** — md5 is specified byte-exact, so
  the same key always lands in the same split on Spark, DuckDB, or anything
  else (unlike `rand(seed)`, which depends on partition layout).
- **Leakage-proof grouping** — hashing a *key* (not the row) sends every row
  sharing that key to the same side (all lineitems of one order, all chunks
  of one document).

The hash-threshold comparison is done on the lowercase-hex *string* prefix
(`substr(md5(key || salt), 1, 8) < '<hex threshold>'`) so the exact same
predicate is expressible in ANSI SQL for the DuckDB oracle — no integer
conversion needed; lexicographic order on fixed-width lowercase hex equals
numeric order.

Beyond-reference surface (the reference has no sampling operators at all;
closest is plain SELECT — docs/SQL_Support.md).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_hex(key: Column, salt: str = "") -> Column:
    """First 8 lowercase-hex chars of md5(key || salt) — a uniform draw from
    [0, 2^32) encoded so string order == numeric order."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def fraction_threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P[hash_bucket_hex < t] == fraction (up to
    1/2^32 quantization)."""
    v = max(0, min(int(round(fraction * 2**32)), 2**32 - 1))
    return format(v, "08x")


def hash_split(df: DataFrame, key_col: str,
               weights: Dict[str, float] | None = None,
               salt: str = "split", out_col: str = "split") -> DataFrame:
    """Add a deterministic split-label column ('train'/'val'/'test' by
    default, weights 0.8/0.1/0.1). Weights are normalized; the last label
    takes the remainder so fractions always sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("hash_split needs at least two labels")
    total = float(sum(weights.values()))
    h = hash_bucket_hex(F.col(key_col), salt)
    names = list(weights)
    acc = 0.0
    col = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < F.lit(fraction_threshold_hex(acc))
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return df.withColumn(out_col, col.otherwise(names[-1]))


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "sample") -> DataFrame:
    """Keep ~`fraction` of distinct keys (every row of a kept key is kept).
    Pure filter — Catalyst pushes it into the scan where possible."""
    thr = fraction_threshold_hex(fraction)
    return df.filter(hash_bucket_hex(F.col(key_col), salt) < F.lit(thr))


def mixture_sample(df: DataFrame, source_col: str,
                   rates: Dict[str, float], key_col: str,
                   salt: str = "mixture",
                   default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-source subsampling — the data-mixing primitive for
    assembling a training corpus from heterogeneous sources (web crawl,
    code, books, ...) at prescribed rates.

    Each source s keeps the rows whose key hashes under ``rates[s]``
    (sources absent from ``rates`` keep ``default_rate``). The predicate is
    a row-local CASE over hex-hash thresholds: no shuffle, engine-exact
    (md5, like hash_split), reproducible under any repartitioning, and a
    key shared by several rows (all chunks of a document) keeps or drops
    them together. Rates > 1 are clamped to 1 (this operator never
    up-samples; duplicate epochs are the training loop's job).

    Use :func:`mixture_rates` to solve the rates from target mixture
    WEIGHTS and the observed per-source counts.
    """
    bucket = hash_bucket_hex(F.col(key_col), salt)
    pred = None
    for src, rate in sorted(rates.items()):
        thr = fraction_threshold_hex(min(1.0, max(0.0, rate)))
        cond = (F.col(source_col) == F.lit(src)) & (bucket < F.lit(thr))
        pred = cond if pred is None else pred | cond
    default_thr = fraction_threshold_hex(min(1.0, max(0.0, default_rate)))
    others = (~F.col(source_col).isin(*rates.keys())
              & (bucket < F.lit(default_thr)))
    pred = others if pred is None else pred | others
    return df.filter(pred)


def mixture_rates(df: DataFrame, source_col: str,
                  weights: Dict[str, float],
                  total_rows: int | None = None) -> Dict[str, float]:
    """Per-source sampling rates achieving target mixture ``weights``
    (relative proportions) without up-sampling any source.

    Solves max c s.t. c * w_s / n_s <= 1 for every source — the usual
    "scale the mixture until the scarcest source is exhausted" rule — then
    optionally shrinks c to cap the output at ``total_rows``. The only
    driver-side data is ONE aggregate row per source (bounded: sources are
    a catalog, not data). Returns {source: rate}."""
    counts = {r["src"]: r["n"] for r in
              df.groupBy(F.col(source_col).alias("src"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    missing = [s for s in weights if s not in counts]
    if missing:
        raise ValueError(f"sources in weights but absent from data: {missing}")
    w_total = float(sum(weights.values()))
    shares = {s: w / w_total for s, w in weights.items()}
    # largest c with c*share_s <= n_s for all s
    c = min(counts[s] / share for s, share in shares.items() if share > 0)
    if total_rows is not None:
        c = min(c, float(total_rows))
    return {s: (c * share) / counts[s] if counts[s] else 0.0
            for s, share in shares.items()}


def alpha_mixture_weights(df: DataFrame, source_col: str = "source",
                          alpha: float = 0.3,
                          count_col: str | None = None) -> DataFrame:
    """Temperature-based mixture reweighting — the standard LLM
    training-mix step (multilingual sampling in XLM/mBERT, GPT-3-style
    source weighting): a source with n_s rows (or token mass, with
    ``count_col``) gets share n_s^alpha / sum_t n_t^alpha. alpha < 1
    up-weights scarce sources relative to their natural share; alpha = 1
    reproduces it; alpha = 0 is uniform over sources.

    Returns (source, n_rows, share_before, share_after), one row per
    source. Feed share_after into :func:`mixture_rates` to get
    per-source sampling rates for :func:`mixture_sample`.

    Plan shape: one groupBy with map-side combine (state bounded by the
    source count, not the corpus), then a broadcast cross join of the
    1-row totals. The n^alpha terms are DECIMAL(28,12)-quantized before
    summing so the total is order-independent and engine-exact (the
    zipf_slope discipline); shares use the epsilon+round convention."""
    n = (F.sum(F.col(count_col)) if count_col
         else F.count(F.lit(1))).alias("n_rows")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(n)
    dec = "decimal(28,12)"
    powed = counts.select(
        "source", "n_rows",
        F.round(F.pow(F.col("n_rows").cast("double"), float(alpha)), 12)
         .cast(dec).alias("__pw"))
    totals = powed.agg(F.sum("n_rows").alias("__tn"),
                       F.sum("__pw").alias("__tp"))
    eps = F.lit(0.0000001)
    return (powed.crossJoin(F.broadcast(totals))
            .select(
                "source", "n_rows",
                F.round(F.col("n_rows").cast("double")
                        / F.col("__tn").cast("double") + eps, 6)
                 .alias("share_before"),
                F.round(F.col("__pw").cast("double")
                        / F.col("__tp").cast("double") + eps, 6)
                 .alias("share_after")))


def group_sample_k(df: DataFrame, group_col: str, key_col: str,
                   k: int, salt: str = "gk") -> DataFrame:
    """Deterministic fixed-size sample: exactly min(k, |group|) rows per
    group, chosen by md5-hash order of the key — the reproducible
    equivalent of per-group reservoir sampling (eval-set construction,
    per-source audits). Engine-portable for the same reason as
    hash_split: md5 is byte-exact everywhere, so DuckDB's
    `row_number() OVER (PARTITION BY g ORDER BY md5(key || salt), key)`
    picks the identical rows.

    Scale: one hash-partitioned window keyed on the group — each group
    sorts independently (no global sort, no single reducer); the sort is
    per-partition and spills. A giant group still sorts all its rows to
    keep k — for top-heavy skew apply a pre-filter
    (`hash_bucket_hex(key) < threshold`) to thin giant groups first;
    determinism is preserved because the hash order is stable under any
    subset."""
    if k < 1:
        raise ValueError("group_sample_k needs k >= 1")
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("string")
    w = (Window.partitionBy(group_col)
         .orderBy(F.md5(F.concat(key, F.lit(salt))), key))
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k)
              .drop("__rn"))


_MD5_60BIT_SPACE = float(1 << 60)  # 16^15 — exactly representable in double


def weighted_sample_k(df: DataFrame, weight_col: str, key_col: str,
                      k: int, salt: str = "ws",
                      group_col: str | None = None) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, algorithm A-Res): every row draws u ~ U(0,1] from the
    md5 of its key and ranks by ln(u)/weight descending — the top-k ranked
    rows are exactly a weight-proportional sample without replacement.
    Because u comes from md5 (not rand()), the sample is reproducible
    across runs, partition layouts, AND engines (the driver oracle
    restates the identical ranking in DuckDB) — the quality-weighted
    training-mix selection step, with audit-grade determinism.

    Rows with NULL or non-positive weight carry zero selection mass and
    are excluded. Global form compiles to orderBy+limit =
    TakeOrderedAndProject (per-partition top-k + merge, no global sort);
    with `group_col`, a group-partitioned window ranks each group
    independently (same economics as group_sample_k).
    """
    if k < 1:
        raise ValueError("weighted_sample_k needs k >= 1")
    key = F.col(key_col).cast("string")
    v = F.conv(F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 15),
               16, 10).cast("long")
    # u in (0, 1]; ln(u)/w is the A-Res exponential key (log-domain form
    # of u^(1/w) — same argmax, no underflow for large weights)
    u = (v + F.lit(1)).cast("double") / F.lit(_MD5_60BIT_SPACE)
    w = F.col(weight_col).cast("double")
    score = F.log(u) / w
    scored = df.filter(w.isNotNull() & (w > 0)) \
               .withColumn("__wsk", score)
    if group_col is None:
        out = scored.orderBy(F.desc("__wsk"), key).limit(k)
    else:
        from pyspark.sql.window import Window

        win = (Window.partitionBy(group_col)
               .orderBy(F.desc("__wsk"), key))
        out = (scored.withColumn("__rn", F.row_number().over(win))
               .filter(F.col("__rn") <= k).drop("__rn"))
    return out.drop("__wsk")


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Dict[str, float],
                      seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (Spark `sampleBy`): rebalance skewed
    strata (languages, sources) without a shuffle. Seeded but — unlike the
    hash operators above — dependent on partition layout, so use
    `hash_split`/`deterministic_sample` when byte-exact reproducibility
    across engines matters."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_split(df: DataFrame, strata_cols: Sequence[str],
                     key_col: str,
                     weights: Dict[str, float] | None = None,
                     salt: str = "split", out_col: str = "split") -> DataFrame:
    """Exact-quota deterministic train/val/test split WITHIN each stratum.

    :func:`hash_split` is proportional only in expectation — each stratum's
    realized fractions drift by O(1/sqrt(n_s)), which is material exactly
    where it hurts most: small strata (low-resource languages, rare
    sources) can end up with an empty validation set. This operator makes
    the quota exact per stratum: keys are ranked inside each stratum by
    `md5(key || salt)` (a deterministic uniform permutation) and the first
    `round(n_s * w_train)` keys are 'train', the next block 'val', and so
    on — every stratum hits its target fraction to within one key.

    Leakage-proofness is preserved at the KEY level, like `hash_split`:
    ranks are `dense_rank` over (hash, key) and quotas count DISTINCT keys,
    so all rows sharing a key land on the same side. Determinism is
    engine-portable — md5 plus standard window functions restate 1:1 in
    ANSI SQL (the DuckDB oracle runs the identical expression).

    Scale shape: ONE shuffle, partitioned by the strata columns; both
    window passes (dense_rank, then max(rank) for the stratum key count)
    reuse that single exchange. Each stratum must fit one reducer — the
    right tool when strata are the small tail. For strata at corpus scale
    use `hash_split` instead: it is shuffle-free and its relative error
    vanishes at exactly the sizes that overflow a reducer. Label
    boundaries use floor(n*c + 0.5) on IEEE doubles, identical in Spark
    and DuckDB (no engine-varying round()).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("stratified_split needs at least two labels")
    if not strata_cols:
        raise ValueError("stratified_split needs at least one stratum column")
    total = float(sum(weights.values()))
    h = hash_bucket_hex(F.col(key_col), salt)
    part = [F.col(c) for c in strata_cols]
    w_rank = Window.partitionBy(*part).orderBy(h, F.col(key_col))
    w_strat = Window.partitionBy(*part)
    ranked = (df.withColumn("__rk", F.dense_rank().over(w_rank))
                .withColumn("__n", F.max("__rk").over(w_strat)))
    names = list(weights)
    acc, label = 0.0, None
    for name in names[:-1]:
        acc += weights[name] / total
        bound = F.floor(F.col("__n") * F.lit(acc) + F.lit(0.5))
        cond = F.col("__rk") <= bound
        label = (F.when(cond, F.lit(name)) if label is None
                 else label.when(cond, F.lit(name)))
    label = label.otherwise(F.lit(names[-1]))
    return ranked.withColumn(out_col, label).drop("__rk", "__n")
