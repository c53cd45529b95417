"""Sequence packing and deterministic dataset ordering.

The last mile of a training-data pipeline: chunks/documents get packed into
fixed token budgets (one bin ≈ one training sequence) and the dataset gets a
reproducible global shuffle. Both are pure DataFrame ops — window cumsum and
a hash sort — so they scale as ordinary shuffles, and both are deterministic,
so the same inputs produce the same bins/order on any engine (SQL-oracle-able).

Beyond-reference surface (the reference has no pipeline operators;
cf. /root/reference/docs/SQL_Support.md).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_bins(df: DataFrame, token_col: str = "n_tokens", budget: int = 2048,
              shard_col: Optional[str] = None,
              order_cols: Sequence[str] = ("doc_id",),
              out_col: str = "bin_id") -> DataFrame:
    """Boundary packing: walk rows in `order_cols` order within each shard,
    assign each row to bin `floor(preceding_token_sum / budget)`.

    Properties: deterministic, one window shuffle, bins are contiguous runs
    of the ordered input (locality: a document's chunks stay adjacent).
    Bins can overfill by at most one row's tokens (the straddling row joins
    the bin where it starts) — the standard streaming approximation; exact
    first-fit is inherently sequential. A row with tokens > budget gets its
    own overfull bin.

    At scale the window partitions by `shard_col` (source, language, shard
    id) so packing parallelizes per shard; shard_col=None means ONE global
    sequence — fine for tests, a single-reducer bottleneck at 100 TB, so
    pass a shard at scale (a RuntimeWarning fires on the unsharded path to
    keep the unsafe default from going to production silently).
    """
    if shard_col is None:
        import warnings

        warnings.warn(
            "pack_bins(shard_col=None) packs ONE global sequence — the "
            "window funnels every row through a single reducer. Pass "
            "shard_col (source / language / shard id) for any dataset "
            "larger than one executor's memory.",
            RuntimeWarning, stacklevel=2)
    part = [F.col(shard_col)] if shard_col else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(*[F.col(c) for c in order_cols])
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(out_col, F.floor(start / F.lit(budget)))


def deterministic_shuffle(df: DataFrame, key_col: str,
                          salt: str = "shuffle") -> DataFrame:
    """Reproducible global shuffle: order by md5(key || salt). Same
    epoch-reshuffle trick used for training-data ordering — change `salt`
    per epoch for a new-but-reproducible permutation. Costs one range-
    partitioning sort shuffle; the order is engine-independent (md5 is
    byte-exact, hex strings compare lexicographically everywhere)."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.orderBy(h, F.col(key_col))


def assign_shards(df: DataFrame, key_col: str, n_shards: int,
                  salt: str = "shard", out_col: str = "shard") -> DataFrame:
    """Deterministic shard id in [0, n_shards): md5-threshold arithmetic on
    the same hex prefix as `sampling.hash_bucket_hex`, so shard membership
    is a pure row-local function of the key — engine-exact (SQL-oracle-able
    as `(('0x' || substr(md5(k || salt), 1, 8))::BIGINT * n) >> 32`),
    layout-invariant, and stable across runs/engines unlike any
    rand()/partition-id scheme."""
    from .sampling import hash_bucket_hex

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    bucket = F.conv(hash_bucket_hex(F.col(key_col), salt), 16, 10).cast("long")
    return df.withColumn(out_col,
                         F.shiftright(bucket * F.lit(n_shards), 32)
                         .cast("int"))


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, order_col: str = None,
                          salt: str = "shard",
                          max_records_per_file: int = None) -> DataFrame:
    """The terminal sink of the pipeline: a hive-partitioned
    `shard=N/part-*.parquet` layout where every row's shard is the
    deterministic :func:`assign_shards` hash of its key.

    Scale shape: ONE repartition shuffle co-locates each shard's rows,
    rows are sorted within the shard (reproducible file order; readers
    stream in a deterministic sequence), and `max_records_per_file` bounds
    individual file sizes without another shuffle (the writer rolls files).
    Readers prune by shard directory; a trainer with N data-parallel ranks
    maps rank -> shard list statically.

    Returns a batch DataFrame over the written output.
    """
    sharded = assign_shards(df, key_col, n_shards, salt)
    order = F.col(order_col) if order_col else F.col(key_col)
    writer = (sharded.repartition(n_shards, F.col("shard"))
              .sortWithinPartitions("shard", order)
              .write.mode("overwrite").partitionBy("shard"))
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
    return df.sparkSession.read.parquet(path)


def take_token_budget(df: DataFrame, budget: int,
                      score_col: str = "quality",
                      token_col: str = "n_tokens",
                      id_col: str = "doc_id",
                      chunk: int = 1 << 20) -> DataFrame:
    """Data-recipe assembly: greedily take the highest-``score_col``
    documents (ties to lowest ``id_col``) until the cumulative token count
    would exceed ``budget`` — the "top-quality N-token corpus" selection
    step that follows quality scoring in every pretraining pipeline.

    A row is selected iff its INCLUSIVE running token sum over the total
    order (score desc, id asc) is <= budget, so the output is the maximal
    prefix that fits; the straddling document is left out. Rows with NULL
    score or NULL tokens are excluded up front (a NULL has no place in a
    total order and the two engines disagree on NULL sort position).
    Returns (id_col, token_col, cum_tokens), deterministic for unique ids.

    Scale shape — a two-phase distributed prefix sum, because the naive
    formulation (one ORDER BY window over the corpus) funnels 100 TB
    through a single reducer:
      1. rows bucket by (score, floor(id/chunk)) — a pure row-local key
         that refines the selection order, so per-bucket token sums
         (one groupBy, map-side combine) can be prefix-summed on the
         BUCKET table to give each bucket its starting offset. That
         window is the only global sort and it runs over a bounded
         aggregate: <= n_rows/chunk + |distinct scores| rows (with the
         default 2^20 chunk, ~10^5 rows for a 10^11-document corpus) —
         the same bounded-aggregate footprint the vocab/codebook
         operators hold.
      2. the within-bucket running sum is a window PARTITIONED by bucket
         (parallel, <= chunk rows each); offset + within-sum is the exact
         global prefix sum, and the budget filter is row-local from there.
    The offsets table broadcasts (bounded as above); nothing corpus-sized
    ever sorts globally. ``id_col`` must be numeric — the chunk key
    ``floor(id/chunk)`` must refine the id order, which no hash does.

    The input is referenced TWICE (the bucket-sums pass and the join
    side), so an expensive derived input — tokenization, quality scoring
    — recomputes unless the caller persists it first (measured: an
    unpersisted split+count derivation made an 80k-row selection 8x
    slower than the same call over a persisted table). Reading a parquet
    table twice is fine; re-deriving features twice is not.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    base = (df.select(F.col(id_col), F.col(score_col), F.col(token_col))
            .where(F.col(score_col).isNotNull()
                   & F.col(token_col).isNotNull())
            .withColumn("__chunk", F.floor(F.col(id_col) / F.lit(chunk))))
    sums = (base.groupBy(F.col(score_col).alias("__s"), F.col("__chunk"))
            .agg(F.sum(token_col).alias("__bucket_toks")))
    # bounded-aggregate global window: the bucket table, never the corpus
    bucket_order = Window.orderBy(F.col("__s").desc(),
                                  F.col("__chunk").asc())
    offsets = sums.select(
        "__s", F.col("__chunk").alias("__oc"),
        (F.sum("__bucket_toks").over(bucket_order)
         - F.col("__bucket_toks")).alias("__offset"))
    within = (Window.partitionBy(score_col, "__chunk")
              .orderBy(F.col(id_col).asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = base.join(
        F.broadcast(offsets),
        (F.col(score_col) == F.col("__s"))
        & (F.col("__chunk") == F.col("__oc")))
    cum = (F.sum(token_col).over(within) + F.col("__offset")).cast("long")
    return (joined.withColumn("cum_tokens", cum)
            .where(F.col("cum_tokens") <= budget)
            .select(F.col(id_col), F.col(token_col),
                    F.col("cum_tokens")))


def concat_chunks(df: DataFrame, block_size: int = 2048,
                  token_col: str = "n_tokens",
                  id_col: str = "doc_id",
                  chunk: int = 1 << 20) -> DataFrame:
    """GPT-style concat-and-chunk: conceptually concatenate every document
    in ``id_col`` order into one token stream and cut it into fixed
    ``block_size`` blocks — the standard "group texts" step that turns a
    filtered corpus into training sequences, where a block may span
    document boundaries and a long document spans many blocks. (Callers
    wanting a randomized document order apply deterministic_shuffle first
    and feed its rank as the id.)

    Returns the block membership map, one row per (block, document)
    overlap: (block_id, id_col, tok_from, tok_to, n_in_block) with
    tok_from/tok_to the DOC-relative half-open token range landing in the
    block — exactly what a reader needs to assemble block tensors.
    The final partial block is included (trainers pad or drop it).

    Scale shape: the global token offset per document is the same
    two-phase distributed prefix sum as :func:`take_token_budget` —
    bucket by floor(id/chunk) (row-local, refines the id order),
    per-bucket sums groupBy (map-side combine), one global window over
    the BOUNDED bucket table (n/chunk rows), offsets broadcast back,
    within-bucket window partitioned by bucket. The block explode is
    row-local and bounded by ceil(doc_tokens/block_size) + 1. Nothing
    corpus-sized ever sorts globally. The input is referenced twice
    (bucket sums + join side) — persist expensive derived inputs (see
    take_token_budget). NULL-token rows are excluded up front; id_col
    must be numeric (the chunk key must refine the id order)."""
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    base = (df.select(F.col(id_col), F.col(token_col))
            .where(F.col(token_col).isNotNull()
                   & (F.col(token_col) > 0))
            .withColumn("__chunk", F.floor(F.col(id_col) / F.lit(chunk))))
    sums = (base.groupBy("__chunk")
            .agg(F.sum(token_col).alias("__bucket_toks")))
    bucket_order = Window.orderBy(F.col("__chunk").asc())
    offsets = sums.select(
        F.col("__chunk").alias("__oc"),
        (F.sum("__bucket_toks").over(bucket_order)
         - F.col("__bucket_toks")).alias("__bucket_off"))
    within = (Window.partitionBy("__chunk")
              .orderBy(F.col(id_col).asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = base.join(F.broadcast(offsets),
                       F.col("__chunk") == F.col("__oc"))
    # exclusive prefix sum = inclusive running sum minus own tokens
    start = (F.sum(token_col).over(within) + F.col("__bucket_off")
             - F.col(token_col)).cast("long")
    spans = joined.select(
        F.col(id_col), F.col(token_col).cast("long").alias("__n"),
        start.alias("__start"))
    first_b = F.floor(F.col("__start") / block_size).cast("long")
    last_b = F.floor((F.col("__start") + F.col("__n") - 1)
                     / block_size).cast("long")
    out = spans.select(
        id_col, "__n", "__start",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"))
    b0 = F.col("block_id") * block_size
    tok_from = F.greatest(b0, F.col("__start")) - F.col("__start")
    tok_to = (F.least(b0 + block_size, F.col("__start") + F.col("__n"))
              - F.col("__start"))
    return out.select(
        "block_id", id_col,
        tok_from.cast("long").alias("tok_from"),
        tok_to.cast("long").alias("tok_to"),
        (tok_to - tok_from).cast("long").alias("n_in_block"))
