"""Similarity search over embedding columns.

- cosine_topk: brute-force exact top-k (the correctness baseline). Query
  side is broadcast; the corpus is scanned once per batch of queries —
  at 100 TB this is the "small query set against huge corpus" shape.
- lsh_ann_topk: random-hyperplane LSH buckets as the scale path — signature
  computation is row-local; candidates come from bucket joins; final ranking
  re-scores candidates with exact cosine.
"""

from __future__ import annotations

from typing import List, Optional

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: Optional[str] = None) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). Self-matches
    (query_id == neighbor_id) are excluded. The query side is broadcast —
    the corpus never shuffles."""
    query_id_col = query_id_col or id_col

    def _norm(col):
        return F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"),
                       _norm(F.col(vec_col)).alias("__qn"))
    from .dedup import _spread

    c = _spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"),
                      _norm(F.col(vec_col)).alias("__cn"))
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id"))
    # precomputed norms; same float expression shape as cosine() (dot/(qn*cn))
    dot = F.aggregate(F.zip_with("__qv", "__cv",
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    sim = F.round(dot / (F.col("__qn") * F.col("__cn")), 6)
    scored = joined.withColumn("cosine", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _hyperplanes(dim: int, n_bits: int, seed: int) -> List[List[float]]:
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def lsh_signature(vec: Column, planes: List[List[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, plane_i>). Returns a
    long (n_bits <= 63). Pure JVM fold expressions."""
    bits = []
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0, F.lit(1 << i).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_bits: int = 8, n_tables: int = 8, dim: int = 64,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >= 1 of
    n_tables signature tables, then exact cosine re-ranks. Recall grows with
    n_tables; cost stays ~ bucket-collision volume instead of |corpus|×|q|."""
    tables = [_hyperplanes(dim, n_bits, seed + 97 * t) for t in range(n_tables)]

    def bucketize(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        sigs = F.array(*[lsh_signature(F.col(vec_alias), planes)
                         for planes in tables])
        return df.select(F.col(id_alias), F.col(vec_alias),
                         F.posexplode(sigs).alias("__table", "__bucket"))

    from .dedup import _spread

    c = bucketize(_spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                                F.col(vec_col).alias("__cv")),
                  "neighbor_id", "__cv")
    q = bucketize(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("__qv")),
                  "query_id", "__qv")
    cands = (c.join(q, ["__table", "__bucket"])
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", "__qv", "__cv")
             .dropDuplicates(["query_id", "neighbor_id"]))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (cands.withColumn("cosine", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


# ------------------------------------------------------------------ IVF


def _nearest_centroid(vec: Column, centroids: List[List[float]]) -> Column:
    """Index of the nearest centroid by squared L2 — array_min over
    (distance, index) structs, all JVM-side expressions."""
    entries = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*entries))["i"]


def _probe_centroids(vec: Column, centroids: List[List[float]],
                     n_probe: int) -> Column:
    """Array of the n_probe nearest centroid ids (sorted by distance)."""
    entries = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(v)) for v in c])
        d = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    ranked = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["i"])


def train_ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                        iters: int = 2, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> List[List[float]]:
    """Deterministic mini k-means for the IVF index. Init = the n_centroids
    vectors with the smallest ids; `iters` Lloyd rounds where assignment is
    a broadcast map-side pass (centroids ship as literals — KB-sized even
    at 100 TB corpus scale) and the update is one groupBy(cluster, dim) avg
    whose result (n_centroids x dim doubles) is all that ever reaches the
    driver."""
    seed_rows = (corpus.orderBy(id_col).limit(n_centroids)
                 .select(vec_col).collect())
    centroids = [[float(v) for v in r[0]] for r in seed_rows]

    from .dedup import _spread

    vecs = _spread(corpus).select(F.col(vec_col).alias("__v"))
    for _ in range(iters):
        assigned = vecs.withColumn(
            "__cluster", _nearest_centroid(F.col("__v"), centroids))
        sums = (assigned
                .select("__cluster", F.posexplode("__v").alias("__dim", "__x"))
                .groupBy("__cluster", "__dim")
                .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
                .collect())
        new = {int(r["__cluster"]): {} for r in sums}
        for r in sums:
            new[int(r["__cluster"])][int(r["__dim"])] = float(r["__m"])
        centroids = [
            [new[i][d] for d in sorted(new[i])] if i in new else centroids[i]
            for i in range(len(centroids))
        ]
    return centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 6,
             iters: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    k-means cells, probe only the n_probe cells nearest each query, exact
    cosine re-rank inside the probed cells.

    Scale shape: the corpus is scanned once to attach a cell id (map-side,
    centroids broadcast as literals), the candidate join is an equi shuffle
    join on the cell id, and re-ranking touches ~n_probe/n_centroids of the
    corpus per query instead of all of it. Beyond-reference operator (the
    reference has no vector ops at all)."""
    centroids = train_ivf_centroids(corpus, n_centroids=n_centroids,
                                    iters=iters, id_col=id_col,
                                    vec_col=vec_col)
    from .dedup import _spread

    c = (_spread(corpus)
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("__cv"))
         .withColumn("__cell", _nearest_centroid(F.col("__cv"), centroids)))
    q = (queries
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("__qv"))
         .withColumn("__cell", F.explode(
             _probe_centroids(F.col("__qv"), centroids, n_probe))))
    cands = (c.join(q, "__cell")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (cands.withColumn("cosine", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
