"""Int8 embedding quantization: 4x storage/bandwidth reduction per vector.

Symmetric per-vector linear quantization (the faiss `SQ8`/ONNX-style
scheme): scale = max|x| / 127, code_i = clamp(round(x_i / scale)). A 64-dim
float32 embedding (256 B) becomes 64 int8 codes + one float scale (~68 B).
At 100 TB of embeddings this is the difference between spilling and an
in-memory similarity scan, and quantized dot products stay JVM-side.

Everything is a row-local JVM expression (higher-order functions over the
array column) — no UDFs, no shuffle, and the arithmetic is expressible in
ANSI SQL, so the driver oracle verifies codes BIT-FOR-BIT (rounding is
spelled floor(x + 0.5) explicitly to pin one rounding mode in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale(vec: Column) -> Column:
    """max|x| / 127; zero vectors get scale NULL (codes all 0)."""
    mx = F.array_max(F.transform(vec, lambda v: F.abs(v.cast("double"))))
    return F.when(mx > 0, mx / F.lit(127.0))


def quantize_vec(vec: Column, scale: Column = None) -> Column:
    """array<tinyint> codes: clamp(floor(x / scale + 0.5), -127, 127).
    floor(x + 0.5) (round-half-up) is used instead of round() so both
    engines of the differential gate agree on every tie.

    PASS A STAGED scale COLUMN when quantizing a whole frame: higher-order
    lambdas are interpreted, so an inlined scale subtree (array_max over a
    transform) re-evaluates once PER ELEMENT — O(d^2) per row; a staged
    column is a plain attribute read."""
    s = _scale(vec) if scale is None else scale
    # the NULL (zero-vector) scale must yield code 0 — Spark's least/
    # greatest SKIP null arguments rather than propagate them, so the
    # null case is branched explicitly before clamping
    return F.transform(
        vec,
        lambda v: F.when(
            s.isNotNull(),
            F.greatest(
                F.least(F.floor(v.cast("double") / s + F.lit(0.5)),
                        F.lit(127)),
                F.lit(-127))).otherwise(F.lit(0)).cast("tinyint"))


def dequantize_vec(codes: Column, scale: Column) -> Column:
    """array<double> reconstruction: code_i * scale."""
    return F.transform(codes,
                       lambda c: c.cast("double") * F.coalesce(scale, F.lit(0.0)))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        code_col: str = "q_codes",
                        scale_col: str = "q_scale") -> DataFrame:
    """Attach (codes array<tinyint>, scale double) per row; the original
    vector column is dropped — that is the point (4x smaller table). The
    scale is staged as a column first so the per-element lambda reads an
    attribute instead of re-evaluating the array_max subtree d times."""
    return (df.withColumn(scale_col, _scale(F.col(vec_col)))
            .withColumn(code_col,
                        quantize_vec(F.col(vec_col), F.col(scale_col)))
            .drop(vec_col))


def dequantize_embeddings(df: DataFrame, code_col: str = "q_codes",
                          scale_col: str = "q_scale",
                          vec_col: str = "embedding") -> DataFrame:
    """Reconstruct an approximate float vector column from codes + scale."""
    return (df.withColumn(vec_col,
                          dequantize_vec(F.col(code_col), F.col(scale_col)))
            .drop(code_col, scale_col))


def quantization_error(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-row relative L2 reconstruction error — the quality diagnostic
    (symmetric int8 on unit-ish vectors lands around 1e-2)."""
    v = F.col(vec_col)
    staged = df.withColumn("__qscale", _scale(v))
    recon = dequantize_vec(quantize_vec(v, F.col("__qscale")),
                           F.col("__qscale"))
    diff2 = F.aggregate(F.zip_with(v, recon,
                                   lambda a, b: (a.cast("double") - b)
                                   * (a.cast("double") - b)),
                        F.lit(0.0), lambda acc, x: acc + x)
    norm2 = F.aggregate(v, F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return (staged.select("*", F.sqrt(diff2 / F.nullif(norm2, F.lit(0.0)))
                          .alias("rel_l2_error"))
            .drop("__qscale"))
