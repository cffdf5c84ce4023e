"""Multimodal columns: binary payloads + typed metadata, Arrow-batched ops.

North-star surface for a training-data pipeline: image/audio/video
travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python
row-at-a-time.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container — the codec boundary is stubbed with a deterministic fake
(clearly marked below). Everything Spark-side is real and tested:
schemas, UDF signatures, Arrow batch shapes, partition behavior. A
deployment swaps ``_decode_bytes_stub`` for the real codec and nothing
else changes.

Scale notes: media blobs dominate row size, so ops here avoid shuffles
entirely — every stage is a narrow ``mapInPandas`` over the existing
partitioning; frame sampling explodes *after* decode so the wide rows
never shuffle. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
Arrow batch memory for large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from ``documents``.

    Stands in for a real binary ingest (e.g. parquet with blob columns);
    content bytes are an md5 chain over the doc text → stable across
    runs and engines.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("media_type"),
        F.encode(F.md5(F.col("text")), "utf-8").alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            (F.col("doc_id") % 60000).cast("bigint").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("metadata"),
    )


# ---------------------------------------------------------------------------
# STUB CODEC BOUNDARY — deterministic fake in this container.
# Swap for PIL / ffmpeg / librosa in a real deployment; the Spark
# plumbing (signatures, schemas, batching) is identical.

def _decode_bytes_stub(content: bytes, width: int, height: int) -> dict:
    """Deterministic fake decode: digest-derived pixel statistics."""
    d = hashlib.md5(content).digest()
    return {
        "mean_px": sum(d) / len(d),
        "checksum": d.hex()[:16],
        "n_px": int(width) * int(height),
    }


def _resize_bytes_stub(content: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: re-digest tagged with target dims."""
    return hashlib.md5(content + f":{w}x{h}".encode()).digest()


def _frame_bytes_stub(content: bytes, idx: int) -> bytes:
    """Deterministic fake frame extraction."""
    return hashlib.md5(content + f":frame{idx}".encode()).digest()


# ---------------------------------------------------------------------------
# Real Spark plumbing

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("n_px", T.LongType(), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary → per-item pixel/sample statistics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [
                _decode_bytes_stub(c, w, h)
                for c, w, h in zip(
                    pdf["content"],
                    pdf["width"],
                    pdf["height"],
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "mean_px": [s["mean_px"] for s in stats],
                    "checksum": [s["checksum"] for s in stats],
                    "n_px": [s["n_px"] for s in stats],
                }
            )

    flat = media.select(
        "media_id",
        "media_type",
        "content",
        F.col("metadata.width").alias("width"),
        F.col("metadata.height").alias("height"),
    )
    return flat.mapInPandas(batches, DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass for image rows; other media pass through untouched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            is_img = pdf["media_type"] == "image"
            out = pdf[["media_id", "media_type"]].copy()
            out["content"] = [
                _resize_bytes_stub(c, width, height) if img else c
                for c, img in zip(pdf["content"], is_img)
            ]
            out["width"] = [width if img else None for img in is_img]
            out["height"] = [height if img else None for img in is_img]
            yield out

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("content", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    return media.select("media_id", "media_type", "content").mapInPandas(
        batches, schema
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    The frame *indices* are computed relationally (sequence + explode —
    cheap, JVM-side); only the per-frame byte extraction crosses the
    codec boundary, Arrow-batched.
    """
    vids = media.where(F.col("media_type") == "video").select(
        "media_id",
        "content",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("metadata.n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame": [
                        _frame_bytes_stub(c, i)
                        for c, i in zip(pdf["content"], pdf["frame_idx"])
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )
    return vids.mapInPandas(batches, schema)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Binary → embedding array<double> (deterministic fake featurizer).

    Output feeds the similarity operators (operators/similarity.py)
    unchanged — the contract is just (id, embedding array).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for c in pdf["content"]:
                d = hashlib.md5(bytes(c)).digest()
                embs.append([b / 255.0 for b in d[:dim]])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": embs}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
        ]
    )
    return media.select("media_id", "content").mapInPandas(batches, schema)



AUDIO_WINDOW_MS = 1000

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def audio_windows(media: DataFrame, window_ms: int = AUDIO_WINDOW_MS) -> DataFrame:
    """Audio path: per-clip fixed-length analysis windows with a
    deterministic per-window RMS (stub DSP — real librosa/torchaudio
    slots into the same batch function).

    Plumbing pinned by tests: the blob never shuffles (narrow
    mapInPandas over audio rows only — media_type filter prunes before
    Python), window count derives from metadata.duration_ms, and the
    output explodes Python-side inside the Arrow batch so one input
    row → N window rows without a JVM explode of binary columns.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, winds, rmss = [], [], []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                n_win = max(1, int(dur) // window_ms)
                for w in range(n_win):
                    digest = hashlib.md5(
                        content + f":win{w}".encode()
                    ).digest()
                    # deterministic pseudo-RMS in [0, 1)
                    rms = int.from_bytes(digest[:8], "big") / 2**64
                    ids.append(mid)
                    winds.append(w)
                    rmss.append(rms)
            yield pd.DataFrame(
                {"media_id": ids, "win_idx": winds, "rms": rmss}
            )

    auds = media.where(F.col("media_type") == "audio").select(
        "media_id",
        "content",
        F.col("metadata.duration_ms").alias("duration_ms"),
    )
    return auds.mapInPandas(batches, AUDIO_SCHEMA)

# ---------------------------------------------------------------------------
# queries() wrappers (driver contract) — deterministic but not
# SQL-expressible (md5-digest math), so the driver records rows-only
# checks; pytest pins the values.

def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the synthetic media table; per-item digest statistics."""
    return decode_media(synthesize_media(spark, sf_dir)).orderBy("media_id")


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sample of the video rows (frame ids only — the
    blob column stays distributed)."""
    return (
        sample_frames(synthesize_media(spark, sf_dir), every_n=10)
        .select("media_id", "frame_idx")
        .orderBy("media_id", "frame_idx")
    )


def mm_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurize media blobs and run exact cosine top-5 for one probe —
    the multimodal → similarity interop path."""
    from pgsink_spark.operators.similarity import brute_force_topk

    feats = extract_features(synthesize_media(spark, sf_dir), dim=16)
    emb = feats.select(
        F.col("media_id").alias("vec_id"), F.col("embedding")
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return brute_force_topk(emb, q, k=5).orderBy("q_id", "rnk")


def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio analysis (ids + per-window RMS; blobs stay
    distributed)."""
    return (
        audio_windows(synthesize_media(spark, sf_dir))
        .orderBy("media_id", "win_idx")
    )
