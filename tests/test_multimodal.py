"""Multimodal plumbing: schemas, Arrow batch shapes, determinism.

The codec layer is a documented deterministic stub; these tests pin the
Spark-side contract — schema fidelity, no-shuffle narrow plans, frame
explosion counts, and featurizer → similarity interop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgsink_spark.operators.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_media_table_schema(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    n = media.count()
    assert n > 0
    kinds = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_deterministic_and_typed(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    d1 = decode_media(media)
    assert d1.schema.simpleString() == DECODED_SCHEMA.simpleString()
    rows1 = {r["media_id"]: r["checksum"] for r in d1.collect()}
    rows2 = {r["media_id"]: r["checksum"] for r in decode_media(media).collect()}
    assert rows1 == rows2  # deterministic stub
    assert len(rows1) == media.count()
    # n_px derives from metadata, not from bytes
    one = d1.orderBy("media_id").first()
    meta = media.orderBy("media_id").first()["metadata"]
    assert one["n_px"] == meta["width"] * meta["height"]


def test_decode_plan_has_no_shuffle(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map stage — blobs never shuffle


def test_resize_touches_only_images(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    out = resize_images(media, 224, 224)
    img = out.where(F.col("media_type") == "image").first()
    aud = out.where(F.col("media_type") == "audio").first()
    assert img["width"] == 224 and img["height"] == 224
    assert aud["width"] is None
    # resized content differs from original; non-image content unchanged
    orig = {
        r["media_id"]: bytes(r["content"]) for r in media.collect()
    }
    assert bytes(img["content"]) != orig[img["media_id"]]
    assert bytes(aud["content"]) == orig[aud["media_id"]]


def test_sample_frames_counts(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    frames = sample_frames(media, every_n=10)
    vids = media.where(F.col("media_type") == "video").select(
        "media_id", F.col("metadata.n_frames").alias("n")
    )
    expect = sum((r["n"] + 9) // 10 for r in vids.collect())
    assert frames.count() == expect
    # frames are distinct per index
    one = frames.where(F.col("media_id") == frames.first()["media_id"])
    blobs = [bytes(r["frame"]) for r in one.collect()]
    assert len(set(blobs)) == len(blobs)


def test_features_feed_similarity(spark, sf_dir):
    from pgsink_spark.operators.similarity import cosine

    media = synthesize_media(spark, sf_dir).limit(50)
    feats = extract_features(media, dim=8)
    assert dict(feats.dtypes)["embedding"] == "array<double>"
    a = feats.select(
        F.col("media_id").alias("a_id"), F.col("embedding").alias("a")
    )
    b = feats.select(
        F.col("media_id").alias("b_id"), F.col("embedding").alias("b")
    )
    sims = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(cosine(F.col("a"), F.col("b")).alias("cos"))
        .agg(F.min("cos").alias("lo"), F.max("cos").alias("hi"))
        .collect()[0]
    )
    assert -1.0001 <= sims["lo"] <= sims["hi"] <= 1.0001


def test_audio_windows_counts_and_no_shuffle(spark, sf_dir):
    """Window count derives from duration; plan stays a narrow
    mapInPandas (blobs never shuffle)."""
    from pgsink_spark.operators.multimodal import (
        AUDIO_WINDOW_MS,
        audio_windows,
        synthesize_media,
    )
    from pgsink_spark.plans import exchange_count

    media = synthesize_media(spark, sf_dir)
    out = audio_windows(media)
    assert exchange_count(out) == 0

    per_clip = {r["media_id"]: r["count"] for r in
                out.groupBy("media_id").count().collect()}
    want = {
        r["media_id"]: max(1, r["duration_ms"] // AUDIO_WINDOW_MS)
        for r in media.where(F.col("media_type") == "audio")
        .select("media_id", F.col("metadata.duration_ms").alias("duration_ms"))
        .collect()
    }
    assert per_clip == want
    # deterministic rms in [0,1)
    rms = [r["rms"] for r in out.limit(50).collect()]
    assert all(0.0 <= v < 1.0 for v in rms)
