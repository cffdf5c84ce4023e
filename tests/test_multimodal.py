"""Multimodal plane: real PNG/WAV codecs + Arrow plumbing.

Images and audio are now genuinely decoded (stdlib inflate/unfilter +
PCM parse — functions/codecs.py); video keeps the documented digest
stub. These tests pin both layers: decoded stats must equal the
closed-form predictions the DuckDB oracles use, and the Spark-side
contract (schema fidelity, no-shuffle narrow plans, frame explosion
counts, featurizer → similarity interop) holds as before.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pgsink_spark.functions import codecs
from pgsink_spark.operators.multimodal import (
    AUDIO_WINDOW_MS,
    DECODED_SCHEMA,
    IMG_W,
    MEDIA_SCHEMA,
    audio_windows,
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
    # the payloads are REAL containers, not digests
    rows = media.orderBy("media_id").limit(3).collect()
    assert codecs.is_png(bytes(rows[0]["content"]))   # doc 0 → image
    assert codecs.is_wav(bytes(rows[1]["content"]))   # doc 1 → audio
    from pgsink_spark.operators.multimodal import pfv_frame
    # doc 2 → PFV video container whose frames are REAL PNGs
    assert bytes(rows[2]["content"]).startswith(b"PFV1")
    assert codecs.is_png(pfv_frame(bytes(rows[2]["content"]), 0))


def test_kinds_prefilter_rows_identical(spark, sf_dir):
    """The ``kinds`` synthesis pre-filter (r10 optimization: skip
    ENCODING the media types a single-type consumer throws away) must
    emit bit-identical rows to post-filtering the full table."""
    full = synthesize_media(spark, sf_dir)
    for kind in ("image", "audio", "video"):
        pre = {
            (r["media_id"], bytes(r["content"]))
            for r in synthesize_media(spark, sf_dir, kinds=(kind,)).collect()
        }
        post = {
            (r["media_id"], bytes(r["content"]))
            for r in full.where(F.col("media_type") == kind).collect()
        }
        assert pre == post and pre


def test_decode_matches_closed_form(spark, sf_dir):
    """Spark decodes actual bytes; the expected numbers come from the
    closed-form content pattern — same prediction the oracle makes."""
    d = decode_media(synthesize_media(spark, sf_dir))
    assert d.schema.simpleString() == DECODED_SCHEMA.simpleString()
    for r in d.orderBy("media_id").limit(60).collect():
        i = r["media_id"]
        if i % 3 == 0:
            h = 16 + i % 16
            assert r["fmt"] == "png"
            assert (r["width"], r["height"]) == (IMG_W, h)
            assert r["n_px"] == IMG_W * h
            assert r["mean_px"] == i % 160 + (IMG_W - 1) / 2 + (h - 1) / 2
        elif i % 3 == 1:
            assert r["fmt"] == "wav"
            assert r["n_samples"] == 1600 + (i % 10) * 160
            assert r["sample_rate"] == 16000
            assert r["rms"] == float(100 + (i % 300) * 100)
        else:
            assert r["fmt"] == "stub"
            assert r["checksum"] is not None


def test_decode_deterministic(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    rows1 = {r["media_id"]: r["checksum"] for r in decode_media(media).collect()}
    rows2 = {r["media_id"]: r["checksum"] for r in decode_media(media).collect()}
    assert rows1 == rows2
    assert len(rows1) == media.count()


def test_decode_plan_has_no_shuffle(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map stage — blobs never shuffle


def test_resize_real_pixels(spark, sf_dir):
    """Image rows are REALLY resampled: decoding the resized PNG gives
    the nearest-neighbor grid of the decoded original."""
    media = synthesize_media(spark, sf_dir)
    out = resize_images(media, 24, 20)
    img = out.where(F.col("media_type") == "image").orderBy("media_id").first()
    aud = out.where(F.col("media_type") == "audio").first()
    assert img["width"] == 24 and img["height"] == 20
    assert aud["width"] is None

    orig = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    got = codecs.decode_png(bytes(img["content"]))
    want = codecs.resize_nearest(
        codecs.decode_png(orig[img["media_id"]]), 24, 20
    )
    assert np.array_equal(got, want)
    # non-image content passes through untouched
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


def test_features_are_real_content_features(spark, sf_dir):
    """PNG features = normalized gray histogram (sums to 1); WAV
    features = RMS profile normalized to peak 1 (square wave → all 1s);
    and they feed the similarity operators."""
    from pgsink_spark.operators.similarity import cosine

    media = synthesize_media(spark, sf_dir).limit(60)
    feats = extract_features(media, dim=8)
    assert dict(feats.dtypes)["embedding"] == "array<double>"
    rows = {r["media_id"]: r["embedding"] for r in feats.collect()}
    for mid, emb in rows.items():
        assert len(emb) == 8
        if mid % 3 == 0:
            assert abs(sum(emb) - 1.0) < 1e-9       # histogram
        elif mid % 3 == 1:
            assert all(v == 1.0 for v in emb)        # flat square-wave RMS

    a = feats.select(F.col("media_id").alias("a_id"), F.col("embedding").alias("a"))
    b = feats.select(F.col("media_id").alias("b_id"), F.col("embedding").alias("b"))
    sims = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(cosine(F.col("a"), F.col("b")).alias("cos"))
        .agg(F.min("cos").alias("lo"), F.max("cos").alias("hi"))
        .collect()[0]
    )
    assert -1.0001 <= sims["lo"] <= sims["hi"] <= 1.0001


def test_audio_windows_real_rms_and_no_shuffle(spark, sf_dir):
    """Window count = ceil(n_samples / samples-per-window) over the
    real PCM; every window of a square wave has RMS exactly amp; the
    plan stays a narrow mapInPandas (blobs never shuffle)."""
    from pgsink_spark.plans import exchange_count

    media = synthesize_media(spark, sf_dir)
    out = audio_windows(media)
    assert exchange_count(out) == 0

    spw = 16000 * AUDIO_WINDOW_MS // 1000
    rows = out.collect()
    per_clip: dict = {}
    for r in rows:
        per_clip[r["media_id"]] = per_clip.get(r["media_id"], 0) + 1
        assert r["rms"] == float(100 + (r["media_id"] % 300) * 100)
    want = {
        r["media_id"]: -(-(1600 + (r["media_id"] % 10) * 160) // spw)
        for r in media.where(F.col("media_type") == "audio")
        .select("media_id")
        .collect()
    }
    assert per_clip == want


def test_sampled_frames_are_real_decodable_pngs(spark, sf_dir):
    """Frame sampling now crosses a REAL codec boundary: every sampled
    frame from the PFV container decodes with the real PNG path and
    matches the closed-form pixel prediction for its (video, frame)."""
    from pgsink_spark.operators.multimodal import (
        IMG_W,
        sample_frames,
        synthesize_media,
    )

    media = synthesize_media(spark, sf_dir)
    frames = sample_frames(media, every_n=1).orderBy("media_id", "frame_idx")
    rows = frames.limit(12).collect()
    assert rows
    for r in rows:
        png = bytes(r["frame"])
        assert codecs.is_png(png)
        px = codecs.decode_png(png).reshape(-1, IMG_W)
        src = r["media_id"] * 31 + r["frame_idx"]
        assert px.shape == (16 + src % 16, IMG_W)
        assert px[0, 0] == (src % 160) % 256


def test_keyframes_subset_and_first_frame_kept(spark, sf_dir):
    """Every video contributes frame 0; keyframes are a subset of the
    decoded frame set; each kept frame's mean matches the closed-form
    synthesis prediction exactly."""
    from pgsink_spark.operators.multimodal import IMG_W, mm_keyframes

    rows = mm_keyframes(spark, sf_dir).collect()
    by_vid: dict[int, list] = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    for vid, frames in by_vid.items():
        assert frames[0]["frame_idx"] == 0
        n = vid % 7 + 2
        for fr in frames:
            assert 0 <= fr["frame_idx"] < n
            fid = vid * 31 + fr["frame_idx"]
            h = 16 + fid % 16
            expect = (fid % 160) + (IMG_W - 1) / 2 + (h - 1) / 2
            assert fr["mean_px"] == expect


def test_phash_bands_recover_md5_bits(spark, sf_dir):
    """The decode-and-hash kernel must recover the exact md5-derived
    64-bit pattern from the PNG bytes: base image bands == the bands
    of md5(doc_id)[:8]; variant differs in exactly doc_id % 5 bits."""
    import hashlib

    from pgsink_spark.operators.multimodal import (
        phash_bands,
        synthesize_phash_images,
    )

    hashed = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in phash_bands(
            synthesize_phash_images(spark, sf_dir)
        ).collect()
    }
    doc_ids = sorted({m // 2 for m in hashed})
    assert len(doc_ids) >= 10
    for doc_id in doc_ids[:25]:
        hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:16], 16)
        expect = tuple((hv >> (16 * k)) & 0xFFFF for k in range(4))
        assert hashed[doc_id * 2] == expect
        vb = hashed[doc_id * 2 + 1]
        ham = sum(
            bin(a ^ b).count("1") for a, b in zip(expect, vb)
        )
        assert ham == doc_id % 5


def test_phash_banding_is_lossless_for_threshold(spark, sf_dir):
    """Pigeonhole guarantee the join relies on: every output pair
    (Hamming <= 2) shares at least 2 of the 4 bands exactly — so the
    banded candidate join cannot miss a qualifying pair. Checked on
    the operator's own output against the recomputed hashes."""
    from pgsink_spark.operators.multimodal import (
        mm_phash_neardup,
        phash_bands,
        synthesize_phash_images,
    )

    bands = {
        r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in phash_bands(
            synthesize_phash_images(spark, sf_dir)
        ).collect()
    }
    pairs = mm_phash_neardup(spark, sf_dir).collect()
    assert pairs
    for p in pairs:
        a, b = bands[p["media_a"]], bands[p["media_b"]]
        shared = sum(x == y for x, y in zip(a, b))
        assert shared >= 2
        assert p["hamming"] <= 2


def test_image_resize_matches_pixel_replay(spark, sf_dir):
    """mm_image_resize equals a direct numpy box-downsample of the
    decoded pixels (independent of the closed-form oracle)."""
    import numpy as np

    from pgsink_spark.functions import codecs
    from pgsink_spark.operators.multimodal import (
        mm_image_resize,
        synthesize_media,
    )

    media = {
        r["media_id"]: bytes(r["content"])
        for r in synthesize_media(spark, sf_dir)
        .where("media_type = 'image'")
        .collect()
    }
    got = {
        r["media_id"]: (r["out_w"], r["out_h"], r["n_px"], r["mean_px"])
        for r in mm_image_resize(spark, sf_dir).collect()
    }
    assert set(got) == set(media)
    for mid, content in media.items():
        px = codecs.decode_png(content)
        h2, w2 = px.shape[0] // 2, px.shape[1] // 2
        small = (
            px[: 2 * h2, : 2 * w2]
            .astype(np.float64)
            .reshape(h2, 2, w2, 2)
            .mean(axis=(1, 3))
        )
        assert got[mid] == (w2, h2, small.size, small.mean())
