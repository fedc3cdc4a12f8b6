"""Multimodal plumbing tests: binary payload schema, Arrow-batched feature
extraction via mapInPandas, frame-sampling plan, decode-stub gating."""

import hashlib

import pyspark.sql.functions as F
import pytest

from streaming_feature_store_spark.operators.multimodal import (
    _HAS_PIL,
    _decode_image,
    extract_payload_features,
    sample_frames,
    synthetic_media,
)


def test_payload_feature_extraction(spark):
    media = synthetic_media(spark, 20)
    feats = {r["media_id"]: r for r in extract_payload_features(media).collect()}
    assert len(feats) == 20
    # sha1 computed in the pandas kernel must match a locally computed one
    payload = media.filter(F.col("media_id") == 3).collect()[0]["payload"]
    assert feats[3]["payload_sha1"] == hashlib.sha1(payload).hexdigest()
    assert feats[3]["payload_bytes"] == len(payload)


def test_frame_sampling_plan(spark):
    vids = synthetic_media(spark, 3, kind="video").withColumn(
        "duration_ms", F.lit(3500).cast("long")
    )
    frames = sample_frames(vids, every_ms=1000).collect()
    # 0,1000,2000,3000 per video
    assert len(frames) == 12


def test_decode_stub_gated():
    if _HAS_PIL:
        pytest.skip("PIL present; stub not applicable")
    with pytest.raises(NotImplementedError):
        _decode_image(b"xx")


def test_decode_image_features_with_pil(spark):
    """The REAL decode kernel, exercised wherever PIL exists (skips in this
    rig): build an in-memory PNG, run the Arrow-batched decode, check
    dimensions/mode and that a corrupt payload nulls out instead of
    failing the batch."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from streaming_feature_store_spark.operators.multimodal import (
        decode_image_features,
    )

    buf = io.BytesIO()
    PIL_Image.new("RGB", (8, 5), color=(10, 20, 30)).save(buf, format="PNG")
    rows = [(0, "image", "png", bytearray(buf.getvalue())),
            (1, "image", "png", bytearray(b"not-an-image"))]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, fmt string, payload binary"
    )
    got = {r["media_id"]: r for r in decode_image_features(df).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["mode"]) == (8, 5, "RGB")
    assert got[0]["mean_luma"] is not None
    assert got[1]["width"] is None  # corrupt payload -> nulls, not job failure
