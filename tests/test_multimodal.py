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
