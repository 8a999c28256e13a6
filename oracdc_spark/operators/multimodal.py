"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata
(the reference's LOB model: BLOB bytes + a per-column transformation
plugin, OraCdcLobTransformationsIntf.java:50 — e.g. "extract text from
PDF, push bytes to object store", doc/LogMinerConnector.adoc:49).

The Spark-side plumbing here is real and tested — schema, Arrow batch
shape, mapInPandas partitioning; the actual codec calls are STUBS
(``NotImplementedError`` or deterministic fakes) because no image/audio
libraries exist in this container.  Swap ``_decode_image_stub`` for PIL/
torchvision in production; the dataflow does not change.

Scale: mapInPandas streams Arrow batches — bytes never materialize on
the driver; batch size bounds executor memory
(spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("content", BinaryType(), True),      # opaque payload
        StructField("mime", StringType(), True),
        StructField("meta_json", StringType(), True),    # typed metadata
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature_version", StringType(), False),
    ]
)


def synthetic_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents (text bytes as the
    opaque payload) — exercises the binary-column path end-to-end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.to_json(F.struct(F.col("n_chars").alias("orig_chars"))).alias("meta_json"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: real impl would be PIL.Image.open(io.BytesIO(payload)).size.
    Deterministic fake derives dims from a digest so tests are stable."""
    h = hashlib.sha256(payload).digest()
    w, ht = struct.unpack(">HH", h[:4])
    return (w % 1920) + 1, (ht % 1080) + 1


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas): digest,
    byte length, stub-decoded dimensions for images."""
    from oracdc_spark.session import ship_package

    ship_package(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: None if b is None else len(b)),
                "digest": pdf["content"].map(
                    lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                ),
            }
            dims = [
                _decode_image_stub(b) if (k == "image" and b is not None) else (None, None)
                for k, b in zip(pdf["kind"], pdf["content"])
            ]
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["feature_version"] = "v1-stub"
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) work units
    without decoding (real decode = ffmpeg in the UDF). Demonstrates the
    explode-to-work-units pattern that keeps per-task memory flat."""
    n_frames = (F.length(F.col("content")) / 100).cast("int")  # fake frame count
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: raises on execution (no codec libs in-container);
    the plan (schema + UDF signature) is real and unit-tested."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires PIL/opencv — not available in this "
            "container; swap this stub in production"
        )

    return media.mapInPandas(gen, MEDIA_SCHEMA)
