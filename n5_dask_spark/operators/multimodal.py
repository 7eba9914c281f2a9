"""Multimodal column handling (driver-mandated; the reference's binary N5
image blocks are the precedent — SURVEY.md §1.5, §2.B).

Pattern: media as opaque BinaryType payload + typed metadata columns in one
DataFrame; decode / feature-extract as Arrow-batched pandas UDFs via
mapInPandas. The container has no image/audio libs, so the real decoders are
stubbed behind try-imports (NotImplementedError) and a deterministic fake
feature extractor exercises the full Spark plumbing — schema, batching,
partitioning — end-to-end.

``multimodal_feature_extract`` runs the actual mapInPandas pipeline (binary
payload -> python batch -> features) and its features are deterministic
(byte length + md5 + first-bytes checksum), so even the Python-side path is
oracle-checked against DuckDB.

Scale: mapInPandas streams Arrow record batches; payloads never pass through
Python row-at-a-time. Batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch; binary payloads of ~1-10 MB
per row at 100 TB = tens of rows per batch — set maxRecordsPerBatch
accordingly (the N5 block reader does exactly this, sources/n5/reader.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


try:  # optional dep: real decode engages automatically when pillow exists
    import PIL.Image as _PILImage
except ImportError:  # this container: deterministic fallback is the oracle path
    _PILImage = None


def decode_image(payload: bytes) -> "object":
    """Decode image bytes to an HxWxC uint8 ndarray via pillow when present.

    The Spark-side plumbing (binary column -> mapInPandas batches) is real
    and tested either way; without pillow this raises NotImplementedError
    and the deterministic ``_fake_features`` extractor remains the
    oracle-checked path.
    """
    if _PILImage is None:
        raise NotImplementedError(
            "image decoding requires pillow (not installed in this container); "
            "the deterministic feature extractor is the supported fallback"
        )
    import io

    import numpy as np

    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor over binary payloads."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                "content_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "first_byte": payloads.map(lambda b: int(b[0]) if len(b) else -1).astype("int32"),
                "last_byte": payloads.map(lambda b: int(b[-1]) if len(b) else -1).astype("int32"),
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table: documents' text bytes as the opaque
    payload (binary) + typed metadata — the blocks-DF pattern of §1.5."""
    t = load_tables(spark, sf_dir, ("documents",))
    # single-file input -> fan out so pandas-UDF batches run on all cores
    return t["documents"].repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode("text", "UTF-8").cast(BinaryType()).alias("payload"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte
    FROM documents ORDER BY doc_id
    """,
    doc=(
        "Binary-payload feature extraction through mapInPandas (Arrow "
        "batches); deterministic fake decode so the Python path is "
        "oracle-checked. ascii() works as byte value because the synthetic "
        "text is pure ASCII."
    ),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    feats = media.mapInPandas(_fake_features, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")


@register(
    "multimodal_metadata_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY 1 ORDER BY media_type
    """,
    doc="Typed-metadata aggregation over the multimodal table (JVM-side only).",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
            F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
        )
        .orderBy("media_type")
    )
