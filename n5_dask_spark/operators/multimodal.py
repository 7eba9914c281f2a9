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
Python row-at-a-time. Batch MEMORY is byte-bounded in both directions:
JVM->Python by spark.sql.execution.arrow.maxBytesPerBatch (64 MB, pinned in
session.DEFAULT_CONFS — binary payloads of ~1-10 MB per row at 100 TB =
tens of rows per batch, automatically), Python->JVM by
udfbatch.bounded_frames wherever a kernel's output payload can exceed its
input (decoders, synthesizers — see _fake_pcm in multimodal2.py and the
udfbatch module docstring for the r11 probe that motivated this).
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

from n5_dask_spark.catalog import load_tables, widen
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
    """Decode image bytes to an HxWx3 uint8 RGB ndarray.

    Pillow handles every format when present; without it, PNG decodes via
    the stdlib-only codec (``sources/png.py`` — zlib + unfilter, no
    dependencies), so the image path is REAL in this container. Non-PNG
    payloads without pillow still raise NotImplementedError and the
    deterministic ``_fake_features`` extractor remains the oracle path.
    """
    import numpy as np

    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from n5_dask_spark.sources.png import png_decode

        img = png_decode(payload)
        c = img.shape[2]
        if c == 1:  # gray -> RGB
            return np.repeat(img, 3, axis=2)
        if c == 2:  # gray+alpha -> RGB (alpha dropped, like convert("RGB"))
            return np.repeat(img[:, :, :1], 3, axis=2)
        if c == 4:  # RGBA -> RGB
            return np.ascontiguousarray(img[:, :, :3])
        return img
    raise NotImplementedError(
        "non-PNG image decoding requires pillow (not installed in this "
        "container); PNG decodes via the stdlib codec, and the "
        "deterministic feature extractor is the fallback for the rest"
    )


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
    # narrow local scans fan out so pandas-UDF batches run on all cores
    return widen(t["documents"]).select(
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
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           -- empty payload pins first/last byte = -1 on BOTH engines (the
           -- Python side's "no byte" sentinel; DuckDB's bare ascii('')
           -- returns 0, ambiguous with a real NUL byte) — found by the
           -- degenerate-corpus multimodal fuzz net
           CASE WHEN length(text) = 0 THEN -1
                ELSE CAST(ascii(substr(text, 1, 1)) AS INT) END AS first_byte,
           CASE WHEN length(text) = 0 THEN -1
                ELSE CAST(ascii(substr(text, length(text), 1)) AS INT) END AS last_byte
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


PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decoded_md5", StringType()),
    ]
)


def _png_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Render each doc's leading text bytes as a real PNG (16px-wide
    grayscale), then DECODE it with the stdlib codec and fingerprint the
    reconstructed pixels. The encoder cycles all five scanline filters per
    row, so the md5 only matches the oracle if every unfilter path is
    byte-exact."""
    import hashlib as _hashlib

    import numpy as np

    from n5_dask_spark.sources.png import png_decode, png_encode

    for pdf in batches:
        ids, ws, hs, cs, md5s = [], [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            data = text.encode("utf-8")[:256]
            h = len(data) // 16
            if h < 1:
                continue  # mirrored by the oracle's length(text) >= 16
            arr = np.frombuffer(data[: h * 16], np.uint8).reshape(h, 16)
            dec = png_decode(png_encode(arr))
            ids.append(doc_id)
            ws.append(dec.shape[1])
            hs.append(dec.shape[0])
            cs.append(dec.shape[2])
            md5s.append(_hashlib.md5(dec.tobytes()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "channels": pd.Series(cs, dtype="int32"),
                "decoded_md5": pd.Series(md5s, dtype="object"),
            }
        )


@register(
    "multimodal_png_decode",
    oracle="""
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(least(length(text), 256) // 16 AS INT) AS height,
           CAST(1 AS INT) AS channels,
           md5(substr(text, 1, (least(length(text), 256) // 16) * 16)) AS decoded_md5
    FROM documents
    WHERE length(text) >= 16
    ORDER BY doc_id
    """,
    doc=(
        "REAL image decode with zero native deps: text bytes -> PNG encode "
        "(filters cycling 0-4 per row) -> stdlib PNG decode -> pixel md5, "
        "all inside mapInPandas. The oracle recomputes the md5 from the "
        "same text slice (ASCII, so characters == bytes), pinning the "
        "decoder byte-exactly. VERDICT r5 item 4."
    ),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    docs = widen(t["documents"]).select("doc_id", "text")
    return docs.mapInPandas(_png_roundtrip, schema=PNG_SCHEMA).orderBy("doc_id")


@register(
    "multimodal_metadata_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
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
