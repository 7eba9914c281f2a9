"""Embedding compression operators (training-data pipeline surface).

int8 symmetric quantization is the standard way to cut an embedding
store 4x before ANN indexing. The cross-engine contract avoids every
order-sensitive float reduction: the scale factor is a MAX (exact,
order-free), quantized codes are integers (exact), code sums are integer
sums (exact), and the reconstruction-error check is a MAX of per-element
IEEE-identical double expressions, rounded to 6dp. No float SUM crosses
an engine boundary.

Scale: one projection, no shuffle except the output sort; per-row work is
a JVM-side higher-order function over a 64-float array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             -- malformed-vector guard (r9 NaN probe): an empty vector or
             -- any non-finite element NULLs the stats instead of erroring
             -- (CAST(NaN AS INT) kills the job on BOTH engines otherwise)
             len(embedding) = 0 OR NOT coalesce(
               list_bool_and(list_transform(embedding,
                                            x -> isfinite(CAST(x AS DOUBLE)))), false) AS bad,
             -- all-zero vector: clamp the scale to 1 so codes are 0 --
             -- IEEE 0/0 = NaN here and CAST(NaN AS INT) errors, while
             -- Spark's non-ANSI divide would yield NULL: both wrong
             GREATEST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                      CASE WHEN list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1.0 ELSE 0.0 END) AS maxabs
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(emb) AS INT) AS n_dims,
           CASE WHEN NOT bad THEN
             CAST(list_min(list_transform(emb, x -> round(x * 127.0 / maxabs))) AS INT) END AS q_min,
           CASE WHEN NOT bad THEN
             CAST(list_max(list_transform(emb, x -> round(x * 127.0 / maxabs))) AS INT) END AS q_max,
           CASE WHEN NOT bad THEN
             CAST(list_sum(list_transform(emb, x -> CAST(round(x * 127.0 / maxabs) AS INT))) AS INT) END AS q_sum,
           CASE WHEN NOT bad THEN
             ROUND(list_max(list_transform(emb,
                   x -> abs(x - round(x * 127.0 / maxabs) * maxabs / 127.0))), 6) END AS max_recon_err
    FROM e ORDER BY vec_id
    """,
    doc=(
        "Symmetric int8 quantization of the embedding column: scale = "
        "max|x|, code = round(127 x / scale), plus the max reconstruction "
        "error — code range/sum are exact integers and the error check is "
        "an order-insensitive MAX, so the whole thing hash-matches DuckDB. "
        "Malformed vectors (empty, or any NaN/Inf element — legal-at-scale "
        "embedder failures) keep their row with NULL stats on both engines "
        "(r9 probe: a bare CAST(NaN AS INT) ANSI-killed the whole job, and "
        "empty vectors diverged via aggregate-seed 0 vs list_sum NULL)."
    ),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    q = "round(x * 127.0D / maxabs)"
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        # malformed-vector guard (r9 NaN probe): empty or any-non-finite
        # vectors keep their row with NULL stats — a bare CAST(NaN AS INT)
        # would ANSI-kill the whole job on one bad embedder row, and empty
        # vectors diverged (aggregate seed 0 vs DuckDB list_sum NULL)
        .withColumn(
            "bad",
            F.expr(
                "size(emb) = 0 OR exists(emb, x -> isnan(x)"
                " OR abs(x) = CAST('Infinity' AS DOUBLE))"
            ),
        )
        # all-zero vector: clamp the scale to 1 (codes are 0 regardless) —
        # x/0 is NULL under Spark's non-ANSI divide and NaN in DuckDB,
        # diverging the engines; the oracle applies the identical clamp
        .withColumn(
            "maxabs",
            F.expr(
                "CASE WHEN array_max(transform(emb, x -> abs(x))) = 0.0D THEN 1.0D"
                " ELSE array_max(transform(emb, x -> abs(x))) END"
            ),
        )
        .select(
            "vec_id",
            F.size("emb").cast("int").alias("n_dims"),
            F.expr(f"CASE WHEN NOT bad THEN CAST(array_min(transform(emb, x -> {q})) AS INT) END").alias("q_min"),
            F.expr(f"CASE WHEN NOT bad THEN CAST(array_max(transform(emb, x -> {q})) AS INT) END").alias("q_max"),
            F.expr(
                f"CASE WHEN NOT bad THEN"
                f" aggregate(transform(emb, x -> CAST({q} AS INT)), 0, (a, x) -> a + x) END"
            ).alias("q_sum"),
            F.expr(
                f"CASE WHEN NOT bad THEN"
                f" ROUND(array_max(transform(emb, x -> abs(x - {q} * maxabs / 127.0D))), 6) END"
            ).alias("max_recon_err"),
        )
        .orderBy("vec_id")
    )
