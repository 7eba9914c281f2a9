"""Array / nested-type scalar operators over ``embeddings`` (SURVEY.md §2.B
scalar-functions row: array_* family; stays entirely JVM-side via built-in
higher-order functions — the same machinery the N5 block layer uses for
coordinate math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_val,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) + 0.0 AS last_val,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) + 0.0 AS vec_sum,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) + 0.0 AS vec_max,
           ROUND(list_min(CAST(embedding AS DOUBLE[])), 6) + 0.0 AS vec_min,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_positive
    FROM embeddings ORDER BY vec_id
    """,
    doc="Array functions: size, subscript, fold-sum, min/max, filter-count.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    # last_val indexes size(embedding), not a hard-coded dimension: the old
    # element_at(embedding, 64) threw ANSI ArrayIndexOutOfBounds on ANY
    # corpus whose vectors aren't 64-wide (found by the embeddings fuzz
    # net); on 64-dim data the two are identical. try_element_at (NULL,
    # never throw) + a NULL fold-sum on empty arrays match DuckDB's
    # embedding[i] / list_sum conventions exactly.
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.size("embedding").cast("int").alias("dim"),
            F.round(F.expr("try_element_at(embedding, 1)").cast("double"), 6).alias("first_val"),
            # the CASE guards size = 0: even try_element_at throws
            # INVALID_INDEX_OF_ZERO on index 0
            F.round(
                F.expr(
                    "CASE WHEN size(embedding) = 0 THEN NULL"
                    " ELSE try_element_at(embedding, size(embedding)) END"
                ).cast("double"),
                6,
            ).alias("last_val"),
            F.round(
                F.expr(
                    f"CASE WHEN size(embedding) = 0 THEN NULL"
                    f" ELSE aggregate({dbl}, CAST(0.0 AS DOUBLE), (a, v) -> a + v) END"
                ),
                6,
            ).alias("vec_sum"),
            F.round(F.array_max(F.expr(dbl)), 6).alias("vec_max"),
            F.round(F.array_min(F.expr(dbl)), 6).alias("vec_min"),
            F.size(F.expr(f"filter({dbl}, x -> x > 0)")).cast("int").alias("n_positive"),
        )
        .orderBy("vec_id")
    )


@register(
    "array_label_centroids",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS centroid_d1,
           ROUND(CAST(SUM(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) + 0.0 AS centroid_d2
    FROM embeddings GROUP BY label ORDER BY label
    """,
    doc="Per-label centroid components (decimal-exact mean of array elements).",
)
def array_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    def comp(i: int, alias: str):
        # try_element_at: a short/empty embedding yields NULL (SUM skips it)
        # instead of an ANSI ArrayIndexOutOfBounds that would kill the whole
        # job on one malformed row — matching DuckDB's embedding[i] -> NULL.
        # The explicit FLOAT -> DOUBLE hop before DECIMAL is load-bearing:
        # DuckDB casts FLOAT to DECIMAL(18,9) by scaling in float32
        # arithmetic (9.0f -> 8.999999488), Spark via the shortest decimal
        # repr (9.0f -> 9.0) — a latent per-element divergence of up to
        # ~3e-8. Both engines cast DOUBLE to DECIMAL consistently, and a
        # double holds every float32 exactly, so double-first is stable.
        return F.round(
            F.expr(
                f"CAST(SUM(CAST(CAST(try_element_at(embedding, {i}) AS DOUBLE)"
                " AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)"
            ),
            6,
        ).alias(alias)

    return (
        t["embeddings"]
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), comp(1, "centroid_d1"), comp(2, "centroid_d2"))
        .orderBy("label")
    )
