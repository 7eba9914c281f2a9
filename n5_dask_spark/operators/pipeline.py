"""Composed training-data pipeline (the end-to-end narrative the
LLM-pipeline operators exist for): quality-filter -> near-dup removal ->
surviving corpus stats, as ONE declarative plan. Catalyst fuses the stages;
nothing materializes between them.

Also knn_ivf_probe: an IVF-style ANN search where the coarse quantizer is
the `label` column (an IVF cell id): per-cell centroids on the leading
dimensions pick the nprobe closest cells per query, and the exact cosine
rank runs only inside those cells. Fully deterministic -> oracle-checked.
The production variant replaces `label` with k-means cell ids; the plan
shape (centroid broadcast -> cell-pruned join -> in-cell rank) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.operators.dedup import (
    DUCK_MINHASH_PAIRS,
    DUCK_SHINGLES,
    DUCK_TOKENS,
    N_BANDS,
    N_PERM,
    SPARK_N_TOKENS,
    SPARK_TOKENS,
)
from n5_dask_spark.operators.similarity import (
    DUCK_COSINE,
    N_QUERIES,
    TOP_K,
    cosine_prenorm_col,
    norm_col,
)
from n5_dask_spark.registry import register


@register(
    "pipeline_clean_corpus",
    # dup_pairs composed from dedup.DUCK_MINHASH_PAIRS (same pair graph as
    # dedup_minhash_lsh by construction; the Spark side calls that function,
    # so oracle and implementation track each other automatically)
    oracle=f"""
    WITH dup_pairs AS (
      SELECT doc_a, doc_b FROM ({DUCK_MINHASH_PAIRS})
    ), quality AS (
      SELECT doc_id, lang, source,
             CAST(len({DUCK_TOKENS}) AS INT) AS n_tokens
      FROM documents
      WHERE len({DUCK_TOKENS}) BETWEEN 20 AND 500
    ), kept AS (
      SELECT q.* FROM quality q
      WHERE NOT EXISTS (SELECT 1 FROM dup_pairs d WHERE d.doc_b = q.doc_id)
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM kept GROUP BY lang ORDER BY lang
    """,
    doc=(
        "End-to-end corpus cleaning: token-count quality gate -> MinHash-LSH "
        "near-dup removal (higher doc_id of each pair dropped via anti-join) "
        "-> per-language corpus stats. One fused declarative plan."
    ),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the UNSORTED pair helper (r14): the registered query's presentation
    # orderBy is a range exchange + sampling pass that the distinct/anti-join
    # below would immediately destroy; the pair SET is identical
    from n5_dask_spark.operators.dedup import minhash_candidate_pairs

    t = load_tables(spark, sf_dir, ("documents",))
    n_tokens = F.expr(SPARK_N_TOKENS).cast("int")
    quality = (
        t["documents"]
        .select("doc_id", "lang", "source", n_tokens.alias("n_tokens"))
        .filter(F.col("n_tokens").between(20, 500))
    )
    dup_pairs = minhash_candidate_pairs(spark, sf_dir)
    losers = dup_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = quality.join(losers, "doc_id", "left_anti")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang")
    )


# centroid distance on the leading 8 dims, decimal-exact means -> identical
# cell ranking on both engines
_N_CENTROID_DIMS = 8
_NPROBE = 2


def _duck_centroid_cols() -> str:
    return ", ".join(
        f"CAST(SUM(CAST(CAST(embedding[{d + 1}] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c{d}"
        for d in range(_N_CENTROID_DIMS)
    )


def _duck_centroid_dist(prefix: str) -> str:
    return " + ".join(
        f"POW(CAST(q.qe[{d + 1}] AS DOUBLE) - {prefix}.c{d}, 2)" for d in range(_N_CENTROID_DIMS)
    )


@register(
    "knn_ivf_probe",
    oracle=f"""
    WITH cents AS (
      SELECT label, {_duck_centroid_cols()} FROM embeddings GROUP BY label
    ), q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
    ), cellrank AS (
      SELECT q.qid, c.label,
             ROW_NUMBER() OVER (PARTITION BY q.qid
                                ORDER BY ROUND({_duck_centroid_dist('c')}, 6), c.label) AS crk
      FROM q CROSS JOIN cents c
    ), probed AS (
      SELECT qid, label FROM cellrank WHERE crk <= {_NPROBE}
    ), scored AS (
      SELECT q.qid, e.vec_id,
             ROUND({DUCK_COSINE.format(a='q.qe', b='e.embedding')}, 6) + 0.0 AS cosine
      FROM q JOIN probed p ON p.qid = q.qid
      JOIN embeddings e ON e.label = p.label AND e.vec_id <> q.qid
    ), ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    SELECT qid, CAST(rn AS BIGINT) AS rn, vec_id, cosine
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY qid, rn
    """,
    doc=(
        "IVF-style ANN: rank cells by centroid distance (leading dims, "
        "decimal-exact means), probe the 2 closest cells, exact cosine rank "
        "inside them."
    ),
)
def knn_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = widen(t["embeddings"])
    cents = emb.groupBy("label").agg(
        *[
            # try_element_at: one short embedding row must not ANSI-throw and
            # kill the centroid job; NULL is skipped by SUM like DuckDB's [i].
            # FLOAT -> DOUBLE before DECIMAL: DuckDB's direct float->decimal
            # cast scales in float32 (a ~3e-8 divergence; see arrayops.py).
            F.expr(
                f"CAST(SUM(CAST(CAST(try_element_at(embedding, {d + 1}) AS DOUBLE)"
                " AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)"
            ).alias(f"c{d}")
            for d in range(_N_CENTROID_DIMS)
        ]
    )
    # norms precomputed per vector (r14, similarity.norm_col): the probe
    # join's inline cosine recomputed both norms per candidate pair
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        norm_col("embedding").alias("qn"),
    )
    dist = F.round(
        sum(
            F.pow(F.expr(f"CAST(try_element_at(qe, {d + 1}) AS DOUBLE)") - F.col(f"c{d}"), F.lit(2))
            for d in range(_N_CENTROID_DIMS)
        ),
        6,
    )
    wcell = Window.partitionBy("qid").orderBy(dist.asc(), F.col("label"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("crk", F.row_number().over(wcell))
        .filter(F.col("crk") <= _NPROBE)
        .select("qid", "qe", "qn", "label")
    )
    scored = (
        emb.withColumnRenamed("label", "elabel")
        .withColumn("nrm", norm_col("embedding"))
        .join(
            F.broadcast(probed),
            (F.col("elabel") == F.col("label")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "vec_id",
            F.round(cosine_prenorm_col("qe", "embedding", "qn", "nrm"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "rn", "vec_id", "cosine")
        .orderBy("qid", "rn")
    )
