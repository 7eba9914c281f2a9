"""Train/eval decontamination (training-data pipeline surface).

Benchmark contamination — eval documents leaking into the training corpus
— is detected the standard way: n-gram overlap. The eval set's shingles
form one side, the training corpus's the other, and any training document
sharing a shingle with any eval document is flagged with its overlap
counts. Expressed as a shingle equi-join, the plan is the same
bucketed-by-shingle shape as the LSH dedup family: candidate generation is
O(collisions) on the shingle key, never a document cross product, and the
eval side (small by construction) broadcasts.

Here the "eval set" is carved deterministically out of ``documents``
(doc_id % 97 == 0) so the oracle can reproduce it; in production it would
be the benchmark suite's n-gram table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators.dedup import DUCK_SHINGLES, _spark_shingles
from n5_dask_spark.registry import register

_EVAL_MOD = 97


@register(
    "decontaminate_ngram_overlap",
    oracle=DUCK_SHINGLES
    + f"""
    SELECT t.doc_id AS train_doc_id,
           CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs_matched
    FROM (SELECT * FROM sh WHERE doc_id % {_EVAL_MOD} != 0) t
    JOIN (SELECT * FROM sh WHERE doc_id % {_EVAL_MOD} = 0) e
      ON t.shingle = e.shingle
    GROUP BY t.doc_id
    ORDER BY train_doc_id
    """,
    doc=(
        "Train/eval decontamination: flag training documents sharing any "
        "3-token shingle with the (deterministic) eval split, with distinct "
        "shared-shingle and matched-eval-doc counts. Shingle equi-join — "
        "bucketed by shingle, broadcast-able eval side, no cross product."
    ),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = _spark_shingles(docs)
    train = sh.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    eval_sh = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    return (
        train.join(eval_sh, "shingle")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs_matched"),
        )
        .orderBy("train_doc_id")
    )


_BOILER_MIN_DF = 5


@register(
    "text_boilerplate_shingles",
    oracle=DUCK_SHINGLES
    + f"""
    , n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT sh.shingle,
           CAST(COUNT(DISTINCT sh.doc_id) AS BIGINT) AS df,
           ROUND(CAST(COUNT(DISTINCT sh.doc_id) AS DOUBLE) / (SELECT n_docs FROM n), 6)
             AS pct_docs
    FROM sh GROUP BY sh.shingle
    HAVING COUNT(DISTINCT sh.doc_id) >= {_BOILER_MIN_DF}
    ORDER BY df DESC, shingle
    """,
    doc=(
        "Boilerplate detection: 3-token shingles appearing in >= 5 "
        "distinct documents, with document-frequency coverage — the "
        "repeated-segment census behind banner/template removal in corpus "
        "cleaning. Shingle explode -> groupBy(shingle) with map-side "
        "partial aggregation; raw text never shuffles, only "
        "(shingle, doc_id) pairs."
    ),
)
def text_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # n_docs stays IN the plan (broadcast 1-row aggregate, the oracle's
    # scalar subquery shape): an eager .count() here would launch a full
    # scan job at DataFrame-construction time, even for explain-only
    # callers, and scan documents once more than the query needs
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    sh = _spark_shingles(docs)
    return (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DF)
        .crossJoin(F.broadcast(n))
        .select(
            "shingle",
            "df",
            F.round(F.col("df").cast("double") / F.col("n_docs"), 6).alias("pct_docs"),
        )
        .orderBy(F.col("df").desc(), "shingle")
    )
