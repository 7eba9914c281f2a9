"""Round-2 relational widening: distribution window functions, argmin/
argmax + boolean aggregates, and corpus-level bigram language-model
scoring (SURVEY.md §2.B window/aggregation/text rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.operators.dedup import DUCK_TOKENS, SPARK_TOKENS
from n5_dask_spark.registry import register


@register(
    "window_distribution_funcs",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(10) OVER w AS INT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    doc=(
        "percent_rank / cume_dist / ntile within each segment (partitioned "
        "windows; the (acctbal, custkey) order key is total, so ranks are "
        "deterministic; round-6 covers the rank/(n-1) division)."
    ),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(10).over(w).cast("int").alias("decile"),
        )
        .orderBy("c_custkey")
    )


@register(
    "agg_argminmax_bool",
    oracle="""
    SELECT o_orderpriority,
           CAST(ARG_MAX(o_custkey, o_orderkey) AS BIGINT) AS latest_custkey,
           CAST(ARG_MIN(o_custkey, o_orderkey) AS BIGINT) AS earliest_custkey,
           BOOL_AND(o_totalprice > 1000) AS all_over_1000,
           BOOL_OR(o_orderstatus = 'P') AS any_pending,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=(
        "argmin/argmax (min_by/max_by keyed on the UNIQUE o_orderkey, so "
        "ties cannot occur and both engines pick the same row) + boolean "
        "aggregates."
    ),
)
def agg_argminmax_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_custkey", "o_orderkey").cast("bigint").alias("latest_custkey"),
            F.min_by("o_custkey", "o_orderkey").cast("bigint").alias("earliest_custkey"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1000"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "text_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {DUCK_TOKENS} AS w FROM documents
    ), flat AS (
      -- linear flat/LEAD form, not the lateral `UNNEST(range(..)) .. w[i]`:
      -- the lateral duplicates the whole token list per generated row —
      -- O(n^2) on a long document (see dedup.DUCK_SHINGLES). Bigrams are a
      -- MULTISET here (counts feed the MLE), so no DISTINCT: LEAD emits
      -- exactly the same len(w)-1 ordered pairs per ROW. The window
      -- partitions on a per-row id like DUCK_SHINGLES so duplicate
      -- doc_ids can never interleave token positions across rows.
      SELECT doc_id, rid, unnest(w) AS tok, generate_subscripts(w, 1) AS i
      FROM (SELECT doc_id, ROW_NUMBER() OVER () AS rid, w FROM toks)
    ), bigrams AS (
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, tok AS w1,
               LEAD(tok, 1) OVER (PARTITION BY rid ORDER BY i) AS w2
        FROM flat
      ) WHERE w2 IS NOT NULL
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1
    ), bi AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(ROUND(LN(CAST(bi.c12 AS DOUBLE) / uni.c1), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM bigrams b
    JOIN bi  ON bi.w1 = b.w1 AND bi.w2 = b.w2
    JOIN uni ON uni.w1 = b.w1
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    doc=(
        "Corpus bigram LM scoring: per-doc mean log P(w2|w1) with MLE "
        "probabilities counted over the whole corpus — the perplexity-style "
        "quality signal LLM pipelines gate on. Each log is rounded to 6dp "
        "BEFORE the decimal-exact average, so libm 1-ulp differences can "
        "never reach the comparison. All JVM-side: split/sequence/"
        "transform + two count aggregations + hash joins back to instances."
    ),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    # widen first: a single local parquet file arrives as one partition
    docs = widen(t["documents"])
    bigrams = (
        docs.select("doc_id", F.expr(SPARK_TOKENS).alias("w"))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))"
                " ELSE array() END"
            ).alias("bg"),
        )
        .select("doc_id", F.explode_outer("bg").alias("b"))
        .filter(F.col("b").isNotNull())
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # r14 optimization (guide §2.4): the context count c1 = COUNT of bigram
    # instances with this w1 = SUM over w2 of c12 — derive it from the
    # already-counted bi table instead of a THIRD tokenize+explode pass
    # over the corpus (bigrams was evaluated once per reference: instances,
    # uni, bi; exchange reuse cannot merge groupBys on different keys).
    # Exactly one fewer full corpus pass + one fewer corpus-scale exchange;
    # the re-aggregation input is the counted table (one row per distinct
    # bigram). Values identical by the counting identity.
    uni = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    logp = F.round(F.log(F.col("c12").cast("double") / F.col("c1")), 6)
    return (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # exact decimal SUM then double division: Spark's decimal AVG
            # rounds to scale+4 while DuckDB's returns a full double
            (F.sum(logp.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)))
            .alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )
