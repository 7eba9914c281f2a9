"""Third relational batch: FILTER-clause aggregates, statistical
co-aggregates, and Levenshtein fuzzy matching (the edit-distance member of
the dedup family — block by a cheap key, then exact distance inside blocks,
the same candidate-then-verify shape as the LSH operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_quantity > 25) AS DOUBLE)
             AS bulk_revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="FILTER clause on aggregates (conditional aggregation without self-joins).",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               COUNT(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_quantity > 25) AS DOUBLE)
                 AS bulk_revenue
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "agg_corr_covar",
    oracle="""
    SELECT c_mktsegment,
           ROUND(CORR(o_totalprice, c_acctbal), 6) + 0.0 AS price_bal_corr,
           ROUND(COVAR_SAMP(o_totalprice, c_acctbal), 4) + 0.0 AS price_bal_covar,
           COUNT(*) AS n
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Correlation / covariance co-aggregates (rounded: accumulation order).",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.corr("o_totalprice", "c_acctbal"), 6).alias("price_bal_corr"),
            F.round(F.covar_samp("o_totalprice", "c_acctbal"), 4).alias("price_bal_covar"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "fuzzy_match_levenshtein",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
     AND a.p_partkey < 200 AND b.p_partkey < 200
    WHERE levenshtein(a.p_name, b.p_name) <= 3 AND a.p_name <> b.p_name
    ORDER BY part_a, part_b
    """,
    doc=(
        "Fuzzy matching: candidate pairs blocked by p_type (the cheap key), "
        "exact Levenshtein verified inside blocks — candidate-then-verify, "
        "like the LSH dedups. ASCII-scoped contract (differential fuzzing, "
        "tests/test_dedup_cap.py): Spark's levenshtein counts CODEPOINTS "
        "while DuckDB's counts UTF-8 BYTES, so the engines agree exactly "
        "on ASCII (p_name here) and a non-ASCII corpus would need a "
        "codepoint-distance UDF on the oracle side."
    ),
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"].filter(F.col("p_partkey") < 200).select("p_partkey", "p_name", "p_type")
    a = p.select(
        F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a"), F.col("p_type").alias("type_a")
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"), F.col("p_type").alias("type_b")
    )
    return (
        a.join(b, (F.col("type_a") == F.col("type_b")) & (F.col("part_a") < F.col("part_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter((F.col("edit_dist") <= 3) & (F.col("name_a") != F.col("name_b")))
        .select("part_a", "part_b", "name_a", "name_b", "edit_dist")
        .orderBy("part_a", "part_b")
    )
