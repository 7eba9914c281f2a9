"""Window function coverage (SURVEY.md §2.B): ranking, offsets, running and
framed aggregates, ntile, per-group top-k.

Determinism: every window ORDER BY carries a unique tiebreaker key so row
numbering is total. Running float sums are decimal-exact (the frame fold
order is then irrelevant).

Scale: every window here is PARTITIONED (window_range_between by
o_orderpriority, window_ntile by c_mktsegment — the shape that scales);
the no-unpartitioned-window plan gate in tests/test_plans.py enforces it.
Frame semantics (rangeBetween, ntile) are covered within those partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


@register(
    "window_row_number",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 2 ORDER BY o_custkey, rn
    """,
    doc="row_number per customer, first two orders.",
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS size_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS size_drank
    FROM part WHERE p_partkey <= 300
    ORDER BY p_brand, size_rank, p_partkey
    """,
    doc="rank/dense_rank with legitimate ties (p_size).",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).cast("bigint").alias("size_rank"),
            F.dense_rank().over(w).cast("bigint").alias("size_drank"),
        )
        .orderBy("p_brand", "size_rank", "p_partkey")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS micros_since_prev
    FROM events WHERE user_id < 10
    ORDER BY user_id, ts, event_id
    """,
    doc="lag/lead offsets and inter-event gap seconds.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return (
        t["events"]
        .filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))).alias(
                "micros_since_prev"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Running (cumulative) decimal-exact sum per customer.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "window_range_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
             AS n_within_1000
    FROM orders WHERE o_custkey < 50
    ORDER BY o_orderpriority, o_totalprice, o_orderkey
    """,
    doc=(
        "RANGE frame: count of same-priority orders within a price band "
        "below each row. Partitioned by priority — a RANGE frame never "
        "forces a global single-task sort."
    ),
)
def window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_within_1000"),
        )
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS bal_quartile
    FROM customer ORDER BY c_custkey
    """,
    doc=(
        "ntile quartiles within each market segment. Partitioned: a global "
        "NTILE needs a total order (single task); per-segment quartiles are "
        "the shape that scales."
    ),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        )
        .orderBy("c_custkey")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
      FROM customer
    ) WHERE rk <= 3 ORDER BY c_mktsegment, rk
    """,
    doc="Per-group top-k via row_number (the scalable top-k pattern).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t["customer"]
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
    doc="first_value/last_value over an unbounded frame.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("o_custkey")
    return (
        t["orders"]
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.count(F.lit(1)).over(wc).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )
