"""TPC-H completion set: the nine queries (Q2, Q11-Q13, Q15-Q17, Q20, Q21)
missing from round 1, adapted to the driver schema (no partsupp table, no
l_shipmode / l_commitdate / l_receiptdate — FIXTURES.md §B). Part-supplier
relationships derive from lineitem; "commit vs receipt" lateness becomes
shipdate-vs-orderdate lateness. Each keeps its query's structural point:
correlated min (Q2), HAVING vs global scalar (Q11), conditional counts
(Q12), outer-join histogram (Q13), view + max subquery (Q15), distinct
count with exclusion anti-join (Q16), correlated avg threshold (Q17),
semi-join on an aggregate (Q20), multi-pass "only late supplier" (Q21).

Subquery-shaped queries run through spark.sql — identical text on both
engines; Catalyst decorrelates and the plans stay broadcast-dim shaped.
Determinism: decimal-exact sums cast to double, identical operand order,
unique ORDER BY tiebreakers (registry.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register

DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


Q2_SQL = """
    WITH costs AS (
      SELECT l_partkey, l_suppkey, ROUND(MIN(l_extendedprice / l_quantity), 6) + 0.0 AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part JOIN costs ON l_partkey = p_partkey
              JOIN eu ON s_suppkey = l_suppkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND unit_cost = (SELECT MIN(c2.unit_cost)
                       FROM costs c2 JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
                       WHERE c2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    oracle=Q2_SQL,
    doc=(
        "TPC-H Q2 adapted (unit cost = min lineitem price/qty, no partsupp): "
        "region-scoped correlated MIN subquery, decorrelated by Catalyst into "
        "an aggregate + broadcast-able join. ROUND(/,6) keeps the double "
        "division engine-identical."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    return spark.sql(Q2_SQL)


Q11_SQL = """
    WITH vals AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, CAST(val AS DOUBLE) AS part_value
    FROM vals
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM vals)
    ORDER BY part_value DESC, p_key
"""


@register(
    "q11_important_value",
    oracle=Q11_SQL,
    doc=(
        "TPC-H Q11 adapted (value from lineitem revenue, no partsupp): "
        "per-part value in one nation HAVING above a fraction of the global "
        "total (uncorrelated scalar subquery; both aggregates decimal-exact)."
    ),
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(Q11_SQL)


@register(
    "q12_late_shipment",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_class ORDER BY ship_class
    """,
    doc=(
        "TPC-H Q12 adapted (lateness = shipped 60+ days after order; classes "
        "from l_returnflag, no l_shipmode): priority counts among late lines."
    ),
)
def q12_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 (priority filter instead of the absent o_comment): "
        "orders-per-customer histogram over a filtered left outer join — "
        "COUNT(col) counts only matched rows."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q15_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=Q15_SQL,
    doc=(
        "TPC-H Q15: quarterly revenue view, supplier(s) at the max via an "
        "uncorrelated scalar subquery. Equality on the max is safe because "
        "both engines derive the identical double from the exact decimal sum."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(Q15_SQL)


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc=(
        "TPC-H Q16 adapted (supplier relation from lineitem; exclusion = "
        "negative balance instead of the absent comment scan): distinct "
        "supplier counts per part group, exclusion via anti join."
    ),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part", "lineitem", "supplier"))
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q17_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register(
    "q17_small_quantity_revenue",
    oracle=Q17_SQL,
    doc=(
        "TPC-H Q17: revenue loss from small-quantity orders — correlated "
        "per-part average threshold (decimal-exact avg: the comparison gates "
        "rows, so the threshold double must be bit-identical on both engines)."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(Q17_SQL)


Q20_SQL = """
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
                  JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE' AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%blue%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 20
    )
    ORDER BY s_suppkey
"""


@register(
    "q20_potential_promotion",
    oracle=Q20_SQL,
    doc=(
        "TPC-H Q20 adapted (shipped quantity instead of the absent availqty): "
        "suppliers of matching parts above a yearly quantity, IN on an "
        "aggregated subquery -> semi join."
    ),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("supplier", "nation", "region", "lineitem", "part"))
    return spark.sql(Q20_SQL)


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), order_stats AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late JOIN order_stats USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    doc=(
        "TPC-H Q21 adapted (lateness = shipped 60+ days after order date): "
        "the sole late supplier on multi-supplier finished orders. The "
        "EXISTS/NOT-EXISTS pair is re-expressed as per-order aggregates — "
        "two hash aggregations instead of two correlated subquery scans of "
        "lineitem (the shape that scales: lineitem is read once)."
    ),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    finished = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        t["lineitem"]
        .join(finished, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"), 1).otherwise(0)
            ).alias("is_late")
        )
    )
    order_stats = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        late.join(order_stats, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
