"""Extended TPC-H-family coverage (SURVEY.md §2.B joins/aggregation rows),
adapted to the driver schema (no ps_supplycost / l_shipmode / l_commitdate —
FIXTURES.md §B). Hints only on constant dims (nation/region); SF-scaling
sides are AQE-planned so the shapes hold at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register

DISC_PRICE = "l_extendedprice * (1 - l_discount)"


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST({DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral trade volume between two nations by year.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    cn = t["nation"].select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    df = (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("snk") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cnk") == F.col("c_nationkey"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        df.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(DISC_PRICE, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST({DISC_PRICE} AS DECIMAL(18,6)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region  ON r_regionkey = cn.n_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_rev GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8: one nation's market share inside a region (exact decimal ratio).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "supplier", "nation", "customer", "region")
    )
    sn = t["nation"].select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    cn = t["nation"].select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    region = t["region"].filter(F.col("r_name") == "ASIA")
    orders = t["orders"].filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    df = (
        t["lineitem"]
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("snk") == F.col("s_nationkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cnk") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("crk"))
    )
    vol = F.expr(f"CAST({DISC_PRICE} AS DECIMAL(18,6))")
    return (
        df.select(F.year("o_orderdate").cast("int").alias("o_year"), vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST({DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 adapted (no ps_supplycost): revenue by supplier nation/year for matching parts.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "orders", "nation"))
    part = t["part"].filter(F.col("p_name").like("%red%"))
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(DISC_PRICE, "profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST({DISC_PRICE} AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST({DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue percentage (exact decimal ratio).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    vol = F.expr(f"CAST({DISC_PRICE} AS DECIMAL(18,6))")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 210
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice, o_orderdate
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18: large-volume orders via IN-subquery (semi join on an aggregate).",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 210)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice", "o_orderdate")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST({DISC_PRICE} AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19: disjunctive multi-predicate join (planner pushes the OR to both sides).",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(dsum(DISC_PRICE, "revenue"), F.count(F.lit(1)).alias("n_items"))


Q22_SQL = """
    SELECT SUBSTRING(c_name, 1, 9) AS name_prefix, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.00)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY name_prefix
    ORDER BY name_prefix
"""


@register(
    "q22_global_sales_opportunity",
    # ONE SQL string for both engines (tpch_extra2's Q*_SQL pattern): the
    # oracle literally IS the Spark query, so they cannot drift
    oracle=Q22_SQL,
    doc="TPC-H Q22 adapted: scalar subquery (decimal-exact global avg) + anti join.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    # the threshold is a row-gating comparison, so the scalar subquery's avg
    # must be decimal-exact on BOTH engines (a last-ulp double difference
    # could flip rows near the boundary)
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(Q22_SQL)


@register(
    "agg_median_percentile",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MEDIAN(c_acctbal), 6) + 0.0 AS median_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.9), 6) + 0.0 AS p90_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.1), 6) + 0.0 AS p10_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Exact median / continuous percentiles (rounded: interpolation arithmetic).",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 6).alias("median_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.9)), 6).alias("p90_bal"),
            F.round(F.percentile("c_acctbal", F.lit(0.1)), 6).alias("p10_bal"),
        )
        .orderBy("c_mktsegment")
    )


CORRELATED_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                              FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
"""


@register(
    "correlated_scalar_subquery",
    oracle=CORRELATED_SQL,
    doc="Correlated scalar subquery (decorrelated by Catalyst; decimal-exact avg threshold).",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    # decimal-exact per-key avg: the comparison gates rows, so both engines
    # must compute the identical threshold double
    return spark.sql(CORRELATED_SQL)
