"""MERGE / upsert semantics on plain Spark (no Delta/Iceberg needed).

Vanilla Spark SQL has no MERGE INTO; the standard emulation — and what
MERGE compiles to underneath every table format — is a full-outer join
between the base snapshot and the change set, with per-row disposition:
matched -> update, unmatched-change -> insert, unmatched-base ->
unchanged. Expressed declaratively, the join shuffles once on the key
(broadcast when the change set is small — the usual CDC case), and the
disposition is a null-pattern CASE, all codegen'd.

The query emits per-disposition counts and a decimal-exact total of the
post-merge price so a single misplaced row flips the driver hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register

# change set, derived deterministically from the base table: keys =0 mod 10
# get a 10% price bump (update), keys =7 mod 100 are re-keyed +10^9 (insert)
_DUCK_CHANGES = """
    changes AS (
      SELECT o_orderkey AS k,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1 AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000,
             CAST(o_totalprice AS DOUBLE)
      FROM orders WHERE o_orderkey % 100 = 7
    )
"""


@register(
    "upsert_orders_snapshot",
    oracle=f"""
    WITH {_DUCK_CHANGES},
    merged AS (
      SELECT COALESCE(c.k, o.o_orderkey) AS k,
             COALESCE(c.new_price, CAST(o.o_totalprice AS DOUBLE)) AS price,
             CASE WHEN c.k IS NULL THEN 'unchanged'
                  WHEN o.o_orderkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS disposition
      FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.k
    )
    SELECT disposition,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM merged GROUP BY disposition ORDER BY disposition
    """,
    doc=(
        "MERGE/upsert emulation (SCD-1): base snapshot FULL OUTER JOIN a "
        "deterministic change set (10% of keys updated +10%, 1% "
        "re-keyed as inserts), COALESCE picks the surviving value and a "
        "null-pattern CASE labels each row updated/inserted/unchanged. "
        "Per-disposition counts + decimal-exact price totals gate it."
    ),
)
def upsert_orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    base = t["orders"].select("o_orderkey", "o_totalprice")
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            # SQL text on purpose: the literal 1.1 must be DECIMAL(2,1) in
            # BOTH engines (Python F.lit(1.1) would inject a double and
            # demote the whole product to float math)
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1 AS DOUBLE)").alias("new_price"),
        )
    )
    inserts = base.filter(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + 1000000000).alias("k"),
        F.col("o_totalprice").cast("double").alias("new_price"),
    )
    changes = updates.unionByName(inserts)
    merged = base.join(changes, base["o_orderkey"] == changes["k"], "full_outer").select(
        F.coalesce("new_price", F.col("o_totalprice").cast("double")).alias("price"),
        F.when(F.col("k").isNull(), "unchanged")
        .when(F.col("o_orderkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("disposition"),
    )
    return (
        merged.groupBy("disposition")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("price", "total_price"))
        .orderBy("disposition")
    )
