"""Bucketed co-located join (SURVEY.md §2.B joins row + §4 physical
execution): both fact tables written bucketed on the join key, so the join
needs NO exchange — each task reads matching bucket files from both sides.
At 100 TB this is the difference between re-shuffling terabytes per join
and a scan-local merge; bucketing is Spark's answer to the reference's
"chunk grid = partitioning" idea applied to relational keys.

The bucketed tables land in the session warehouse (/tmp, session.py) via
saveAsTable — Spark's native bucket metadata, no Hive needed. The oracle
computes the identical join/aggregate straight from parquet, proving the
bucket files carry the same rows.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register

N_BUCKETS = 8


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(orders_table, lineitem_table) bucketed+sorted on the join key.

    Idempotent per sf_dir (names carry an sf_dir hash so scale factors
    don't collide), and the bucketing shuffle is paid ONCE: if both tables
    already exist in this session's catalog they are reused as-is — the
    whole point of bucketing is that later joins are scan-local.
    """
    # pid-keyed on top of the sf_dir hash: the warehouse directory is shared
    # across processes, and the catalog is session-scoped, so a concurrent
    # process (bench alongside pytest) would otherwise rmtree the stale-to-
    # IT directory this session's catalog still references mid-query
    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_p{os.getpid()}"
    bo, bl = f"b_orders_{tag}", f"b_lineitem_{tag}"
    if spark.catalog.tableExists(bo) and spark.catalog.tableExists(bl):
        return bo, bl
    # The warehouse DIRECTORY outlives the session-scoped catalog entry, so
    # a fresh session's saveAsTable would trip over the stale location: drop
    # both the entry and the files. Deleting a config-derived path is only
    # safe when it is the session-scoped scratch warehouse this package
    # configures (session.py) — refuse anything outside the system tempdir
    # rather than rmtree into a foreign deployment's warehouse.
    raw = spark.conf.get("spark.sql.warehouse.dir")
    warehouse = urlparse(raw).path or raw
    tmp_root = tempfile.gettempdir()
    for name in (bo, bl):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = f"{warehouse.rstrip('/')}/{name}"
        if loc.startswith(tmp_root.rstrip("/") + "/"):
            shutil.rmtree(loc, ignore_errors=True)
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(bo)
    )
    (
        t["lineitem"]
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(bl)
    )
    return bo, bl


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS line_total,
           CAST(MAX(o_totalprice) AS DOUBLE) AS order_price
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_totalprice > 9900
    GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    doc=(
        "Join over tables bucketed+sorted on the key: sort-merge join with "
        "ZERO exchanges (verified by a plan test). The write pays one "
        "shuffle once; every subsequent join on the key is scan-local — "
        "the amortization that matters when the same key joins daily at "
        "100 TB."
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    bo, bl = bucketed_tables(spark, sf_dir)
    o = spark.table(bo).filter(F.col("o_totalprice") > 9900)
    li = spark.table(bl)
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "line_total"),
            F.max("o_totalprice").cast("double").alias("order_price"),
        )
        .orderBy("l_orderkey")
    )
