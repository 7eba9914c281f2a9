"""Storage-layout strategies for the 100 TB design (SURVEY.md §2.B
partitioning row): bucketed tables co-locate join keys so repeated joins
skip the exchange entirely; date-partitioned layout lets time filters prune
whole partitions at the file listing."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tests.test_plans import plan_of


def test_bucketed_join_has_no_shuffle(spark):
    from n5_dask_spark.catalog import load_tables

    t = load_tables(spark, SF_SMALL, ("orders", "lineitem"))
    suffix = uuid.uuid4().hex[:6]
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(f"orders_b_{suffix}")
    )
    (
        t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(f"lineitem_b_{suffix}")
    )
    ob, lb = spark.table(f"orders_b_{suffix}"), spark.table(f"lineitem_b_{suffix}")
    # force sort-merge (no broadcast) to show the exchange-free co-located join
    joined = lb.hint("merge").join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucketing removed BOTH shuffles
    # and it is still correct
    n = joined.count()
    plain = t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert n == plain


def test_partitioned_write_prunes(spark):
    from n5_dask_spark.catalog import load_table

    out = os.path.join(tempfile.gettempdir(), f"part-{uuid.uuid4().hex[:6]}")
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = plan_of(back)
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    got = back.count()
    expect = ev.filter(F.col("day") == "2024-01-05").count()
    assert got == expect > 0
    # pruning is physical: only the matching day directory is listed
    days = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(days) > 20  # the month of data produced many partitions
