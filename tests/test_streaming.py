"""Structured Streaming semantics tests: watermark append-mode window
emission, foreachBatch sink, stateful running totals."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_watermark_append_drops_open_windows(spark):
    from n5_dask_spark.catalog import load_table
    from n5_dask_spark.streaming.stateful import run_watermark_append

    got = run_watermark_append(spark, SF_SMALL, window="1 hour", delay="6 hours")
    rows = {r["win_start"]: r["n_events"] for r in got.collect()}

    ev = load_table(spark, SF_SMALL, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = {
        r["win_start"]: r["n"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n")
        .collect()
    }
    # emitted = exactly the windows whose end <= watermark (max_ts - 6h)
    import datetime

    wm = max_ts - datetime.timedelta(hours=6)
    expected = {k: v for k, v in batch.items() if k + datetime.timedelta(hours=1) <= wm}
    assert rows == expected
    assert len(batch) > len(rows) > 0  # some open windows were held back


def test_foreach_batch_sink(spark):
    from n5_dask_spark.streaming.stateful import run_foreach_batch_sink

    out_dir, n_batches = run_foreach_batch_sink(spark, SF_SMALL)
    assert n_batches >= 1
    files = glob.glob(f"{out_dir}/batch=*/*.parquet")
    assert files
    total = (
        spark.read.parquet(f"{out_dir}/batch=0")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == 1000  # sf0.001 events rows


def test_stateful_running_totals_matches_batch(spark):
    from n5_dask_spark.catalog import load_table
    from n5_dask_spark.streaming.stateful import run_user_running_totals

    got = {r["user_id"]: (r["n_events"], r["sum_value_micro"]) for r in
           run_user_running_totals(spark, SF_SMALL).collect()}
    exp = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(value * 1000000) AS BIGINT)")).alias("s"),
        )
        .collect()
    }
    assert got == exp
