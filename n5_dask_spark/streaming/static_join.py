"""Stream-static join (SURVEY.md §2.B streaming row): enrich a live event
stream with a dimension table — the canonical streaming-ETL shape (facts
stream in, dims sit in storage; the static side is re-read per micro-batch
and broadcast, no stream state needed for the join itself).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


def run_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.streaming.stateful import _event_stream, _memory_sink_name

    customers = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .join(F.broadcast(customers), F.col("user_id") == F.col("c_custkey"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
        )
    )
    sink = _memory_sink_name(spark, "stream_static")
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "c_mktsegment",
            "n_purchases",
            "sum_value",
        )
        .orderBy("win_start", "c_mktsegment")
    )


@register(
    "streaming_static_dim_join",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS win_start,
           c_mktsegment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON c_custkey = user_id
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    ORDER BY win_start, c_mktsegment
    """,
    doc=(
        "Real streaming run: purchase stream broadcast-joined to the "
        "customer dim, then a watermarked daily window per segment == the "
        "batch join/aggregate (hash-checked)."
    ),
)
def streaming_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_static_join(spark, sf_dir)
