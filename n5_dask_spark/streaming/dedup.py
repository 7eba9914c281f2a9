"""Streaming deduplication (SURVEY.md §2.B streaming + dedup rows):
exactly-once event semantics over an at-least-once source, the standard
ingestion front-door of a training-data pipeline.

The job unions TWO readStream sources over the same event log (every event
arrives at least twice — a worst-case redelivery), applies
``dropDuplicatesWithinWatermark`` on the event id, then a stateful
windowed count. The batch oracle is the distinct count straight from the
table, so the hash check proves the dedup state actually removed the
duplicate deliveries.

Scale: watermark-bounded dedup state (ids older than the watermark are
evicted) — the only dedup shape that survives an unbounded stream.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.registry import register


def run_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.streaming.stateful import _event_stream, _memory_sink_name

    doubled = _event_stream(spark, sf_dir).unionByName(_event_stream(spark, sf_dir))
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )
    sink = _memory_sink_name(spark, "stream_dedup")
    q = (
        deduped.writeStream.format("memory")
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
            "event_type",
            "n_unique_events",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "streaming_dedup_events",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS win_start,
           event_type,
           COUNT(DISTINCT event_id) AS n_unique_events
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    doc=(
        "Real streaming run: double-delivered source -> watermarked "
        "dropDuplicatesWithinWatermark -> windowed count == batch distinct "
        "count (exactly-once ingestion semantics, hash-checked)."
    ),
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_dedup(spark, sf_dir)
