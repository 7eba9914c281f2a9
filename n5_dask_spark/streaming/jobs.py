"""Structured Streaming jobs over the ``events`` table (SURVEY.md §2.B
streaming row — no reference counterpart; grep over /root/reference/src shows
no streaming of any kind).

``streaming_tumbling_agg`` actually executes a Structured Streaming query
(readStream over the parquet dir -> watermark -> windowed stateful agg ->
memory sink, Trigger.AvailableNow) and returns the materialized result, so
the driver's oracle check covers the real streaming path. Complete output mode
makes the result equal to the batch tumbling aggregation (no windows held
back by the final watermark), which is what the oracle computes.

Scale: in production this is readStream from a log store with watermark-bound
state; AvailableNow gives incremental batch execution over the same code.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.registry import register


def run_streaming_tumbling(spark: SparkSession, sf_dir: str, gap: str = "1 hour") -> DataFrame:
    """readStream -> withWatermark -> window agg -> memory sink (AvailableNow).

    Source construction (nanos handling, staged symlink dir, UTC tuning) is
    shared with the stateful jobs via _event_stream."""
    from n5_dask_spark.streaming.stateful import _event_stream, _memory_sink_name

    stream = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", gap).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
        )
    )
    sink = _memory_sink_name(spark, "stream_tumbling")
    q = (
        stream.writeStream.format("memory")
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
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "streaming_tumbling_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    doc="Real Structured Streaming run (AvailableNow, watermark, stateful window agg).",
)
def streaming_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_tumbling(spark, sf_dir)


def run_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream -> watermark -> session_window (8h gap) -> memory sink.

    Complete output mode: every closed-and-open session is emitted at the
    final AvailableNow trigger, so the result equals the batch
    sessionization (the oracle's gaps-and-islands SQL). In production the
    watermark bounds session state; merging of late events into existing
    sessions is exactly what session_window's state store does.
    """
    from n5_dask_spark.streaming.stateful import _event_stream, _memory_sink_name

    stream = (
        _event_stream(spark, sf_dir)
        .filter(F.col("user_id") < 30)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
        )
    )
    sink = _memory_sink_name(spark, "stream_sessions")
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "streaming_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             -- STRICT >: an event at exactly last_ts + gap still MERGES in
             -- Spark's session_window (the session interval end is
             -- inclusive for merging) — pinned by the tie-dense streaming
             -- fuzz net, which diverged under the previous >= split
             CASE WHEN ts > COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
                                     TIMESTAMP '1900-01-01') + INTERVAL 8 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 30
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 8 HOUR AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc=(
        "Real Structured Streaming session windows: readStream -> watermark "
        "-> session_window(8h) state merge -> AvailableNow; equals the "
        "batch gaps-and-islands sessionization (the oracle)."
    ),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_sessions(spark, sf_dir)
