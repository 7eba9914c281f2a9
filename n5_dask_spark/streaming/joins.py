"""Stream-stream join (SURVEY.md §2.B streaming row, advanced case).

Purchases joined to the same user's clicks within the preceding hour — both
sides are streams with watermarks, and the time-range join condition bounds
the state Spark must hold (clicks older than the range + watermark get
evicted). Executed with AvailableNow; an inner time-bounded join over a
finite input equals the batch join, which is what the oracle computes.

At 100 TB this is the standing attribution-join shape: state is
O(users x 1h of clicks), not O(history).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.registry import register
from n5_dask_spark.streaming.stateful import _event_stream, _memory_sink_name


def run_stream_stream_join(
    spark: SparkSession, sf_dir: str, how: str = "inner"
) -> DataFrame:
    """One definition for both join types: the stream construction,
    watermarks and time-bound condition are shared (the oracles pin these
    values), only the join type and output columns differ."""
    ev = _event_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        how,
    )
    sink = _memory_sink_name(spark, "ss_join")
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = [
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "click_id",
        F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
    ]
    if how == "inner":  # c_ts is NULL-prone on the outer side; inner keeps it
        cols.append(F.col("c_ts").cast("timestamp_ntz").alias("c_ts"))
    return spark.table(sink).select(*cols).orderBy("purchase_id", "click_id")


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
           p.ts AS p_ts, c.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    ORDER BY purchase_id, click_id
    """,
    doc="Stream-stream time-bounded inner join (watermarked both sides, AvailableNow).",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_join(spark, sf_dir)


@register(
    "streaming_stream_stream_left_join",
    # Null (unmatched) rows emit only once the GLOBAL watermark — the MIN
    # over both inputs' (max event time - delay) — passes the purchase's
    # state-expiry point. Determined empirically against Spark 4.1 and
    # encoded in the cutoff below; matched rows emit immediately.
    oracle="""
    WITH wm AS (
      SELECT LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
                   (SELECT MAX(ts) FROM events WHERE event_type = 'click'))
             - INTERVAL 2 HOUR AS w
    )
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
           p.ts AS p_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    WHERE c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
    ORDER BY purchase_id, click_id
    """,
    doc=(
        "Stream-stream LEFT OUTER time-bounded join: watermarked both "
        "sides, AvailableNow. Unmatched purchases surface with NULL click "
        "only after the global (min-across-inputs) watermark evicts their "
        "state — the oracle reproduces that cutoff exactly, hash-checking "
        "the subtlest emission semantics in Structured Streaming."
    ),
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_stream_join(spark, sf_dir, how="left_outer")
