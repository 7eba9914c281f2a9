"""Event-stream operators over the ``events`` table (SURVEY.md §2.B): JSON
column extraction, tumbling / sliding / session time windows. These run the
same window semantics Structured Streaming uses (``F.window`` /
``F.session_window`` are batch-evaluable); streaming execution of the
tumbling case lives in n5_dask_spark/streaming/jobs.py.

Scale: time-window aggregation shuffles on (window, user) keys only; at
100 TB the natural layout is parquet partitioned by date so window aggs
prune by partition, and the streaming path bounds state via watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register


@register(
    "events_json_extract",
    oracle="""
    -- real JSON semantics, not a substring regexp (r9 probe): the old
    -- regexp oracle matched "k" tokens inside NESTED objects/arrays and
    -- truncated floats ('1.5' -> 1) where Spark's typed from_json yields
    -- NULL, and CAST would error on bigint overflow. json_valid guards
    -- malformed/empty props; the integer-token regexp keeps DuckDB's
    -- TRY_CAST from rounding floats ('1.5' -> 2) or accepting '1e2';
    -- TRY_CAST nulls int32 overflow exactly like from_json's k INT.
    -- Out of contract (r9 parser-leniency probe, characterization-pinned):
    -- duplicate keys ({"k":1,"k":2}) — Jackson takes the last, yyjson the
    -- first; TRAILING CONTENT after the first document ('{"k":1}junk',
    -- '{"k":1}{"k":2}') — Jackson stops at the end of the first value
    -- where yyjson requires exactly one document; and TRAILING COMMAS
    -- ('{"k":9,}') — yyjson accepts them, Jackson rejects. Single-quoted
    -- strings are IN contract: from_json sets allowSingleQuotes=false
    -- (Jackson's lenient default) to match strict-RFC yyjson.
    SELECT event_id, event_type,
           CASE WHEN json_valid(props)
                 AND regexp_matches(CAST(json_extract(props, '$.k') AS VARCHAR),
                                    '^-?[0-9]+$')
                THEN TRY_CAST(CAST(json_extract(props, '$.k') AS VARCHAR) AS INT)
           END AS k_val
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
    doc="JSON field extraction: Spark from_json (typed struct) vs oracle JSON path.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            "event_type",
            # allowSingleQuotes=false: strict-RFC quoting, matching yyjson
            # (Jackson's default leniency parsed {'k':1} where the oracle
            # sees invalid JSON — r9 parser-leniency probe)
            F.from_json(F.col("props"), "k INT", {"allowSingleQuotes": "false"})
            .getField("k")
            .alias("k_val"),
        )
        .orderBy("event_id")
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    doc="Tumbling 1h window aggregation (same semantics as streaming groupBy(window)).",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS win_start,
             value
      FROM events
    )
    SELECT win_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM starts
    GROUP BY win_start
    ORDER BY win_start
    """,
    doc=(
        "Sliding window 1h every 30min: each event lands in exactly two "
        "windows; oracle materializes both window starts per event."
    ),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n_events", "sum_value")
        .orderBy("win_start")
    )


@register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts >= COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
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
        "Session windows (8h gap) per user via F.session_window; oracle is the "
        "gaps-and-islands formulation. Session end = last event + gap (Spark "
        "session_window semantics)."
    ),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .filter(F.col("user_id") < 30)
        .groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
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
    "events_sessionization_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
    doc="Event transition matrix (funnel step analysis) via lead().",
)
def events_sessionization_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("event_type", "next_type")
    )
