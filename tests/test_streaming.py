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


# --- two-trigger incremental / restart semantics -------------------------
# A single AvailableNow pass proves batch-equivalence; these prove the
# RESTART contract: new files between triggers are processed incrementally
# from the checkpoint, and output rows land exactly once.


def _write_events(path, hours, per_hour=5):
    """events rows at :00, :12, :24... of each hour, timestamp[us] parquet
    (pyarrow, NOT pandas-default nanos: this is the normal-source path; the
    driver's nanos events.parquet exercises the legacy branch separately)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2026, 1, 1)
    ts, uid, val = [], [], []
    for h in hours:
        for i in range(per_hour):
            ts.append(base + datetime.timedelta(hours=h, minutes=12 * i))
            uid.append(h * 100 + i)
            val.append(float(h) + i / 10.0)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(uid, type=pa.int64()),
                "value": pa.array(val, type=pa.float64()),
            }
        ),
        path,
    )


def test_foreachbatch_exactly_once_across_restarts(spark, tmp_path):
    from n5_dask_spark.streaming.stateful import run_foreach_batch_incremental

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(src / "a.parquet", hours=range(0, 4))

    b1 = run_foreach_batch_incremental(spark, str(src), out, ckpt)
    assert len(b1) >= 1
    n1 = spark.read.option("basePath", out).parquet(f"{out}/batch=*").count()
    assert n1 == 20  # 4 hours x 5 events

    _write_events(src / "b.parquet", hours=range(4, 10))
    b2 = run_foreach_batch_incremental(spark, str(src), out, ckpt)
    assert len(b2) >= 1 and min(b2) > max(b1)  # batch ids continue, no replay
    got = spark.read.option("basePath", out).parquet(f"{out}/batch=*")
    assert got.count() == 50  # a.parquet NOT reprocessed: 20 + 30, no dupes
    assert got.select("user_id").distinct().count() == 50

    # restart with nothing new: a no-op, output unchanged
    run_foreach_batch_incremental(spark, str(src), out, ckpt)
    assert spark.read.option("basePath", out).parquet(f"{out}/batch=*").count() == 50


def test_windowed_append_exactly_once_across_restarts(spark, tmp_path):
    import datetime

    from n5_dask_spark.streaming.stateful import run_windowed_append_incremental

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # trigger 1: hours 0-5. watermark = 5:48 - 1h = 4:48 -> windows 0..3
    # (ends 1:00..4:00) close and append; window 4 (end 5:00 > 4:48) and
    # window 5 stay in checkpointed state.
    _write_events(src / "a.parquet", hours=range(0, 6))
    run_windowed_append_incremental(spark, str(src), out, ckpt)
    first = {r["win_start"].hour: r["n_events"] for r in spark.read.parquet(out).collect()}
    assert first == {h: 5 for h in range(0, 4)}

    # trigger 2 (a restart): hours 8-13 arrive. max ts = 13:48, so the
    # watermark moves to 12:48 and windows 4, 5 — whose counts live ONLY in
    # the restored state — plus 8..11 close now; 12 and 13 (ends past the
    # watermark) stay open. Each emitted window appears exactly once.
    _write_events(src / "b.parquet", hours=range(8, 14))
    run_windowed_append_incremental(spark, str(src), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len({r["win_start"] for r in rows})  # no window twice
    got = {r["win_start"].hour: r["n_events"] for r in rows}
    assert got == {h: 5 for h in [*range(0, 6), *range(8, 12)]}
    base = datetime.datetime(2026, 1, 1)
    assert all(r["win_start"].date() == base.date() for r in rows)


def test_windowed_append_reads_nanos_source_without_prior_conf(spark, tmp_path):
    """Regression: run_windowed_append_incremental must be able to
    schema-read a TIMESTAMP(NANOS) source in a session where no earlier
    events read happened to set spark.sql.legacy.parquet.nanosAsLong —
    the entry point sets the conf itself (via _nanos_safe_schema) before
    the footer read, then routes the int64 column through the
    nanos-to-micros watermark cast."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.streaming.stateful import run_windowed_append_incremental

    src = tmp_path / "src"
    src.mkdir()
    base = datetime.datetime(2026, 1, 1)
    ts = [base + datetime.timedelta(hours=h, minutes=m) for h in range(6) for m in (0, 30)]
    pq.write_table(
        pa.table({"ts": pa.array(ts, type=pa.timestamp("ns"))}),
        src / "a.parquet",
    )
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass  # was never set in this session
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_windowed_append_incremental(spark, str(src), out, ckpt)
    got = {r["win_start"].hour: r["n_events"] for r in spark.read.parquet(out).collect()}
    # max ts 5:30, watermark 4:30 -> windows ending 1:00..4:00 close
    assert got == {h: 2 for h in range(0, 4)}


def test_pre_epoch_event_times_are_out_of_streaming_contract(spark, tmp_path):
    """Characterization pin (r9 pass 5, extending the epoch-0 join
    boundary found at 40M stress scale): Spark's event-time WATERMARK
    machinery clamps at the epoch, so a stream whose event times are
    all pre-1970 NEVER closes a window — append mode emits ZERO rows
    where the equivalent batch window query closes 10 of the 12 hours.
    Contract: event-time streaming requires post-epoch times (real
    telemetry always is; the stress generators base at 2024); HISTORICAL
    reprocessing of pre-epoch data belongs to the batch window family,
    which the extreme-timestamp net pins engine-equal on 1965/1582/
    year-1 times."""
    import os
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.streaming.stateful import run_watermark_append

    rows = []
    for h in range(12):
        for j in range(3):
            rows.append((h * 3 + j, datetime(1965, 3, 15, h, 10 * j), j, "click", 1.0, "{}"))
    ev = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.table({n: [r[j] for r in rows] for j, n in enumerate(ev.names)}, schema=ev),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    got = run_watermark_append(spark, str(tmp_path), window="1 hour", delay="2 hours")
    assert got.collect() == []  # the clamp: nothing ever closes

    batch = (
        spark.read.parquet(os.path.join(str(tmp_path), "events.parquet"))
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"))
        .count()
        .collect()
    )
    assert len(batch) == 12  # batch windowing handles pre-epoch fine


def test_directory_shaped_events_table_streams_directly(spark, tmp_path):
    """r11 sf1-gate find, pinned: an events table that is a DIRECTORY of
    part files (any Spark-written dataset) must stream from the dataset
    path itself. The old staging symlinked the path assuming a single
    file; the non-recursive FileStreamSource listed the dir-symlink as
    zero files, and every streaming query returned 0 rows with no error
    — silent wrong data at exactly the layout a real deployment has."""
    import pathlib

    import pyarrow.parquet as pq

    from n5_dask_spark.streaming.stateful import _staged_events_dir, run_watermark_append

    src = pathlib.Path(SF_SMALL) / "events.parquet"
    d = tmp_path / "events.parquet"
    d.mkdir()
    t = pq.read_table(src)
    n = len(t) // 2
    pq.write_table(t.slice(0, n), d / "part-00000.parquet")
    pq.write_table(t.slice(n), d / "part-00001.parquet")
    (d / "_SUCCESS").touch()

    # staging resolves to the dataset directory itself, not a symlink dir
    assert _staged_events_dir(str(tmp_path)) == str(d)

    got = run_watermark_append(spark, str(tmp_path), window="1 hour", delay="6 hours")
    baseline = run_watermark_append(spark, SF_SMALL, window="1 hour", delay="6 hours")
    got_rows = sorted(map(tuple, got.collect()))
    base_rows = sorted(map(tuple, baseline.collect()))
    assert got_rows == base_rows and len(got_rows) > 0
