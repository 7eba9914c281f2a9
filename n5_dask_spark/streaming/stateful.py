"""Custom stateful streaming operators (SURVEY.md §2.B streaming row:
applyInPandasWithState; plus watermark append-mode and foreachBatch sinks).

run_user_running_totals: a per-user running aggregate maintained in
GroupState across micro-batches — the canonical custom-stateful shape.
Executed with Trigger.AvailableNow over the events table; with state kept
per user_id, state size is bounded by |users|, and at 100 TB the same code
runs against a log stream with watermark-based state eviction
(GroupStateTimeout.EventTimeTimeout).

run_watermark_append: tumbling agg in APPEND mode — only windows the final
watermark has passed are emitted. Demonstrates late-data semantics; the
batch oracle for it filters on max(ts) - delay the same way.

run_foreach_batch_sink: streaming -> foreachBatch -> parquet, the arbitrary-
sink escape hatch.

run_foreach_batch_incremental / run_windowed_append_incremental: one
AvailableNow pass per call against a PERSISTENT checkpoint — each call is a
restart that processes only files added since the last pass, with
exactly-once sinks (per-batch-id overwrite; parquet _spark_metadata commit
log). Driver-verified end to end by ``streaming_incremental_restart``.
"""

from __future__ import annotations

import os
import pathlib
import socket
import tempfile
import time
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from n5_dask_spark.catalog import table_path
from n5_dask_spark.registry import register


def _staged_events_dir(sf_dir: str) -> str:
    """FileStreamSource needs a directory; stage a symlink to the single
    parquet file. Content-addressed by md5 of the path (hash() would vary or
    collide), and stale/dangling symlinks are replaced.

    An events table that is ALREADY a directory dataset (Spark-written part
    files — the sf1 scale-up, any engine-produced table) needs no staging
    and streams straight from the dataset path; the r11 sf1 oracle gate
    caught the old behavior (a dir-symlink inside the stage dir, which the
    non-recursive file source silently listed as zero files -> all nine
    streaming queries returned 0 rows at sf1)."""
    import hashlib

    target = table_path(sf_dir, "events")
    if os.path.isdir(target):
        return target

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stage = pathlib.Path(tempfile.gettempdir()) / f"n5ds_stream_{tag}"
    stage.mkdir(exist_ok=True)
    link = stage / "events.parquet"
    if link.is_symlink():
        if os.readlink(link) != target:
            # missing_ok: a concurrent stager may have unlinked the same
            # stale link between our readlink and this call
            link.unlink(missing_ok=True)
    elif link.exists():
        raise RuntimeError(f"stage path {link} is occupied by a non-symlink")
    if not link.is_symlink():
        try:
            link.symlink_to(target)
        except FileExistsError:
            pass  # concurrent stager won the race with the same target
    return str(stage)


def guard_crash_window_replay(spark: SparkSession, checkpoint_dir: str) -> None:
    """Refuse a restart whose crash-window replay would silently lose rows.

    Crash state: ``offsets/N`` exists but ``commits/N`` does not — the
    restarting query REPLAYS batch N from the file-source log
    (``sources/<i>/N``). Stock Spark re-reads those logged files with the
    file stream source's internal missing-file tolerance, so a source file
    deleted between the crash and the restart (retention policies at fleet
    scale make that coincidence routine) yields an EMPTY replay that is
    committed silently — measured on this Spark with
    ``spark.sql.files.ignoreMissingFiles=false``: batch N re-commits with
    zero rows and no error, and the lost rows never reach any sink. This
    guard makes that lane loud: before starting, stat every file the
    source log pins to the uncommitted batch (Hadoop FileSystem — any
    URI scheme) and raise if one is gone.

    A checkpoint with no crash window, or whose crash-window batch has no
    source-log entry yet (crash before the source log write — Spark then
    re-LISTS the directory fresh, which is safe), passes untouched.

    FileStreamSourceLog writes every compaction batch (default
    compactInterval 10: batches 9, 19, ...) as ``<N>.compact`` instead of a
    plain ``<N>`` file, and a compact file carries the FULL history of
    entries, each tagged with its owning ``batchId``. So when the plain
    file is absent the guard also reads ``<N>.compact`` and filters its
    entries to ``batchId == N`` — unfiltered, already-committed files
    deleted by ordinary retention would spuriously trip the guard; without
    the compact read at all, the silent-empty-replay lane stayed open on
    exactly the compaction batches.

    The checkpoint LISTING and log reads are scheme-dispatched (r14,
    lifting the r13 os-only scope note): a local checkpoint dir lists
    through the OS, a URI-scheme one (file:, hdfs:, s3 with the emulated
    store, ...) through fsio's pyarrow FileSystem — so URI checkpoints get
    the same crash-window protection as local ones. A URI store that
    cannot LIST at all passes through unguarded (stock Spark behavior) —
    the one remaining scope residual, and a loud one to hit since every
    pyarrow FS implements listing. The per-FILE stats resolve the Hadoop
    FileSystem per logged path (cached by scheme+authority), since file
    sources can legally mix URI schemes in one log.
    """
    import json as _json

    from n5_dask_spark.sources.n5 import fsio

    is_uri = fsio.is_uri(checkpoint_dir)

    def _list_rel(sub: str) -> set[str] | None:
        """Relative file paths under <checkpoint>/<sub>; None = cannot list."""
        if is_uri:
            return fsio.list_files(f"{checkpoint_dir}/{sub}")
        d = os.path.join(checkpoint_dir, sub)
        if not os.path.isdir(d):
            return set()
        out: set[str] = set()
        for dirpath, _dirs, files in os.walk(d):
            rel = os.path.relpath(dirpath, d)
            for f in files:
                out.add(f if rel == "." else f"{rel}/{f}")
        return out

    def _read_log(rel: str) -> str:
        if is_uri:
            data = fsio.read_file(f"{checkpoint_dir}/sources/{rel}")
            return "" if data is None else data.decode("utf-8")
        with open(os.path.join(checkpoint_dir, "sources", rel)) as fh:
            return fh.read()

    offset_names = _list_rel("offsets")
    commit_names = _list_rel("commits")
    if offset_names is None or commit_names is None:
        return  # store cannot list: pass through (scope residual above)

    def _ids(names: set[str]) -> set[int]:
        return {int(n) for n in names if n.isdigit()}

    uncommitted = _ids(offset_names) - _ids(commit_names)
    if not uncommitted:
        return
    missing: list[str] = []
    source_logs = _list_rel("sources") or set()
    src_indices = sorted({r.split("/", 1)[0] for r in source_logs if "/" in r})
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    fs_cache: dict[tuple[str | None, str | None], Any] = {}
    for src_idx in src_indices:
        for batch_id in sorted(uncommitted):
            rel = f"{src_idx}/{batch_id}"
            batch_filter = None
            if rel not in source_logs:
                # compaction batches (N % compactInterval == interval-1) are
                # written as N.compact with the full entry history inside
                rel = rel + ".compact"
                if rel not in source_logs:
                    continue
                batch_filter = batch_id
            paths = []
            for line in _read_log(rel).splitlines():
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue  # the "v1" version header
                entry = _json.loads(line)
                if batch_filter is not None and entry.get("batchId") != batch_filter:
                    continue  # compact history row owned by an older batch
                if "path" in entry:
                    paths.append(entry["path"])
            for p in paths:
                jp = jvm.org.apache.hadoop.fs.Path(p)
                uri = jp.toUri()
                key = (uri.getScheme(), uri.getAuthority())
                fs = fs_cache.get(key)
                if fs is None:
                    fs = jp.getFileSystem(hconf)
                    fs_cache[key] = fs
                if not bool(fs.exists(jp)):
                    missing.append(p)
    if missing:
        raise RuntimeError(
            f"checkpoint {checkpoint_dir} has uncommitted batch(es) "
            f"{sorted(uncommitted)} whose logged source files no longer "
            f"exist: {missing[:5]}{'...' if len(missing) > 5 else ''} — "
            "a restart would silently commit an EMPTY replay of those "
            "rows (Spark's file stream source tolerates missing files on "
            "replay). Restore the files or accept the loss explicitly by "
            "deleting the stale offsets entry."
        )


def claim_sink_fence(out_dir: str) -> str:
    """Exactly-one-concurrent-writer fence for a caller-provided
    foreachBatch sink directory; returns the fence path.

    WHY (r13 probe find, reproduced by the racing-JVMs fault-net test
    under full machine load): two whole sessions starting the same
    checkpointed foreachBatch job race Spark's checkpoint lock, and the
    LOSER is refused only at its first commit-log write — AFTER its
    foreachBatch side effects ran. Each session had planned a different
    batch 0 (they listed the source at different instants), both wrote
    ``batch=0`` with ``mode("overwrite")``, and the two overwrites
    interleaved cross-process into a MIX of both sessions' part files:
    90 rows for a 60-row source, silently. Spark's own detection is loud
    but cannot un-run user side effects; the fence makes the loser refuse
    BEFORE the query starts, so the sink only ever has one writer.

    Protocol: write this pid to a temp file, then ``os.link(tmp, fence)``
    — an atomic CREATE-WITH-CONTENT (EEXIST if held), so the fence is
    never observable empty. The r13 shipped protocol (O_EXCL create, then
    write the pid into the open fd) had a TOCTOU the r13 ADVICE called
    out: between the winner's create and its pid write, a racing process
    could read the still-empty fence, parse pid 0, declare it STALE,
    unlink the LIVE fence and claim it — both sessions then ran
    foreachBatch concurrently, reopening the exact mixed-output lane the
    fence exists to close. link() closes it: content and existence appear
    in one rename-class FS operation. An empty fence can therefore only
    be a remnant of the old protocol (or manual touch); it is re-read
    across a short backoff before being treated as stale. A live holder
    refuses; a stale fence (holder pid dead — the crash-restart case a
    streaming runner must support) is reclaimed and the claim retried, so
    crash recovery needs no manual cleanup. The fence records
    ``pid@hostname``: pid liveness is only checkable on the recording
    host, and on a SHARED filesystem a pid that is dead here can be live
    there — checking it locally would rob a live cross-host holder and
    reopen the mixed-output lane (r14 hardening). A fence from another
    host is therefore refused conservatively; if that holder is known
    dead, the operator deletes the fence (the message says so). Racers on
    hosts that do NOT share the sink filesystem never see each other's
    fence at all — they keep Spark's own loud-but-late checkpoint lock,
    the remaining documented residual."""
    os.makedirs(out_dir, exist_ok=True)
    fence = os.path.join(out_dir, ".n5ds-writer")

    def _read_holder() -> tuple[int, str | None]:
        """Holder (pid, host); (0, None) if unparseable. host is None for
        a legacy bare-pid fence (pre-r14 format — same-host by
        definition, since only this module ever wrote it). An EMPTY fence
        cannot come from this protocol (link publishes content
        atomically) — re-read it across a backoff so a foreign writer
        mid-publish isn't robbed."""
        for delay in (0.0, 0.05, 0.2):
            if delay:
                time.sleep(delay)
            try:
                text = open(fence).read().strip()
            except OSError:
                return 0, None  # vanished or unreadable: stale
            if text:
                pid_s, _, host = text.partition("@")
                try:
                    return int(pid_s), (host or None)
                except ValueError:
                    return 0, None  # garbage content: stale
        return 0, None  # stayed empty through the backoff: stale

    our_host = socket.gethostname()
    tmp = os.path.join(out_dir, f".n5ds-writer-claim-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(f"{os.getpid()}@{our_host}")
    try:
        for _ in range(3):
            try:
                os.link(tmp, fence)  # atomic create-with-content
            except FileExistsError:
                pid, host = _read_holder()
                if pid > 0 and host is not None and host != our_host:
                    # shared-filesystem cross-host holder: liveness is not
                    # checkable from here, and a local pid probe would be
                    # about the WRONG process — refuse, don't rob
                    raise RuntimeError(
                        f"refusing to write {out_dir}: sink writer fence "
                        f"{fence} is held by pid {pid} on host {host!r} (this "
                        f"is {our_host!r}) — cross-host liveness cannot be "
                        "verified, so the holder is assumed live. If it is "
                        "known dead, delete the fence file to recover."
                    ) from None
                alive = False
                if pid > 0:
                    try:
                        os.kill(pid, 0)
                        alive = True
                    except ProcessLookupError:
                        alive = False
                    except PermissionError:
                        alive = True  # exists under another uid
                if alive:
                    raise RuntimeError(
                        f"refusing to write {out_dir}: sink writer fence {fence} "
                        f"is held by live pid {pid} — a concurrent session is "
                        "mid-job on this sink (racing writers interleave "
                        "per-batch overwrites into mixed output). Retry after "
                        "it finishes."
                    ) from None
                # stale (holder died): reclaim and retry the atomic create;
                # a concurrent reclaimer may win the recreate, in which case
                # the next loop iteration sees a LIVE holder and refuses
                try:
                    os.unlink(fence)
                except FileNotFoundError:
                    pass
                continue
            return fence
    finally:
        os.unlink(tmp)  # the LINK is the fence; the claim temp is always litter
    raise RuntimeError(f"could not claim sink writer fence {fence} after 3 rounds")


def release_sink_fence(fence: str) -> None:
    try:
        os.unlink(fence)
    except FileNotFoundError:
        pass  # already released (idempotent)


_LIVE_SINKS: dict[str, str] = {}


def _memory_sink_name(spark: SparkSession, family: str) -> str:
    """Unique memory-sink table name, dropping the PREVIOUS invocation's
    table of the same family first. Memory sinks materialize in the
    driver, so without this every re-run of a streaming query (the
    bench's repeated timing passes) leaks one fully-materialized temp
    view for the session's lifetime. The current invocation's table must
    stay registered — runners return a lazy DataFrame over it — so the
    bound is one live table per family, not zero."""
    prev = _LIVE_SINKS.get(family)
    if prev is not None:
        try:
            spark.catalog.dropTempView(prev)
        except Exception:
            pass  # already gone or a different session; the new name still works
    name = f"{family}_{uuid.uuid4().hex[:8]}"
    _LIVE_SINKS[family] = name
    return name


def _nanos_safe_schema(spark: SparkSession, path: str):
    """Schema-read a parquet source that may hold TIMESTAMP(NANOS).

    The nanos-as-int64 conf must be set BEFORE the footer read — a fresh
    session cannot even infer the schema of a TIMESTAMP(NANOS) file
    without it ('Illegal Parquet type'), so every streaming entry point
    goes through here rather than relying on an earlier events read
    having set the conf as a side effect."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema


def _ts_to_timestamp(df: DataFrame, schema) -> DataFrame:
    """Normalize the dual-width ts column for watermarking: ts has shipped
    as both TIMESTAMP(NANOS) (int64 under the legacy conf — CAST(long AS
    timestamp) would read it as SECONDS and wreck the watermark) and
    TIMESTAMP(MICROS)/NTZ (plain cast). Watermarks need TIMESTAMP, which
    under the UTC session tz preserves the wall clock exactly. The batch
    side's TIMESTAMP_NTZ variant lives in catalog.load_table — the target
    types differ deliberately, so these two are not merged."""
    from pyspark.sql.types import LongType

    if isinstance(schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from n5_dask_spark.session import tune_session

    tune_session(spark)  # shuffle partitions / tz for driver-owned sessions
    from n5_dask_spark.catalog import _read_cached

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = _read_cached(spark, sf_dir, "events").schema  # footer read cached
    stream = spark.readStream.schema(raw_schema).parquet(_staged_events_dir(sf_dir))
    return _ts_to_timestamp(stream, raw_schema)


def run_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event count + decimal-exact value sum held in GroupState."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total_micro = state.get if state.exists else (0, 0)
        import numpy as np

        for pdf in pdfs:
            n += len(pdf)
            # integer micro-units: exact accumulation, no float drift.
            # half-AWAY-FROM-ZERO to match SQL ROUND (pandas .round() is
            # half-to-even and would diverge on exact .5 products)
            v = (pdf["value"] * 1_000_000).to_numpy()
            total_micro += int((np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64").sum())
        state.update((n, total_micro))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_micro": [total_micro]}
        )

    out = (
        _event_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value_micro long",
            stateStructType="n long, total_micro long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = _memory_sink_name(spark, "stateful_totals")
    q = out.writeStream.format("memory").queryName(sink).outputMode("update").trigger(
        availableNow=True
    ).start()
    q.awaitTermination()
    # update-mode emits one row per key per batch; keep the final state row
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(sink)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value_micro")
        .orderBy("user_id")
    )


def run_watermark_append(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", delay: str = "6 hours"
) -> DataFrame:
    """Tumbling agg in APPEND mode: only watermark-closed windows emit."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sink = _memory_sink_name(spark, "wm_append")
    q = agg.writeStream.format("memory").queryName(sink).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n_events")
        .orderBy("win_start")
    )


def run_foreach_batch_incremental(
    spark: SparkSession, source_dir: str, out_dir: str, checkpoint_dir: str
) -> list[int]:
    """One AvailableNow pass over ``source_dir`` with a PERSISTENT checkpoint.

    Each invocation is a restart: the file-source offset log in the
    checkpoint makes it process only files added since the previous pass,
    and the per-batch-id overwrite keeps replayed batches idempotent — so
    every source row lands in the sink exactly once across any number of
    restarts. This is the incremental-loader shape (CDC into a warehouse)
    that a single-shot AvailableNow run doesn't exercise. Returns the batch
    ids executed by THIS pass (empty when no new files arrived).
    """
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    guard_crash_window_replay(spark, checkpoint_dir)
    # exactly-one-concurrent-writer fence (r13 find): without it, a second
    # session racing this checkpoint runs its foreachBatch side effects
    # BEFORE Spark's commit-log collision refuses it, interleaving two
    # sessions' batch=N overwrites into mixed output — see claim_sink_fence
    fence = claim_sink_fence(out_dir)
    try:
        schema = spark.read.parquet(source_dir).schema

        batches: list[int] = []

        def sink(df: DataFrame, batch_id: int) -> None:
            batches.append(batch_id)
            df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

        q = (
            spark.readStream.schema(schema)
            .parquet(source_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batches
    finally:
        # ALWAYS released: unlike the N5 dataset marker (whose job output
        # is unrecoverable without a rebuild), a failed trigger here is the
        # normal streaming-restart case — the checkpoint + per-batch-id
        # overwrite make the NEXT run self-healing, so a sticky fence
        # would only block the recovery path this runner exists for
        release_sink_fence(fence)


def run_windowed_append_incremental(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    delay: str = "1 hour",
) -> None:
    """Checkpointed tumbling agg in APPEND mode to a parquet file sink.

    Run once per trigger; across invocations the checkpoint restores the
    window state, the watermark advances with new data, and each window is
    appended to the sink exactly once — when the watermark passes its end.
    The parquet sink's _spark_metadata commit log is what makes re-reads see
    exactly the committed files, so a crash between write and commit cannot
    double-count.
    """
    from n5_dask_spark.session import tune_session

    tune_session(spark)
    guard_crash_window_replay(spark, checkpoint_dir)
    # _nanos_safe_schema sets the legacy conf itself: previously this path
    # only worked if some earlier events read had set it session-wide, and
    # a fresh session failed at the footer read for TIMESTAMP(NANOS) input
    schema = _nanos_safe_schema(spark, source_dir)
    stream = _ts_to_timestamp(spark.readStream.schema(schema).parquet(source_dir), schema)
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n_events")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Streaming -> foreachBatch -> parquet files; returns (path, batches).

    Output dir is content-addressed AND pid-keyed (cleared per run):
    repeated invocations in one process reuse one path instead of leaking
    a uuid directory per call, while concurrent harness processes on the
    same sf_dir never rmtree each other's in-flight batch output (the same
    discipline streaming_incremental_restart applies to its scratch)."""
    import hashlib as _hashlib
    import shutil as _shutil

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"n5ds_fb_{_hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_p{os.getpid()}",
    )
    _shutil.rmtree(out_dir, ignore_errors=True)
    batches: list[int] = []

    def sink(df: DataFrame, batch_id: int) -> None:
        batches.append(batch_id)
        df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
        ).write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        _event_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir, len(batches)


@register(
    "streaming_stateful_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "applyInPandasWithState: per-user running totals in GroupState "
        "(integer micro-units -> exact), AvailableNow execution; final state "
        "equals the batch aggregate the oracle computes."
    ),
)
def streaming_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_user_running_totals(spark, sf_dir)


@register(
    "streaming_foreachbatch_parquet",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "foreachBatch sink: the stream's micro-batches each write their "
        "per-type counts to a batch=N parquet directory (the arbitrary-"
        "sink escape hatch every CDC/warehouse loader uses); reading every "
        "batch partition back and re-summing must reproduce the batch "
        "aggregate regardless of how the source was micro-batched."
    ),
)
def streaming_foreachbatch_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_dir, n_batches = run_foreach_batch_sink(spark, sf_dir)
    assert n_batches >= 1
    back = spark.read.option("basePath", out_dir).parquet(os.path.join(out_dir, "batch=*"))
    return (
        back.groupBy("event_type")
        .agg(F.sum("n").cast("bigint").alias("n_events"))
        .orderBy("event_type")
    )


@register(
    "streaming_watermark_append",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ), wm AS (SELECT MAX(ts) - INTERVAL 6 HOUR AS w FROM events)
    SELECT win_start, n_events FROM b
    WHERE win_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    ORDER BY win_start
    """,
    doc=(
        "APPEND-mode watermarked window agg: only windows the final "
        "watermark (max ts - 6h) has closed are ever emitted — the "
        "late-data semantics that bound state at scale, verified against "
        "an oracle that reproduces the closed-window cutoff. (Windows "
        "still open at end-of-stream are withheld BY DESIGN; complete-mode "
        "twins cover them.)"
    ),
)
def streaming_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_watermark_append(spark, sf_dir)


@register(
    "streaming_incremental_restart",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "Checkpointed incremental execution ACROSS A RESTART, hash-checked: "
        "trigger 1 (one AvailableNow query) sees half the source files, "
        "trigger 2 — a brand-new query resumed from the same checkpoint's "
        "file-source offset log — sees only the files added in between; "
        "per-batch-id idempotent sinks make the union exactly-once, so "
        "re-aggregating every batch directory must reproduce the plain "
        "batch aggregate. This is the CDC/incremental-loader contract a "
        "single-shot streaming run never exercises."
    ),
)
def streaming_incremental_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from n5_dask_spark.catalog import load_table

    # pid-keyed scratch (same discipline as tiffops staging): concurrent
    # harness processes never race each other's rmtree
    base = os.path.join(tempfile.gettempdir(), f"n5ds_increstart_p{os.getpid()}")
    _shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)

    # input staging (driver-side, small projection): a deterministic split
    # of events into two files so trigger 2's delta is exactly file b.
    # TEST SCAFFOLDING ONLY — the toPandas exists to CONSTRUCT the
    # restart scenario, not to move data: the production streaming path
    # reads the dataset directory directly (_staged_events_dir and the
    # run_* entry points stream the parquet dir as-is; r11 dir-shaped fix)
    # and never funnels source rows through the driver
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .toPandas()
        .sort_values("event_id")
    )
    halves = [pdf[pdf["event_id"] % 2 == 0], pdf[pdf["event_id"] % 2 == 1]]
    pq.write_table(pa.Table.from_pandas(halves[0], preserve_index=False), f"{src}/a.parquet")
    b1 = run_foreach_batch_incremental(spark, src, out, ckpt)

    pq.write_table(pa.Table.from_pandas(halves[1], preserve_index=False), f"{src}/b.parquet")
    b2 = run_foreach_batch_incremental(spark, src, out, ckpt)  # the restart
    # a replay of EXACTLY the last batch (crash between sink write and
    # offset-log commit) is the documented recovery path the per-batch-id
    # overwrite sink makes idempotent — only reprocessing of earlier
    # batches breaks the incremental contract
    if not b1 or not b2 or min(b2) < max(b1):
        raise RuntimeError(f"restart did not continue incrementally: {b1} then {b2}")

    back = spark.read.option("basePath", out).parquet(os.path.join(out, "batch=*"))
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy("event_type")
    )
