"""Checkpoint fault-injection net for the streaming runners (r12 probe).

The r11 restart test proved the HAPPY path: two AvailableNow triggers
against one checkpoint process each file exactly once. This net injects
the crash states a fleet actually produces — a process killed between the
sink write and the commit-log write, a commit/offset entry missing after a
crash, a corrupted offsets log, a corrupted state-store delta, sink-side
orphan files, a source file deleted during the crash window, and two
whole JVMs racing one checkpoint — and pins the classification of each:
recovered-exactly-once, or refused LOUDLY. Silent anything is the bug.

Every restart runs in a FRESH subprocess JVM: Spark 4 detects same-session
checkpoint tampering as a concurrent-log update (its metadata cache
disagrees with the listing), which a real crash-restart never hits. Fault
injection that deletes a log entry must also delete Hadoop's hidden
``.<name>.crc`` sidecar — a real crash leaves neither (the atomic rename
publishes both), and a stale sidecar alone turns the replay's commit
rename into a spurious FileAlreadyExistsException.

Findings this net produced (fixed in streaming/stateful.py):

- guard_crash_window_replay: stock Spark (4.1.2, ignoreMissingFiles=false)
  REPLAYS a crash-window batch whose logged source files were deleted as
  an EMPTY batch and commits it silently — rows lost, no error. Both
  checkpointed runners now stat the source log's files for any
  uncommitted batch before starting and refuse loudly.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one AvailableNow foreachBatch trigger in a fresh JVM (the restart shape);
# prints BATCHES= on success, ERR= <type> <msg> on refusal
_TRIG_FB = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from n5_dask_spark.streaming.stateful import run_foreach_batch_incremental
try:
    b = run_foreach_batch_incremental(spark, sys.argv[1], sys.argv[2], sys.argv[3])
    print("BATCHES=", b)
except Exception as e:
    print("ERR=", type(e).__name__, str(e).split(chr(10))[0][:400])
""" % {"repo": REPO}

_TRIG_WIN = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from n5_dask_spark.streaming.stateful import run_windowed_append_incremental
try:
    run_windowed_append_incremental(spark, sys.argv[1], sys.argv[2], sys.argv[3])
    print("BATCHES= ok")
except Exception as e:
    print("ERR=", type(e).__name__, str(e).split(chr(10))[0][:400])
""" % {"repo": REPO}

# crash INSIDE the batch: sink write lands, then the process dies before
# the commit-log write — the true kill-mid-batch state, no file surgery
_TRIG_KILL = """
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
src, out, ckpt = sys.argv[1:4]
schema = spark.read.parquet(src).schema
def sink(df, batch_id):
    df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))
    os._exit(137)
q = (spark.readStream.schema(schema).parquet(src)
     .writeStream.foreachBatch(sink)
     .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
q.awaitTermination()
""" % {"repo": REPO}


def _run(code: str, *args: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=600,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith(("BATCHES=", "ERR="))]
    if lines:
        return lines[-1]
    return f"NOOUT rc={r.returncode} {r.stderr[-400:]}"


def _rm_with_crc(path: str) -> None:
    """Delete a checkpoint log entry the way a crash would have left it:
    neither the file nor its Hadoop ``.crc`` sidecar exists."""
    os.remove(path)
    crc = os.path.join(os.path.dirname(path), "." + os.path.basename(path) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def _sink_kv(out: str) -> list[tuple[int, int]]:
    import duckdb

    fs = glob.glob(os.path.join(out, "batch=*", "*.parquet"))
    if not fs:
        return []
    q = "SELECT k, v FROM read_parquet([%s]) ORDER BY k" % ",".join(
        f"'{f}'" for f in fs
    )
    return [(int(k), int(v)) for k, v in duckdb.sql(q).fetchall()]


@pytest.fixture(scope="module")
def healthy_fb(tmp_path_factory):
    """One healthy trigger-1 foreachBatch checkpoint; corruption scenarios
    copytree it instead of paying a JVM boot each."""
    base = str(tmp_path_factory.mktemp("ckpt_faults") / "healthy")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    pq.write_table(pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}), f"{src}/a.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line == "BATCHES= [0]", line
    return base


def _fork(healthy_base: str, name: str) -> tuple[str, str, str]:
    """Copy the healthy tree to a scenario dir, rewriting the ABSOLUTE
    source paths the file-source log pinned (Spark refuses a replay whose
    logged paths sit outside the new basePath) and dropping the rewritten
    files' CRC sidecars so the local FS doesn't veto the edit. The glob
    covers plain per-batch logs AND ``<N>.compact`` compaction files."""
    dst = os.path.join(os.path.dirname(healthy_base), name)
    shutil.copytree(healthy_base, dst)
    for log in glob.glob(f"{dst}/ckpt/sources/*/[0-9]*"):
        text = open(log).read()
        open(log, "w").write(text.replace(healthy_base, dst))
        crc = os.path.join(os.path.dirname(log), "." + os.path.basename(log) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    return f"{dst}/src", f"{dst}/out", f"{dst}/ckpt"


def test_kill_between_sink_write_and_commit_replays_exactly_once(tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    pq.write_table(pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}), f"{src}/a.parquet")
    r = subprocess.run(
        [sys.executable, "-c", _TRIG_KILL, src, out, ckpt],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 137, r.stderr[-400:]
    # the crash state: offsets written, sink written, NO commit
    assert glob.glob(f"{ckpt}/offsets/[0-9]*")
    assert not glob.glob(f"{ckpt}/commits/[0-9]*")
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30)]
    # restart in a fresh JVM: batch 0 replays, the per-batch-id overwrite
    # keeps it exactly-once
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line == "BATCHES= [0]", line
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30)]


def test_crash_window_replay_then_continue_is_exactly_once(healthy_fb):
    src, out, ckpt = _fork(healthy_fb, "crash_window")
    _rm_with_crc(sorted(glob.glob(f"{ckpt}/commits/[0-9]*"))[-1])
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line == "BATCHES= [0, 1]", line  # replay, then the new file
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_crash_before_offset_write_refolds_exactly_once(healthy_fb):
    src, out, ckpt = _fork(healthy_fb, "no_offset")
    for p in sorted(glob.glob(f"{ckpt}/commits/[0-9]*")):
        _rm_with_crc(p)
    _rm_with_crc(sorted(glob.glob(f"{ckpt}/offsets/[0-9]*"))[-1])
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    # with no offsets survived, the restart re-plans everything as batch 0;
    # the overwrite sink still lands every row exactly once
    assert line == "BATCHES= [0]", line
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_deleted_source_file_on_replay_refuses_loudly(healthy_fb):
    """The find this net exists for: without guard_crash_window_replay the
    restart commits an EMPTY batch-0 replay and rows 1-3 vanish silently."""
    src, out, ckpt = _fork(healthy_fb, "missing_src")
    _rm_with_crc(sorted(glob.glob(f"{ckpt}/commits/[0-9]*"))[-1])
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    os.remove(f"{src}/a.parquet")
    shutil.rmtree(f"{out}/batch=0")  # the sink write also vanished
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line.startswith("ERR= RuntimeError"), line
    assert "uncommitted batch" in line and "a.parquet" in line, line
    assert _sink_kv(out) == []  # refused BEFORE committing anything


@pytest.mark.parametrize("mode", ["truncated", "empty"])
def test_corrupted_offsets_log_refuses_loudly(healthy_fb, mode):
    src, out, ckpt = _fork(healthy_fb, f"offsets_{mode}")
    tgt = sorted(glob.glob(f"{ckpt}/offsets/[0-9]*"))[-1]
    data = open(tgt, "rb").read()
    open(tgt, "wb").write(data[: len(data) // 2] if mode == "truncated" else b"")
    crc = os.path.join(os.path.dirname(tgt), "." + os.path.basename(tgt) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line.startswith("ERR="), line
    # truncated JSON -> parse error; zero bytes -> "Incomplete log file";
    # either way LOUD, and the sink gains nothing
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30)]


@pytest.fixture(scope="module")
def healthy_windowed(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt_faults_win") / "healthy")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 01:10", "2024-01-01 09:30"])
    pq.write_table(pa.table({"ts": ts}), f"{src}/a.parquet")
    line = _run(_TRIG_WIN, src, out, ckpt)
    assert line == "BATCHES= ok", line
    return base


def test_state_store_corruption_refuses_loudly(healthy_windowed):
    src, out, ckpt = _fork(healthy_windowed, "state_flip")
    deltas = [
        p
        for p in glob.glob(f"{ckpt}/state/**/*.delta", recursive=True)
        if os.path.getsize(p) > 0
    ]
    # the largest delta holds the real window rows; flip a byte mid-file
    tgt = max(deltas, key=os.path.getsize)
    data = bytearray(open(tgt, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(tgt, "wb").write(bytes(data))
    crc = os.path.join(os.path.dirname(tgt), "." + os.path.basename(tgt) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)  # force the store's own decode, not the FS checksum
    ts2 = pd.to_datetime(["2024-01-01 02:20", "2024-01-01 11:00"])
    pq.write_table(pa.table({"ts": ts2}), f"{src}/b.parquet")
    line = _run(_TRIG_WIN, src, out, ckpt)
    assert line.startswith("ERR="), line
    assert "CANNOT_LOAD_STATE_STORE" in line or "state" in line.lower(), line


def test_parquet_sink_orphan_file_invisible_to_committed_reads(
    healthy_windowed, spark
):
    """A file-sink crash between the task file write and the _spark_metadata
    commit leaves an orphan part file; readers that honor the commit log
    (spark.read on the sink dir) must not see it. Raw directory globs
    (DuckDB, bare pyarrow) DO see it — documented: route sink reads
    through Spark or filter against _spark_metadata at fleet scale."""
    out = os.path.join(healthy_windowed, "out")
    committed = sorted(
        (r[0].isoformat(), int(r[1]))
        for r in spark.read.parquet(out).collect()
    )
    assert committed, "windowed sink produced no committed rows"
    orphan = os.path.join(out, "part-99999-orphan-c000.snappy.parquet")
    pq.write_table(
        pa.table({"win_start": pd.to_datetime(["1999-01-01"]), "n_events": [999]}),
        orphan,
    )
    try:
        after = sorted(
            (r[0].isoformat(), int(r[1]))
            for r in spark.read.parquet(out).collect()
        )
        assert after == committed, "orphan part file leaked into a committed read"
    finally:
        os.remove(orphan)


@pytest.mark.slow  # ~1.4 min: kill-and-twin drill across two fresh JVMs
def test_kill_mid_trigger_windowed_state_recovers_equal_to_clean_twin(tmp_path):
    """Kill the WINDOWED (state-store + parquet-sink) runner mid-batch and
    prove restarts converge to EXACTLY the clean run's output.

    The foreachBatch kill test above owns the commit-window lane; this one
    exercises the heavier recovery surface — state-store versions, the
    file sink's _spark_metadata transaction, and watermark replay — under
    a SIGKILL landed while batch 0 is in flight (the kill fires one second
    after ``offsets/0`` appears, which Spark writes at batch start). The
    oracle is a twin staging of identical input run kill-free for the same
    number of completed triggers; any divergence (lost windows, duplicate
    appends, resurrected pruned state) fails the equality.
    """
    import time

    import numpy as np
    import pandas as pd

    def stage(name):
        base = str(tmp_path / name)
        src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
        os.makedirs(src)
        rng = np.random.default_rng(7)
        n = 600_000
        for i in range(3):
            secs = rng.integers(0, 72 * 3600, n // 3)
            ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, unit="s")
            pq.write_table(pa.table({"ts": ts}), f"{src}/f{i}.parquet")
        return src, out, ckpt

    def read_out(out):
        import duckdb

        fs = glob.glob(os.path.join(out, "*.parquet"))
        if not fs:
            return []
        q = "SELECT * FROM read_parquet([%s])" % ",".join(f"'{f}'" for f in fs)
        return sorted(duckdb.sql(q).fetchall())

    # clean twin: two completed triggers
    src, out, ckpt = stage("clean")
    for _ in range(2):
        line = _run(_TRIG_WIN, src, out, ckpt)
        assert line == "BATCHES= ok", line
    clean = read_out(out)
    assert clean, "clean twin emitted nothing — fixture too small"

    # killed run: SIGKILL one second after batch 0 starts
    src, out, ckpt = stage("killed")
    p = subprocess.Popen(
        [sys.executable, "-c", _TRIG_WIN, src, out, ckpt],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 300
    while time.time() < deadline and not os.path.exists(f"{ckpt}/offsets/0"):
        if p.poll() is not None:
            raise AssertionError("runner exited before batch 0 started")
        time.sleep(0.05)
    assert os.path.exists(f"{ckpt}/offsets/0"), "batch 0 never started"
    time.sleep(1.0)
    p.kill()
    p.wait()
    # two restarts in fresh JVMs: recovery plus one steady-state trigger
    for i in (1, 2):
        line = _run(_TRIG_WIN, src, out, ckpt)
        assert line == "BATCHES= ok", f"restart {i}: {line}"
    assert read_out(out) == clean, (
        "killed-and-restarted output diverged from the clean twin"
    )


def test_two_jvms_racing_one_checkpoint_stay_exactly_once(tmp_path):
    """Two whole sessions (separate JVMs, the cross-process lane the r11
    write-session marker covers for N5 sinks) start the same checkpointed
    query at once: Spark's checkpoint lock/log must refuse one, and the
    union of sink output must hold every source row exactly once.

    Liveness vs correctness (r13, after one flake in a fully-loaded
    31-minute suite run that 7 isolated/loaded reruns could not
    reproduce): BOTH sessions losing the race (each crashing on the
    other's concurrent checkpoint update) is a legal at-most-one-wins
    outcome — loud, visible, retryable at fleet scale — so a no-winner
    round retries the race instead of failing. The CORRECTNESS invariant
    stays strict: on any round with a winner, the sink must hold every
    source row exactly once."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    for i in range(6):
        pq.write_table(
            pa.table({"k": list(range(i * 10, i * 10 + 10)), "v": [i] * 10}),
            f"{src}/f{i}.parquet",
        )
    for attempt in range(3):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _TRIG_FB, src, out, ckpt],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            for _ in range(2)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        lines = [
            [l for l in o.splitlines() if l.startswith(("BATCHES=", "ERR="))]
            for o in outs
        ]
        if any(l and l[-1].startswith("BATCHES=") for l in lines):
            break
    else:
        raise AssertionError(f"no session won the race in 3 rounds: {lines}")
    ks = [k for k, _v in _sink_kv(out)]
    assert sorted(ks) == list(range(60)), (
        f"duplicate or lost rows across racing sessions: "
        f"{len(ks)} rows, {len(set(ks))} unique; outcomes {lines}"
    )


# ---------------------------------------------------------------------------
# Compaction-batch crash windows (r13). FileStreamSourceLog writes every
# compactInterval'th batch (default 10: batches 9, 19, ...) as <N>.compact
# holding the FULL entry history, each row tagged with its owning batchId.
# The r12 guard only read plain <N> files, so a crash at exactly a
# compaction batch fell through to stock Spark's silent-empty replay —
# the very lane the guard exists to close (found by advisor review).
# ---------------------------------------------------------------------------

_TRIG_FB_10 = """
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
import pyarrow as pa, pyarrow.parquet as pq
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from n5_dask_spark.streaming.stateful import run_foreach_batch_incremental
src, out, ckpt = sys.argv[1:4]
os.makedirs(src, exist_ok=True)
seen = []
for i in range(10):
    pq.write_table(pa.table({"k": [i], "v": [i * 10]}), f"{src}/f{i}.parquet")
    seen += run_foreach_batch_incremental(spark, src, out, ckpt)
print("BATCHES=", seen)
""" % {"repo": REPO}


@pytest.fixture(scope="module")
def healthy_compact(tmp_path_factory):
    """Ten one-file triggers against one checkpoint in a single JVM, so
    batch 9 lands as sources/0/9.compact (the compaction shape)."""
    base = str(tmp_path_factory.mktemp("ckpt_faults_compact") / "healthy")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    line = _run(_TRIG_FB_10, src, out, ckpt)
    assert line == f"BATCHES= {list(range(10))}", line
    assert os.path.isfile(f"{ckpt}/sources/0/9.compact"), sorted(
        os.listdir(f"{ckpt}/sources/0")
    )
    assert not os.path.exists(f"{ckpt}/sources/0/9")
    return base


def test_compact_batch_crash_with_deleted_source_refuses_loudly(healthy_compact):
    """Crash window at the compaction batch itself: commits/9 gone, the
    batch-9 source file deleted. The guard must find the batch in
    9.compact and refuse — pre-fix it found no plain log and passed
    through to the silent-empty replay."""
    src, out, ckpt = _fork(healthy_compact, "compact_missing_src")
    _rm_with_crc(f"{ckpt}/commits/9")
    os.remove(f"{src}/f9.parquet")
    shutil.rmtree(f"{out}/batch=9")  # the sink write also vanished
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line.startswith("ERR= RuntimeError"), line
    assert "uncommitted batch" in line and "f9.parquet" in line, line
    assert _sink_kv(out) == [(i, i * 10) for i in range(9)]


def test_compact_batch_crash_ignores_committed_history_rows(healthy_compact):
    """Same crash window, but the deleted file belongs to a COMMITTED
    batch (0) whose entry appears in 9.compact's history. The batchId
    filter must keep the guard quiet: an unfiltered read would spuriously
    refuse on every retention-deleted old file, and the replay of batch 9
    itself is exactly-once."""
    src, out, ckpt = _fork(healthy_compact, "compact_old_file_gone")
    _rm_with_crc(f"{ckpt}/commits/9")
    os.remove(f"{src}/f0.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line == "BATCHES= [9]", line  # replayed, not refused
    assert _sink_kv(out) == [(i, i * 10) for i in range(10)]


# ---------------------------------------------------------------------------
# Sink writer fence (r13). The racing-JVMs test above found a REAL lane
# under full machine load: the race loser is refused by Spark's
# checkpoint lock only at its first commit-log write — AFTER its
# foreachBatch side effects ran — and the two sessions' batch=0
# mode("overwrite") writes interleaved cross-process into 90 rows for a
# 60-row source, silently. claim_sink_fence closes it by refusing the
# loser BEFORE the query starts; these lanes pin the fence deterministically.
# ---------------------------------------------------------------------------


def test_live_sink_fence_refuses_second_writer(tmp_path):
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from n5_dask_spark.streaming.stateful import claim_sink_fence

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _pq.write_table(_pa.table({"k": [1], "v": [10]}), f"{src}/a.parquet")
    fence = claim_sink_fence(out)  # held by THIS live process
    try:
        line = _run(_TRIG_FB, src, out, ckpt)
        assert line.startswith("ERR= RuntimeError"), line
        assert "fence" in line and "live pid" in line, line
        assert _sink_kv(out) == []  # refused before any side effect
    finally:
        os.unlink(fence)


def test_stale_sink_fence_is_reclaimed(healthy_fb):
    """A fence whose holder pid is dead is the crash-restart case a
    streaming runner must support: the next run reclaims it and
    processes normally — no manual cleanup, no lost incrementality."""
    src, out, ckpt = _fork(healthy_fb, "stale_fence")
    with open(os.path.join(out, ".n5ds-writer"), "w") as f:
        f.write("999999999")  # a pid no Linux host can be running
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    line = _run(_TRIG_FB, src, out, ckpt)
    assert line == "BATCHES= [1]", line
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30), (4, 40)]
    assert not os.path.exists(os.path.join(out, ".n5ds-writer"))


def test_sink_fence_is_never_observable_empty(tmp_path):
    """The r14 TOCTOU fix (r13 ADVICE medium): the r13 protocol O_EXCL-
    created the fence THEN wrote the pid, so a racer reading between the
    two saw an empty fence, parsed pid 0, declared it stale and unlinked
    the LIVE fence — both sessions then ran foreachBatch concurrently.
    The link()-based claim publishes content and existence in one atomic
    operation: the fence file carries our pid from its very first instant
    of visibility, and no claim-temp litter survives."""
    from n5_dask_spark.streaming.stateful import claim_sink_fence, release_sink_fence

    import socket as _socket

    out = str(tmp_path / "sink")
    fence = claim_sink_fence(out)
    # content (pid@host, the r14 cross-host format) from instant zero
    assert open(fence).read() == f"{os.getpid()}@{_socket.gethostname()}"
    assert os.stat(fence).st_nlink == 1  # the claim temp was unlinked
    assert [n for n in os.listdir(out) if n.startswith(".n5ds-writer")] == [
        ".n5ds-writer"
    ]
    release_sink_fence(fence)
    assert not os.path.exists(fence)


def test_sink_fence_empty_remnant_needs_backoff_not_instant_steal(tmp_path):
    """An EMPTY fence cannot come from the link protocol — but a remnant
    of the old protocol (or a manual touch) can present one. It must be
    re-read across a backoff before being treated as stale, so a writer
    mid-publish under the OLD protocol isn't robbed; after the backoff it
    is reclaimed (crash recovery still needs no manual cleanup)."""
    import time as _time

    from n5_dask_spark.streaming.stateful import claim_sink_fence, release_sink_fence

    out = str(tmp_path / "sink")
    os.makedirs(out)
    open(os.path.join(out, ".n5ds-writer"), "w").close()  # empty remnant
    t0 = _time.perf_counter()
    fence = claim_sink_fence(out)
    elapsed = _time.perf_counter() - t0
    assert elapsed >= 0.25, f"empty fence stolen without backoff ({elapsed:.3f}s)"
    assert open(fence).read().startswith(f"{os.getpid()}@")
    release_sink_fence(fence)


def test_foreign_host_fence_refused_even_with_locally_dead_pid(tmp_path):
    """r14 hardening: on a SHARED filesystem the fence can belong to a
    writer on another host, where our local pid probe is about the wrong
    process entirely — a pid dead here may be live there, and reclaiming
    would reopen the cross-process mixed-output lane. A fence recording a
    foreign hostname must be refused conservatively (with the manual
    recovery path in the message), not pid-probed; the legacy bare-pid
    format stays same-host reclaimable (pinned by
    test_stale_sink_fence_is_reclaimed)."""
    import pytest as _pytest

    from n5_dask_spark.streaming.stateful import claim_sink_fence

    out = str(tmp_path / "sink")
    os.makedirs(out)
    with open(os.path.join(out, ".n5ds-writer"), "w") as f:
        f.write("999999999@some-other-host")  # dead HERE; unknowable THERE
    with _pytest.raises(RuntimeError, match="cross-host liveness"):
        claim_sink_fence(out)
    # the foreign fence was not robbed
    assert open(os.path.join(out, ".n5ds-writer")).read() == "999999999@some-other-host"


# ---------------------------------------------------------------------------
# r14 lanes. (1) compactInterval=2: every other batch is a compaction
# batch, so the <N>.compact read path and its interval-boundary arithmetic
# get exercised far more often per wall-second than at the default 10.
# (2) URI-scheme checkpoints: the guard's listing is scheme-dispatched now
# (r13 scope note lifted), so a file: URI checkpoint dir must get the same
# crash-window protection as a plain local path.
# ---------------------------------------------------------------------------

_TRIG_FB_N_CI = """
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
import pyarrow as pa, pyarrow.parquet as pq
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.streaming.fileSource.log.compactInterval", sys.argv[4])
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from n5_dask_spark.streaming.stateful import run_foreach_batch_incremental
src, out, ckpt = sys.argv[1:4]
os.makedirs(src, exist_ok=True)
seen = []
for i in range(int(sys.argv[5])):
    pq.write_table(pa.table({"k": [i], "v": [i * 10]}), f"{src}/f{i}.parquet")
    seen += run_foreach_batch_incremental(spark, src, out, ckpt)
print("BATCHES=", seen)
""" % {"repo": REPO}

_TRIG_FB_CI2 = """
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.streaming.fileSource.log.compactInterval", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from n5_dask_spark.streaming.stateful import run_foreach_batch_incremental
try:
    b = run_foreach_batch_incremental(spark, sys.argv[1], sys.argv[2], sys.argv[3])
    print("BATCHES=", b)
except Exception as e:
    print("ERR=", type(e).__name__, str(e).split(chr(10))[0][:400])
""" % {"repo": REPO}


@pytest.fixture(scope="module")
def healthy_compact2(tmp_path_factory):
    """Six one-file triggers at compactInterval=2: compaction batches are
    1, 3, 5 — the final batch's log is sources/0/5.compact."""
    base = str(tmp_path_factory.mktemp("ckpt_faults_ci2") / "healthy")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    line = _run(_TRIG_FB_N_CI, src, out, ckpt, "2", "6")
    assert line == f"BATCHES= {list(range(6))}", line
    assert os.path.isfile(f"{ckpt}/sources/0/5.compact"), sorted(
        os.listdir(f"{ckpt}/sources/0")
    )
    assert os.path.isfile(f"{ckpt}/sources/0/3.compact")
    assert not os.path.exists(f"{ckpt}/sources/0/5")
    return base


def test_compact_interval2_crash_deleted_source_refuses_loudly(healthy_compact2):
    """Crash window at compaction batch 5 (interval 2): the guard must
    find batch 5 inside 5.compact and refuse on its deleted source."""
    src, out, ckpt = _fork(healthy_compact2, "ci2_missing_src")
    _rm_with_crc(f"{ckpt}/commits/5")
    os.remove(f"{src}/f5.parquet")
    shutil.rmtree(f"{out}/batch=5")  # the sink write also vanished
    line = _run(_TRIG_FB_CI2, src, out, ckpt)
    assert line.startswith("ERR= RuntimeError"), line
    assert "uncommitted batch" in line and "f5.parquet" in line, line
    assert _sink_kv(out) == [(i, i * 10) for i in range(5)]


def test_compact_interval2_committed_history_stays_quiet(healthy_compact2):
    """Same crash window, deleted file owned by COMMITTED batch 2 — whose
    entry lives in 5.compact's history (and 3.compact's). The batchId
    filter must keep the guard quiet and the replay of batch 5 itself is
    exactly-once."""
    src, out, ckpt = _fork(healthy_compact2, "ci2_old_file_gone")
    _rm_with_crc(f"{ckpt}/commits/5")
    os.remove(f"{src}/f2.parquet")
    line = _run(_TRIG_FB_CI2, src, out, ckpt)
    assert line == "BATCHES= [5]", line  # replayed, not refused
    assert _sink_kv(out) == [(i, i * 10) for i in range(6)]


def test_uri_checkpoint_deleted_source_refuses_loudly(healthy_fb):
    """The deleted-source lane over a file: URI checkpoint dir: before the
    r14 listing lift, the guard's os.listdir saw no offsets under the URI
    string and the restart fell through to stock Spark's silent-empty
    replay — URI checkpoints were second-class exactly where the guard
    matters most (object-store checkpoints at fleet scale)."""
    src, out, ckpt = _fork(healthy_fb, "uri_ckpt_missing_src")
    _rm_with_crc(sorted(glob.glob(f"{ckpt}/commits/[0-9]*"))[-1])
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    os.remove(f"{src}/a.parquet")
    shutil.rmtree(f"{out}/batch=0")
    line = _run(_TRIG_FB, src, out, f"file://{ckpt}")
    assert line.startswith("ERR= RuntimeError"), line
    assert "uncommitted batch" in line and "a.parquet" in line, line
    assert _sink_kv(out) == []  # refused BEFORE committing anything


def test_uri_checkpoint_healthy_restart_still_works(healthy_fb):
    """Control for the URI lane: a HEALTHY checkpoint addressed by URI
    restarts normally — the guard's URI listing must not false-positive."""
    src, out, ckpt = _fork(healthy_fb, "uri_ckpt_healthy")
    pq.write_table(pa.table({"k": [4], "v": [40]}), f"{src}/b.parquet")
    line = _run(_TRIG_FB, src, out, f"file://{ckpt}")
    assert line == "BATCHES= [1]", line
    assert _sink_kv(out) == [(1, 10), (2, 20), (3, 30), (4, 40)]
