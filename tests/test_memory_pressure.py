"""Memory-pressure / spill probe (r13, VERDICT r12 item 5a).

Every prior gate ran the engine in the comfortable regime where operator
buffers fit in execution memory. At 100 TB they will not: sorts, windows
and sort-merge joins WILL spill to disk, and an operator that is only
correct while in-memory is a silent-wrong time bomb. This probe forces
the spill regime deterministically — `spark.memory.fraction=0.3` plus the
force-spill thresholds (`spark.shuffle.spill.numElementsForceSpillThreshold`,
the windowExec / sortMergeJoinExec buffer spill thresholds) set low
enough that ordinary sf0.01 partitions overflow — then

1. runs a spill-heavy query slice (window, sort, SMJ, aggregate, dedup,
   asof, multi-join) against the same DuckDB oracles the driver grades,
   asserting hash equality, and
2. PROVES the regime actually engaged by parsing the Spark event log for
   nonzero memory/disk spill task metrics — a probe that silently ran
   in-memory would be vacuous.

Runs in a subprocess: memory.fraction and the core force-spill threshold
are read at executor/memory-manager startup, not per-session."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_QUERIES = [
    "window_running_sum",       # windowExec buffer spill
    "window_rank_dense",
    "join_sort_merge_largelarge",  # SMJ buffered-match + sort spill
    "join_asof",                # sort + running-last window over the union
    "orderby_limit_topk",       # external sort
    "q1_pricing_summary",       # hash aggregate
    "q5_local_supplier_volume", # multi-join shuffle
    "dedup_minhash_lsh",        # bucket groupBy + in-bucket pairs
]

_SCRIPT = r"""
import glob, json, os, sys, time
os.environ["TZ"] = "America/New_York"
time.tzset()
sys.path.insert(0, %(repo)r)
import tempfile
eventdir = tempfile.mkdtemp(prefix="n5ds-spill-events-")
from pyspark.sql import SparkSession
confs = {
    # ~30%% of an already-small heap for execution+storage
    "spark.memory.fraction": "0.3",
    "spark.driver.memory": "2g",
    # force UnsafeExternalSorter spills after 5k rows everywhere (core
    # conf; also the default feeding the SQL operator thresholds)
    "spark.shuffle.spill.numElementsForceSpillThreshold": "5000",
    # operator-level buffers: spill after 256 buffered rows
    "spark.sql.windowExec.buffer.spill.threshold": "256",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "256",
    "spark.sql.sessionWindow.buffer.spill.threshold": "256",
    # small scan partitions -> many tasks under the squeezed heap
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": "file:" + eventdir,
    "spark.eventLog.compress": "false",  # parse the JSON lines directly
}
b = (SparkSession.builder.master("local[4]")
     .config("spark.sql.session.timeZone", "America/New_York")
     .config("spark.ui.enabled", "false"))
for k, v in confs.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# survive tune_session, like the driver's own session confs do
spark._n5ds_user_confs = frozenset(
    k for k in confs if k.startswith("spark.sql."))

from tests.oracle_harness import compare_query
results = {}
for name in %(queries)r:
    r = compare_query(spark, name, "/root/testdata/sf0.01")
    results[name] = bool(r["match"])
spark.stop()

mem_spill = disk_spill = 0
# Spark 4 event logs are v2 rolling DIRECTORIES (events_* files inside)
logs = [p for p in glob.glob(os.path.join(eventdir, "**"), recursive=True)
        if os.path.isfile(p)]
for log in logs:
    with open(log, errors="ignore") as fh:  # appstatus sidecars are binary
        for line in fh:
            if '"Memory Bytes Spilled"' not in line:
                continue
            ev = json.loads(line)
            tm = ev.get("Task Metrics") or {}
            mem_spill += tm.get("Memory Bytes Spilled", 0)
            disk_spill += tm.get("Disk Bytes Spilled", 0)
print("SPILL_PROBE", json.dumps(
    {"results": results, "mem_spill": mem_spill, "disk_spill": disk_spill}))
""".strip()


def test_queries_stay_hash_equal_under_forced_spill():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = _SCRIPT % {"repo": REPO, "queries": _QUERIES}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    line = next(l for l in proc.stdout.splitlines() if l.startswith("SPILL_PROBE"))
    payload = json.loads(line.split(" ", 1)[1])
    bad = [k for k, ok in payload["results"].items() if not ok]
    assert not bad, f"hash mismatches under forced spill: {bad}"
    # the regime must have ENGAGED: zero spill means the probe is vacuous
    assert payload["mem_spill"] > 0, payload
    assert payload["disk_spill"] > 0, payload
