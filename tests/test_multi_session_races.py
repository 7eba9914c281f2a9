"""Multi-session catalog/staging race probe (r13, VERDICT r12 item 5c).

Several registered queries stage state on the shared machine: the
streaming source's CONTENT-ADDRESSED symlink dir (shared across
processes by design — concurrent stagers resolve the same target), the
pid-keyed N5 oracle containers / format-roundtrip dirs / foreachBatch
sinks, and the pid-keyed incremental-restart scratch. The pid-keying
discipline was previously tested in-process only; this probe runs TWO
whole SparkSessions in separate JVMs executing the SAME staging-heavy
query slice CONCURRENTLY against one sf_dir, and requires every query
in BOTH processes to hash-match its DuckDB oracle. A cross-process
staging collision (one process rmtree'ing or overwriting the other's
in-flight staging) surfaces as a mismatch, a crash, or a short read —
all loud here.

The slice covers each staging family: the shared stream-stage symlink
(streaming_session_window), the pid-keyed checkpoint scratch
(streaming_incremental_restart), pid-keyed N5 containers
(n5_roundtrip_zprofile), the TIFF series staging (tiff_roundtrip_
zprofile), format staging (formats_csv_roundtrip), plus a pure-compute
control (dedup_minhash_lsh)."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_QUERIES = [
    "streaming_session_window",
    "streaming_incremental_restart",
    "n5_roundtrip_zprofile",
    "tiff_roundtrip_zprofile",
    "formats_csv_roundtrip",
    "dedup_minhash_lsh",
]

_SCRIPT = r"""
import json, os, sys, time
os.environ["TZ"] = "America/New_York"
time.tzset()
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tests.oracle_harness import compare_query
out = {}
for name in %(queries)r:
    try:
        r = compare_query(spark, name, "/root/testdata/sf0.01")
        out[name] = bool(r["match"])
    except Exception as e:
        out[name] = f"{type(e).__name__}: {str(e)[:300]}"
print("RACE_PROBE " + json.dumps(out))
""".strip()


@pytest.mark.slow  # ~33 s: two concurrent fresh JVMs over the staging-heavy slice
def test_two_sessions_run_staging_queries_concurrently():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = _SCRIPT % {"repo": REPO, "queries": _QUERIES}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    outs = []
    for p in procs:
        o, e = p.communicate(timeout=900)
        assert p.returncode == 0, f"stdout:\n{o[-1500:]}\nstderr:\n{e[-3000:]}"
        line = next(l for l in o.splitlines() if l.startswith("RACE_PROBE "))
        outs.append(json.loads(line.split(" ", 1)[1]))
    for i, res in enumerate(outs):
        bad = {k: v for k, v in res.items() if v is not True}
        assert not bad, f"process {i} raced: {bad}"
