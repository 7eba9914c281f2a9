"""Mid-session timezone-flip probe (r14 — the hostile-conf lever the r13
verdict named but no prior pass had drawn: ``spark.sql.session.timeZone``
set PER-QUERY, mid-session, not once at build time).

The driver owns the SparkSession and may mutate runtime confs between our
calls — a notebook user flipping the session zone to eyeball local times,
an orchestrator applying tenant defaults. Every registered query funnels
through ``catalog.load_tables`` → ``tune_session``, which re-pins the
session zone to UTC on EVERY call (session.py: the determinism confs apply
unconditionally), so a flip between queries must never reach timestamp
semantics. The PROCESS zone is flipped at the same cadence
(``os.environ['TZ']`` + ``time.tzset()``): collect() renders TIMESTAMP
(LTZ) through the Python process zone, which no session conf governs — the
r9 find — so this also re-proves that every surfaced timestamp stays NTZ
under a zone that changes WHILE the session lives, not just one hostile
zone fixed at launch.

Two passes over a timestamp-heavy cross-family sample, each query under a
DIFFERENT zone each pass (offsets include half- and quarter-hour zones),
hash-compared against the DuckDB oracles. Subprocess leg: the process-zone
flips must not leak into the shared-fixture session of the rest of the
suite.
"""

import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_SCRIPT = r"""
import os, sys, time
os.environ["TZ"] = "Pacific/Kiritimati"
time.tzset()
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, %(repo)r)
from tests.oracle_harness import compare_query

# offsets: +14, -5/-4, +5:45 (quarter-hour), -9:30 (half-hour), UTC
ZONES = [
    "Pacific/Kiritimati",
    "America/New_York",
    "Asia/Kathmandu",
    "Pacific/Marquesas",
    "UTC",
]
NAMES = [
    "events_tumbling_window",   # timestamp bucketing
    "events_sliding_window",    # overlapping windows
    "events_session_window",    # gap-based sessionization
    "join_asof",                # the one registry query that surfaced LTZ (r9)
    "scalar_date_funcs",        # date arithmetic / extraction
    "events_json_extract",      # timestamps through JSON parsing
    "q1_pricing_summary",       # date-filtered decimal agg
    "window_range_between",     # range frame arithmetic
]
bad = []
for p in range(2):
    for i, n in enumerate(NAMES):
        z = ZONES[(i + p * 3) %% len(ZONES)]
        # the driver-side mutation this probe exists for: BOTH zones
        # flipped between queries, mid-session
        os.environ["TZ"] = z
        time.tzset()
        spark.conf.set("spark.sql.session.timeZone", z)
        r = compare_query(spark, n, "/root/testdata/sf0.01")
        if not r["match"]:
            bad.append((p, n, z))
assert not bad, f"hash mismatch under mid-session timezone flips: {bad}"
print("TZ_MIDSESSION_NET_OK", len(NAMES) * 2)
""" % {"repo": REPO}


def test_results_invariant_under_midsession_timezone_flips():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "TZ_MIDSESSION_NET_OK 16" in proc.stdout
