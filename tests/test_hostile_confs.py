"""Hostile-session-conf net (r10). The driver owns the SparkSession and
may run with arbitrary confs; results must be invariant to execution
mode and partitioning, not green by optimizer luck. This net flips every
lever at once — ANSI off, spark.sql.shuffle.partitions=7 (odd, tiny),
whole-stage codegen OFF (interpreted expressions), AQE OFF,
caseSensitive=true, vectorized parquet reader OFF, Arrow batches of
SEVEN rows (any pandas-UDF logic assuming one batch per partition
breaks) — and hash-compares against the DuckDB oracles. The full
160-query registry ran green in round 10 under the first four levers
(168.5 s at sf0.01), under caseSensitive+non-vectorized (173.3 s), and
under 7-row Arrow batches (186.0 s), and under
autoBroadcastJoinThreshold=-1 (sort-merge everywhere, 224.2 s — our
explicit F.broadcast hints still apply, auto decisions all flip); this
pins a cross-family sample with ALL levers at once so the net stays
reproducible (subprocess: the confs are session-static, the shared
fixture can't carry them).
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
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.codegen.wholeStage", "false")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.caseSensitive", "true")
    .config("spark.sql.parquet.enableVectorizedReader", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, %(repo)r)
from tests.oracle_harness import compare_query

names = [
    "q1_pricing_summary",      # decimal-exact agg
    "join_asof",               # union + running-last, sort exchange
    "join_salted",             # explicit salting vs partitioning
    "window_rank_dense",       # window over 7 partitions
    "agg_median_percentile",   # interpolation in interpreted mode
    "scalar_math_funcs",       # extreme-magnitude guards without ANSI
    "dedup_minhash_lsh",       # bucket-join under odd partitioning
    "knn_bruteforce_cosine",   # broadcast + window without codegen
    "sample_stratified_hash",  # md5-threshold must be partition-invariant
    "n5_roundtrip_zprofile",   # full write->scan->profile pipeline
    "udaf_applyinpandas_minmax_scale",  # Arrow UDAF under 7 partitions
    "events_tumbling_window",  # timestamp bucketing without ANSI
]
bad = []
for n in names:
    r = compare_query(spark, n, "/root/testdata/sf0.01")
    if not r["match"]:
        bad.append(n)
assert not bad, f"hash mismatch under hostile confs: {bad}"
print("HOSTILE_CONF_NET_OK", len(names))
""" % {"repo": REPO}


def test_results_invariant_under_hostile_session_confs():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "HOSTILE_CONF_NET_OK" in proc.stdout, proc.stdout
