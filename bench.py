#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": <single-query total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...},
   "pipelines": {"tiff_roundtrip_zprofile": sec, ...},
   "pipelines_total": sec, "sf": 0.1}

The headline set spans every operator family (scan-agg, multi-join,
window, as-of join, streaming-window semantics, dedup/LSH, similarity,
text) so a regression anywhere shows up here.

Multi-job composites (end-to-end roundtrips, iterative graph algorithms)
are reported in a separate ``pipelines`` section: they are pipelines of
many sequential Spark jobs, so mixing them into the single-query headline
makes round-over-round totals unreadable (round 3's "+5 s" was entirely
two new composites). ``value`` stays the single-query total for
like-for-like comparison across rounds.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from n5_dask_spark.registry import load_all
from n5_dask_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_asof",
    "window_row_number",
    "events_tumbling_window",
    "events_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "knn_signbucket_lsh",
    "text_tf_top_terms",
    "multimodal_feature_extract",
    "n5_rechunk_stats",
    # round 2: hash-checked N5 write->read roundtrip + sharded packing
    "n5_roundtrip_zprofile",
    # DRIFT RE-BASELINE (r8, closes the r6/r7 watch entry): the r4 record
    # of 0.292 s predates the r5 bench protocol (interleaved best-of-4 +
    # calibration probe) — the query's source did not change between the
    # r4 and r5 benches (git diff 2b0ca40..68099dd touches neither
    # pipeline2.py nor dedup.py), yet the recorded time moved 0.292->0.473,
    # so the jump is the measurement, not the plan. Steady state under the
    # current protocol was 0.39-0.40; r8 also swaps size(split(...)) for a
    # direct whitespace-run count (SPARK_N_TOKENS: no collapsed string, no
    # token array), worth ~5-10% here and an allocation saving at scale.
    "pipeline_sequence_packing",
]

# Multi-job composites, timed and reported separately (see module doc).
PIPELINES = [
    "tiff_roundtrip_zprofile",  # series build -> N5 import -> TIFF export -> re-scan
    "dedup_connected_clusters",  # iterative label propagation
    "dedup_cc_star",  # iterative large-star/small-star contraction
]

# Fixed-cost JVM-side calibration probe: a pure whole-stage-codegen scan
# with no IO, no shuffle and no Python, so its wall time measures only how
# fast this VM runs JVM compute *right now*. Timed once at the start of
# every pass; a uniformly slow harness VM (the round-5 open question: 14
# of 18 queries drifted 1.3-1.76x on untouched plans) shows up directly as
# a slow calibration, turning "the VM was slow" from inference into
# measurement.
_CAL_SQL = "sum((id * 2654435761L) % 1000) AS s"
# 2e9 rows: ~0.35 s steady-state on an idle build VM. Smaller probes (2e8)
# finish in ~0.23 s of which most is task-launch overhead, so they barely
# respond to CPU slowness; at 2e9 the probe cost is dominated by codegen'd
# compute in the same cost regime as the median headline query.
_CAL_ROWS = 2_000_000_000
# Healthy-VM best-of-2 probe value (the statistic each pass records).
# Re-measured late in round 6 on an IDLE build VM: plain-run median
# 0.381 s (6 samples 0.363-0.391), in-bench best-of-2 probes 0.29-0.37.
# The 0.55 s originally recorded here was itself sampled during a
# contended window — the very effect the probe exists to expose — and
# inflated every normalized time ~1.7x. Normalized per-query time =
# raw * (ref / its pass's calibration), so cross-round comparisons can
# strip uniform VM drift: on a uniformly 1.4x-slow harness window the
# probes read ~1.4x ref and normalization divides the drift back out.
# Interpretation contract: normalized ~= raw on a healthy VM; a large
# normalized/raw gap means the VM (not the code) moved. The ref is tied
# to the driver's default local[32] — the probe parallelizes, so a
# SPARK_GRAFT_CPUS override shifts probe times and normalized values are
# then only comparable within that run.
# HISTORY: rounds 1-5 normalized with ref 0.55 (sampled on a contended
# window — see above); r6+ use 0.35 and record the ref in the output JSON
# (`calibration_ref_sec`). Cross-round comparisons of NORMALIZED numbers
# must renormalize old records by x(0.35/0.55) first (raw numbers and
# same-ref rounds compare directly).
CAL_REFERENCE_SEC = 0.35


# Diagnostic-only probes (recorded in the JSON, NOT used for
# normalization — changing the normalization basis would break
# cross-round comparability). They exist because the CPU probe above is
# blind to the two other cost regimes headline queries live in, and the
# r8->r9 drift episodes showed exactly that signature: CPU probe flat
# while shuffle/Python-heavy queries moved 15-25% (fresh-boot cold page
# cache / memory-bandwidth state). One sample of each per bench run
# (after warmup) turns "which regime moved" from inference into data:
# - shuffle probe: 20M rows -> 1M-group hash aggregate. Partial agg,
#   one exchange (serialization + local shuffle files), final agg; no
#   Python.
# - python probe: 2M rows through an Arrow mapInPandas identity across
#   all workers. Worker pool reuse, Arrow encode/decode; no shuffle.
# First recorded readings (r9, during a live contended episode: CPU
# probe healthy 0.32-0.36 while headline shuffle/Python queries sat
# 15-25% over their bests): shuffle 3.3 s / python 2.0 s end-of-run;
# an isolated-session sweep minutes later bounced shuffle 1.5-7.1 s,
# python 1.0-4.2 s, CPU probe 0.42-1.48 s with the VM 97% idle and 3%
# iowait — i.e. host/disk-level noise, not code. Treat roughly
# sub-second readings as healthy; large probe values mean the pass's
# RAW numbers are inflated in the regime that probe measures.
_SHUFFLE_PROBE_ROWS = 20_000_000
_PY_PROBE_ROWS = 2_000_000


def _aux_probes(spark, cpus: int) -> dict[str, float]:
    t0 = time.perf_counter()
    spark.range(_SHUFFLE_PROBE_ROWS).selectExpr("id % 1000000 AS k").groupBy(
        "k"
    ).count().selectExpr("sum(count) AS s").collect()
    shuffle_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.range(_PY_PROBE_ROWS).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).selectExpr("count(*) AS n").collect()
    py_sec = time.perf_counter() - t0
    return {
        "shuffle_probe_sec": round(shuffle_sec, 3),
        "python_probe_sec": round(py_sec, 3),
    }


def _calibration(spark) -> float:
    """Best of two probe runs. A GC/C2 hiccup can only make a probe
    SLOWER, never faster, and a slow probe inflates scale = ref/cal —
    which would deflate every normalized sample in its pass and then win
    the cross-pass min. Taking the min of two runs means a single hiccup
    cannot distort a pass's normalization; genuine whole-VM slowness
    (the thing the probe exists to measure) slows both runs alike."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(_CAL_ROWS).selectExpr(_CAL_SQL).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from n5_dask_spark.catalog import DEFAULT_SF_DIR

    sf_dir = DEFAULT_SF_DIR
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(pathlib.Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(
        "n5_dask_spark-bench",
        cpus=int(cpus),
        # codegen-heavy sweep: ~40 distinct plans compile per pass; the
        # default 240 MB code cache thrashes (evict -> deopt -> recompile),
        # which showed up as 3-15x run-to-run swings on individual queries.
        extra_conf={"spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warm pass: spawn the Python worker pool (32 interpreters + pandas /
    # Arrow import), then run EVERY benched query once untimed. Per-query
    # synthetic warmups proved insufficient — the first execution of each
    # heavy kernel floods the C2 compile queue and the *next several*
    # queries pay for it, so the only stable protocol is: compile
    # everything, let the JIT drain, then time. Reported as warmup_sec.
    t_warm = time.perf_counter()
    spark.range(256).repartition(int(cpus)).mapInPandas(lambda it: it, "id long").collect()
    _calibration(spark)  # compile the probe plan too
    _aux_probes(spark, int(cpus))  # compile the diagnostic probe plans too
    for name in HEADLINE + PIPELINES:
        registry[name].fn(spark, sf_dir).collect()
    time.sleep(5)  # let background C2 compilation + /tmp writeback drain
    warmup_sec = round(time.perf_counter() - t_warm, 3)

    # best-of-N per query, timed in INTERLEAVED round-robin passes: pass 1
    # runs every query once, pass 2 runs every query once, ...; each query
    # reports its best across passes. Round 4 proved why: 3 *consecutive*
    # runs per query let a transient churn window (residual JIT drain,
    # /tmp writeback) land entirely on whichever query ran first — the
    # driver VM recorded q1 at 4.42 s vs a 1.21 s steady state with zero
    # code change. Interleaving spaces each query's samples minutes apart,
    # so a multi-second churn window can corrupt at most one of its N
    # samples and best-of-N still reports steady state. Four passes (+1
    # over round 4) stretch the timing window past the multi-minute
    # whole-VM churn episodes observed on the harness VM — a uniformly
    # slow pass then costs nothing because some other pass lands clean.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    calibration_secs: list[float] = []

    def time_set(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        """Per-query (best raw sec, best calibration-normalized sec).

        Each pass opens with the calibration probe; every sample taken in
        that pass is scaled by ref/probe before taking the normalized
        best, so a pass run during a whole-VM slow window contributes its
        samples at their drift-corrected value instead of being discarded.
        """
        best: dict[str, float] = {}
        best_norm: dict[str, float] = {}
        for _ in range(runs):
            cal = _calibration(spark)
            calibration_secs.append(round(cal, 3))
            scale = CAL_REFERENCE_SEC / cal
            for name in names:
                t0 = time.perf_counter()
                rows = registry[name].fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                assert rows is not None
                best[name] = min(dt, best.get(name, dt))
                best_norm[name] = min(dt * scale, best_norm.get(name, dt * scale))
        return (
            {name: round(best[name], 3) for name in names},
            {name: round(best_norm[name], 3) for name in names},
        )

    per, per_norm = time_set(HEADLINE)
    pipelines, pipelines_norm = time_set(PIPELINES)
    # best-of-2, same single-hiccup argument as the CPU probe
    aux = _aux_probes(spark, int(cpus))
    aux2 = _aux_probes(spark, int(cpus))
    aux = {k: min(aux[k], aux2[k]) for k in aux}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(per.values()), 3),
                "unit": "sec",
                "queries": per,
                "queries_normalized": per_norm,
                "value_normalized": round(sum(per_norm.values()), 3),
                "pipelines": pipelines,
                "pipelines_normalized": pipelines_norm,
                "pipelines_total": round(sum(pipelines.values()), 3),
                "sf": sf,
                "cpus": int(cpus),
                "warmup_sec": warmup_sec,
                "runs_per_query": runs,
                "calibration_sec": calibration_secs,
                "calibration_ref_sec": CAL_REFERENCE_SEC,
                **aux,
            }
        )
    )


if __name__ == "__main__":
    main()
