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
# A pass whose calibration probe exceeds this factor x ref is treated as a
# transient hiccup (GC / C2 / host contention that hit the PROBE but not
# necessarily the queries) and excluded from the normalized min — see the
# r10 normalization fix in time_set(). 1.4x: the observed healthy in-bench
# spread is 0.29-0.43 s (0.8-1.25x ref); the r9 artifact pass read 0.761 s
# (2.2x). Uniform whole-VM slowness makes EVERY pass exceed the bound, in
# which case all passes are kept and normalization strips the drift as
# designed.
SUSPECT_CAL_FACTOR = 1.4


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


def reduce_passes(
    passes: list[tuple[float, dict[str, float]]], names: list[str]
) -> tuple[dict[str, float], dict[str, float]]:
    """Cross-pass reduction: per-query (best raw, best normalized).

    NORMALIZATION FIX (round 10). Normalization exists to make a pass that
    ran on a uniformly slow VM comparable — it must never mint a normalized
    time BELOW the raw time of a healthy pass. Round 9 showed the failure
    mode: one pass's calibration came in at 0.761 s (2.2x ref; the other
    passes read 0.33-0.43), its scale ref/cal = 0.46 deflated every sample
    in that pass, and the cross-pass min then preferred exactly those
    deflated samples — 16 of 18 untouched queries "improved" 18-48%
    normalized with zero plan change, and BENCH_r09's value_normalized
    8.201 was an artifact (honest steady state ~11.0 per the idle
    re-bench). The calibration hiccup had NOT hit the queries, so scaling
    them by it fabricated speed. Two guards now:

    1. a pass whose calibration exceeds SUSPECT_CAL_FACTOR x ref is
       EXCLUDED from the normalized min (its queries very likely did not
       share the probe's slowness; its raw samples still count for the raw
       best) — unless EVERY pass is suspect, i.e. the whole bench ran on a
       slow VM, which is exactly the uniform drift normalization exists to
       strip, so all passes are kept;
    2. scale is clamped at 1.0 so a slightly-slow surviving pass may
       deflate toward truth but a fast probe can never inflate, and
       normalized <= raw always holds per sample.

    Pure (passes -> bests) so tests/test_bench_norm.py can pin the r9
    artifact scenario without running Spark.
    """
    best = {name: min(s[name] for _, s in passes) for name in names}
    healthy = [
        (cal, s) for cal, s in passes if cal <= SUSPECT_CAL_FACTOR * CAL_REFERENCE_SEC
    ] or passes
    best_norm = {
        name: min(s[name] * min(1.0, CAL_REFERENCE_SEC / cal) for cal, s in healthy)
        for name in names
    }
    return best, best_norm


def healthy_pass_count(cals: list[float]) -> int:
    """How many passes survive the suspect-calibration filter (the set the
    NORMALIZED min is taken over; the raw min always spans every pass).

    r15 (VERDICT r14 "What's wrong" #3, additions-only disclosure): with
    few passes (the sf1 leg runs 2) one contended pass can leave the
    normalized min over a SMALLER sample than the raw min, so
    normalized > raw is possible and such a value is not comparable
    across rounds. Reporting the surviving sample count per timed set
    makes that visible in the artifact instead of needing forensics."""
    n = sum(1 for c in cals if c <= SUSPECT_CAL_FACTOR * CAL_REFERENCE_SEC)
    return n or len(cals)


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
    # per timed set: [surviving (healthy) pass count, total passes] — the
    # sample size behind each *_normalized value (r15, see healthy_pass_count)
    healthy_passes: dict[str, list[int]] = {}

    def time_set(
        names: list[str], at_dir: str = sf_dir, n_runs: int | None = None,
        label: str = "headline",
    ) -> tuple[dict[str, float], dict[str, float]]:
        """Per-query (best raw sec, best calibration-normalized sec).

        Each pass opens with the calibration probe. For the normalized
        best, samples are scaled by min(1.0, ref/probe) and passes with a
        suspect (> SUSPECT_CAL_FACTOR x ref) probe are excluded unless all
        passes are suspect — see the r10 normalization-fix comment below.
        """
        # Per-pass samples are kept so suspect passes can be excluded from
        # the normalized min AFTER all calibrations are known (r10 fix, see
        # below): (cal, {name: raw_dt}) per pass.
        passes: list[tuple[float, dict[str, float]]] = []
        for _ in range(n_runs or runs):
            cal = _calibration(spark)
            calibration_secs.append(round(cal, 3))
            samples: dict[str, float] = {}
            for name in names:
                t0 = time.perf_counter()
                rows = registry[name].fn(spark, at_dir).collect()
                dt = time.perf_counter() - t0
                assert rows is not None
                samples[name] = dt
            passes.append((cal, samples))
        healthy_passes[label] = [healthy_pass_count([c for c, _ in passes]), len(passes)]
        best, best_norm = reduce_passes(passes, names)
        return (
            {name: round(best[name], 3) for name in names},
            {name: round(best_norm[name], 3) for name in names},
        )

    per, per_norm = time_set(HEADLINE)
    pipelines, pipelines_norm = time_set(PIPELINES, label="pipelines")

    # Once-per-round sf1 leg (r10 verdict item 3): at sf0.1 the headline
    # queries run 0.24-1.4 s, where JVM/scheduler fixed costs and broadcast
    # latency dominate — the regime behind knn_bruteforce's nine-round
    # +/-40% noise band. One pass at sf1 (~6M-row lineitem, deterministic
    # x10 scale-up cached under .testdata/, see tools/gen_sf1.py) grades
    # the PLAN: scale-linear operators should sit near 10x their sf0.1
    # time (ratio well above ~10 = a superlinear shuffle/skew problem;
    # near 1x = the fixed-size N5/fixture pipelines, whose volumes don't
    # grow with sf by design). Same fixed protocol — per-pass calibration
    # probes, suspect-pass exclusion, best-of-N — at best-of-2 to bound
    # added wall time. SPARK_GRAFT_BENCH_SF1=0 skips (e.g. CI smoke).
    sf1_block = None
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        from tools.gen_sf1 import ensure_sf1

        t_gen = time.perf_counter()
        sf1_dir = ensure_sf1(spark)
        gen_sec = round(time.perf_counter() - t_gen, 3)
        t_warm1 = time.perf_counter()
        for name in HEADLINE:
            registry[name].fn(spark, sf1_dir).collect()
        warm1_sec = round(time.perf_counter() - t_warm1, 3)
        sf1_runs = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_RUNS", "2"))
        per1, per1_norm = time_set(HEADLINE, at_dir=sf1_dir, n_runs=sf1_runs, label="sf1")
        sf1_block = {
            "queries": per1,
            "queries_normalized": per1_norm,
            "value": round(sum(per1.values()), 3),
            "value_normalized": round(sum(per1_norm.values()), 3),
            # sample size behind value_normalized (r15): [healthy, total].
            # healthy < total means the normalized min spans FEWER passes
            # than the raw min — normalized can then exceed raw and is not
            # cross-round comparable (the r14 35.031-vs-31.152 artifact).
            "healthy_passes": healthy_passes["sf1"],
            "ratio_vs_sf0.1": {
                k: (round(per1[k] / per[k], 2) if per[k] else None) for k in per1
            },
            "runs_per_query": sf1_runs,
            "warmup_sec": warm1_sec,
            "ensure_sf1_sec": gen_sec,
        }
    # best-of-2, same single-hiccup argument as the CPU probe
    aux = _aux_probes(spark, int(cpus))
    aux2 = _aux_probes(spark, int(cpus))
    aux = {k: min(aux[k], aux2[k]) for k in aux}
    # Output framing (r11 verdict item 1): the external driver keeps only
    # the LAST 2000 chars of stdout and json-parses the FINAL line. The
    # r11 sf1 block, spliced into the single headline object, pushed that
    # line past the capture window and BENCH_r11.json recorded
    # parsed:null. So: sf1 + aux probes + verbose diagnostics each go out
    # as their OWN earlier line (still visible to a human runner), and the
    # final line stays a compact headline-only object -- measured ~1.4k
    # chars at the current 16+2 query set, leaving >500 chars of growth
    # slack inside the tail window. Because those earlier lines usually
    # fall OUTSIDE the driver's tail capture (r12 advice), they are also
    # written to a DURABLE sidecar file next to this script
    # (BENCH_SIDECAR.json, committed per round), and the headline carries
    # compact sf1 totals so the driver-parsed artifact alone records the
    # scale-up story.
    diagnostics = {
        "warmup_sec": warmup_sec,
        "runs_per_query": runs,
        "pipelines_normalized": pipelines_norm,
        "calibration_sec": calibration_secs,
        "calibration_ref_sec": CAL_REFERENCE_SEC,
        "healthy_passes": healthy_passes,
        **aux,
    }
    if sf1_block is not None:
        print(json.dumps({"sf1": sf1_block}))
    print(json.dumps({"bench_diagnostics": diagnostics}))
    sidecar = pathlib.Path(__file__).resolve().parent / "BENCH_SIDECAR.json"
    try:
        sidecar.write_text(
            json.dumps({"sf1": sf1_block, "bench_diagnostics": diagnostics}, indent=1)
            + "\n"
        )
    except OSError as e:  # read-only checkout: stdout lines still carry it
        print(json.dumps({"sidecar_write_failed": str(e)}))
    headline = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(per.values()), 3),
        "unit": "sec",
        "queries": per,
        "queries_normalized": per_norm,
        "value_normalized": round(sum(per_norm.values()), 3),
        "pipelines": pipelines,
        "pipelines_total": round(sum(pipelines.values()), 3),
        "sf": sf,
        "cpus": int(cpus),
        "calibration_min_sec": min(calibration_secs),
        "calibration_max_sec": max(calibration_secs),
        # Core-scaling sentinel (r15, VERDICT r14 "What's wrong" #2): at
        # sf0.1 the headline queries are fixed-overhead-dominated, so their
        # times barely move with $SPARK_GRAFT_CPUS and a per-query ratio
        # heuristic false-fires "cpus ignored". These probes DO scale with
        # the core pool (r14 c8 run: calibration 0.79-0.96 s vs 0.34-0.50 s
        # at c32, shuffle 1.553 vs 1.187) — compare them across the
        # driver's core-count runs to see the pool size is honored.
        "shuffle_probe_sec": aux["shuffle_probe_sec"],
        "python_probe_sec": aux["python_probe_sec"],
    }
    if sf1_block is not None:
        # compact scale-up summary inside the driver-captured line; the
        # full per-query sf1 map lives in BENCH_SIDECAR.json
        headline["sf1_total"] = sf1_block["value"]
        headline["sf1_total_normalized"] = sf1_block["value_normalized"]
    line = json.dumps(headline)
    # Hard guard: if the compact line ever creeps toward the driver's
    # 2000-char tail capture, drop the normalized map (derivable from
    # queries + calibration bounds) rather than ship an unparseable line.
    if len(line) > 1800:
        headline.pop("queries_normalized")
        line = json.dumps(headline)
    print(line)


if __name__ == "__main__":
    main()
