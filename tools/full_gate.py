"""Round-end ritual gate: EVERY registered query vs its DuckDB oracle.

Runs under driver-sim conditions — hostile PROCESS timezone (set before
pyspark import, so LTZ leaks render wrong), non-UTC SESSION timezone,
and any extra hostile session confs passed on the command line — and
prints one JSON line with per-query pass/fail plus totals. Exit code 1
on any mismatch.

    python tools/full_gate.py [sf_dir] [k=v ...]

Examples:
    python tools/full_gate.py                       # sf0.01, plain
    python tools/full_gate.py /root/testdata/sf0.1  # sf0.1 leg
    python tools/full_gate.py /root/testdata/sf0.01 \
        spark.sql.ansi.enabled=true spark.sql.shuffle.partitions=5
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("TZ", "Pacific/Kiritimati")
time.tzset()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "=" not in args[0] else "/root/testdata/sf0.01"
    confs = dict(a.split("=", 1) for a in args if "=" in a)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        # start-time-only conf: the sf1 directory (6M-row lineitem) OOMs
        # the 1g JVM default long before tune_session can matter
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # hostile confs must SURVIVE tune_session (the driver's own confs do:
    # they're session-level, and tune_session only overrides a fixed list
    # unless recorded as user confs) — record them like cli --conf does
    spark._n5ds_user_confs = frozenset(confs)

    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import compare_query

    t_all = time.perf_counter()
    results: dict[str, bool] = {}
    failures: list[dict] = []
    for name in load_all():
        try:
            r = compare_query(spark, name, sf_dir)
            ok = bool(r["match"])
            if not ok:
                failures.append(r)
        except Exception as e:  # a crash is a failure with the error kept
            ok = False
            failures.append({"name": name, "error": str(e)[:500]})
        results[name] = ok
    total = time.perf_counter() - t_all
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "confs": confs,
                "passed": sum(results.values()),
                "total": len(results),
                "wall_sec": round(total, 1),
                "failures": failures,
            },
            default=str,  # Decimal/datetime/bytes in failure diffs
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
