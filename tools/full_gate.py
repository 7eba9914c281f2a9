"""Round-end ritual gate: EVERY registered query vs its DuckDB oracle.

Runs under driver-sim conditions — hostile PROCESS timezone (set before
pyspark import, so LTZ leaks render wrong), non-UTC SESSION timezone,
and any extra hostile session confs passed on the command line — and
prints one JSON line with per-query pass/fail plus totals. Exit code 1
on any mismatch.

    python tools/full_gate.py [--empty|--one-row|--dir-shaped] [sf_dir] [k=v ...]

Examples:
    python tools/full_gate.py                       # sf0.01, plain
    python tools/full_gate.py /root/testdata/sf0.1  # sf0.1 leg
    python tools/full_gate.py /root/testdata/sf0.01 \
        spark.sql.ansi.enabled=true spark.sql.shuffle.partitions=5
    python tools/full_gate.py --empty               # zero-row boundary sweep
    python tools/full_gate.py --one-row             # one-row boundary sweep
    python tools/full_gate.py --dir-shaped          # directory-dataset sweep

Boundary flags (r13, promoting the r11/r12 bespoke recipes): stage
degenerate copies of all ten tables from the given sf_dir under
``.testdata/`` and run the gate against them.

- ``--empty``: zero rows, schemas preserved. The corpus-derived
  N5/TIFF/OME fixture queries REFUSE loudly by contract ("documents
  table at this sf_dir is empty", n5oracle._voxels) — those named
  refusals are counted as expected_refusals, not failures; anything
  else failing is a real find (this sweep surfaced the r11 rollup/cube
  grand-total divergence).
- ``--one-row``: ``.slice(0, 1)`` of every table; expected all-green
  (found the r9 n-1=0 sample-variance lane).
- ``--dir-shaped``: every table as a Spark-style DIRECTORY dataset
  (two part files) instead of a single parquet file; expected all-green
  (found the r11 streaming dir-symlink zero-file staging bug).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("TZ", "Pacific/Kiritimati")
time.tzset()

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_MODES = {"--empty": "sf0", "--one-row": "sf1row", "--dir-shaped": "sfdir"}

# the documented loud-refusal contract for corpus-derived fixture queries
# on an empty documents table is recognized by exception IDENTITY
# (n5oracle.EmptyCorpusRefusal), not by substring — a real failure that
# merely mentions an empty buffer/partition must stay a failure (r13
# ADVICE low). Imported lazily in main() after sys.path setup.


def stage_boundary(src_dir: str, mode: str) -> str:
    """Stage degenerate copies of all ten tables under .testdata/<mode>."""
    import pyarrow.parquet as pq

    dst = REPO / ".testdata" / _MODES[mode]
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        out = dst / f"{t}.parquet"
        if mode == "--empty":
            pq.write_table(table.slice(0, 0), out)
        elif mode == "--one-row":
            pq.write_table(table.slice(0, 1), out)
        else:  # --dir-shaped: a directory dataset of two part files
            import shutil

            shutil.rmtree(out, ignore_errors=True)
            out.mkdir()
            half = max(1, table.num_rows // 2)
            pq.write_table(table.slice(0, half), out / "part-00000.parquet")
            pq.write_table(table.slice(half), out / "part-00001.parquet")
    return str(dst)


def main() -> None:
    args = sys.argv[1:]
    mode = next((a for a in args if a in _MODES), None)
    args = [a for a in args if a not in _MODES]
    sf_dir = args[0] if args and "=" not in args[0] else "/root/testdata/sf0.01"
    confs = dict(a.split("=", 1) for a in args if "=" in a)
    if mode:
        sf_dir = stage_boundary(sf_dir, mode)

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

    from n5_dask_spark.operators.n5oracle import EmptyCorpusRefusal
    from n5_dask_spark.registry import load_all
    from tests.oracle_harness import compare_query

    t_all = time.perf_counter()
    results: dict[str, bool] = {}
    failures: list[dict] = []
    expected_refusals: list[str] = []
    for name in load_all():
        try:
            r = compare_query(spark, name, sf_dir)
            ok = bool(r["match"])
            if not ok:
                failures.append(r)
        except Exception as e:  # a crash is a failure with the error kept
            if mode == "--empty" and isinstance(e, EmptyCorpusRefusal):
                # the documented loud refusal IS the correct empty-corpus
                # behavior for the fixture family — pass by contract
                expected_refusals.append(name)
                results[name] = True
                continue
            ok = False
            failures.append({"name": name, "error": str(e)[:500]})
        results[name] = ok
    total = time.perf_counter() - t_all
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "mode": mode,
                "confs": confs,
                "passed": sum(results.values()),
                "total": len(results),
                "expected_refusals": expected_refusals,
                "wall_sec": round(total, 1),
                "failures": failures,
            },
            default=str,  # Decimal/datetime/bytes in failure diffs
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
