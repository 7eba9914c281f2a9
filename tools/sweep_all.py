"""Time EVERY registered query (collect, best-of-N) at one sf_dir.

Optimization-round coverage tool (r14): the graded bench times 21
queries; this sweeps all 161 so stragglers outside the benched set are
measured, not guessed (it found udtf_fee_schedule's missing filter
pushdown and embedding_near_duplicates' per-pair norm recompute).
Back-to-back runs are contention-prone — treat single-query spikes as
suspect and re-measure interleaved before acting on them.

Usage: python tools/sweep_all.py [sf_dir] [runs]   (defaults sf0.1, 2)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from n5_dask_spark.registry import load_all
from n5_dask_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # runs <= 0 would leave best = inf, and json.dumps emits bare Infinity
    # (not valid JSON for downstream parsers) — clamp (r15 ADVICE)
    runs = max(1, int(sys.argv[2])) if len(sys.argv) > 2 else 2
    spark = get_spark(
        "n5ds-sweep-all",
        extra_conf={"spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    spark.range(256).repartition(32).mapInPandas(lambda it: it, "id long").collect()
    out: dict[str, object] = {}
    for name in reg:
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        except Exception as e:  # keep sweeping; the error is the data point
            out[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({name: out[name]}), flush=True)
    ranked = sorted(
        ((v, k) for k, v in out.items() if not isinstance(v, str)), reverse=True
    )
    print(json.dumps({"total_sec": round(sum(v for v, _ in ranked), 1),
                      "slowest": [[k, v] for v, k in ranked[:15]]}))


if __name__ == "__main__":
    main()
