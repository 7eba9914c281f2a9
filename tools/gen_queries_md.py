"""Regenerate QUERIES.md from the live registry:
    python tools/gen_queries_md.py > QUERIES.md
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from n5_dask_spark.registry import load_all  # noqa: E402

GROUPS = [
    ("TPC-H-family analytics", ("q1_", "q3_", "q4_", "q5_", "q6_", "q7_", "q8_", "q9_", "q10_", "q14_", "q18_", "q19_", "q22_")),
    ("Joins", ("join_",)),
    ("Aggregation", ("agg_", "distinct_", "pivot_", "listagg_")),
    ("Window functions / top-k", ("window_", "topk_", "orderby_")),
    ("Set operations", ("set_",)),
    ("Scalar functions / subqueries", ("scalar_", "correlated_", "array_")),
    ("Events & streaming", ("events_", "streaming_")),
    ("Deduplication", ("dedup_",)),
    ("Similarity search", ("knn_", "embedding_")),
    ("Text analysis", ("text_",)),
    ("Multimodal", ("multimodal_",)),
    ("UDF surface", ("udf_", "udtf_", "udaf_")),
    ("Composed pipelines", ("pipeline_",)),
    ("N5 chunked arrays", ("n5_",)),
]


def main() -> None:
    reg = load_all()
    used: set[str] = set()
    print("# QUERIES — registered operator inventory (auto-generated)\n")
    print(
        "One row per `queries()` entry in `__spark_entry__.py`. `oracle` = "
        "hash-checked against DuckDB by the driver's t2 gate; `rows-only` = "
        "no SQL-expressible oracle (fixture-based N5 ops, engine-specific "
        "sketches) — these are golden-tested in `tests/` instead.\n"
    )
    for title, prefixes in GROUPS:
        names = [n for n in sorted(reg) if n.startswith(prefixes) and n not in used]
        if not names:
            continue
        used.update(names)
        print(f"## {title}\n")
        print("| query | check | what it demonstrates |")
        print("|---|---|---|")
        for n in names:
            q = reg[n]
            doc = " ".join((q.doc or "").split())
            check = "oracle" if q.oracle else "rows-only"
            print(f"| `{n}` | {check} | {doc} |")
        print()
    rest = [n for n in sorted(reg) if n not in used]
    if rest:
        print("## Other\n")
        print("| query | check | what it demonstrates |")
        print("|---|---|---|")
        for n in rest:
            q = reg[n]
            print(f"| `{n}` | {'oracle' if q.oracle else 'rows-only'} | {' '.join((q.doc or '').split())} |")
        print()
    n_oracle = sum(1 for q in reg.values() if q.oracle)
    print(f"**Total: {len(reg)} queries, {n_oracle} oracle-checked, {len(reg) - n_oracle} rows-only.**")


if __name__ == "__main__":
    main()
