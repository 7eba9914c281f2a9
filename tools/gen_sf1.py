"""sf1 bench data: deterministic x10 scale-up of the driver's sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1} only, and at sf0.1 the headline
queries run 0.24-1.4 s — a regime where JVM/scheduler fixed costs and
broadcast latency dominate and plan differences drown in noise (the
knn_bruteforce nine-round +/-40% band that needed a three-way
adjudication to clear, r10 verdict item 3). This tool materializes a
local sf1 (~6M-row lineitem) so the bench can carry a once-per-round
sf1 leg whose per-query sf1/sf0.1 ratios grade the PLAN (scale-linear
ops sit near 10x; fixed-size fixture pipelines near 1x), not the
overhead.

Construction: pure key-offset replication, REPLICAS copies of every
fact/dim row with each table's surrogate keys offset by
replica_index * stride, stride = max(source key) + 1, applied
consistently on BOTH sides of every FK edge — so referential integrity,
key density, join fan-outs and value distributions all survive the
scale-up exactly. region/nation stay fixed (dimensions don't grow with
data volume); dates/timestamps keep their ranges so a time-window
predicate selects 10x the rows, like real x10 growth at constant
history length. Text/embedding payloads replicate verbatim, which makes
every document/vector a REPLICAS-way exact duplicate — deliberately: it
gives the dedup/similarity queries true duplicates to find at scale.

Values are fully deterministic (no randomness, no clock); the on-disk
file layout is not byte-stable (round-robin repartition) and does not
need to be — sf1 is a bench-only, local-only, gitignored dataset with
no oracle gate. Big tables are written as multi-file directories so the
scan parallelism resembles a real deployment's many-file layout instead
of a single-file two-split read.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPLICAS = 10
DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/root/repo/.testdata/sf1"
MARKER = "_SF1_MANIFEST.json"

# (key columns to offset, output file count) per table. File counts are
# sized so the largest table lands ~32 splittable files (one wave on
# local[32]) and small tables don't shatter into empty-file overhead.
TABLE_SPEC: dict[str, tuple[tuple[str, ...], int]] = {
    "region": ((), 1),
    "nation": ((), 1),
    "customer": (("c_custkey",), 8),
    "supplier": (("s_suppkey",), 2),
    "part": (("p_partkey",), 8),
    "orders": (("o_orderkey", "o_custkey"), 16),
    "lineitem": (("l_orderkey", "l_partkey", "l_suppkey"), 32),
    "events": (("event_id", "user_id"), 16),
    "documents": (("doc_id",), 8),
    "embeddings": (("vec_id",), 4),
}

# FK edges share the referenced table's stride: offsetting o_custkey by
# customer's stride keeps every replicated order pointing at the SAME
# replica's customer.
STRIDE_SOURCE: dict[str, tuple[str, str]] = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _replicate(df: DataFrame, strides: dict[str, int], n: int) -> DataFrame:
    """n copies of df with every stride-listed key offset per replica."""
    rep = df.select(
        *df.columns, F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_rep")
    )
    cols = [
        (F.col(c) + F.col("_rep").cast("long") * F.lit(strides[c])).alias(c)
        if c in strides
        else F.col(c)
        for c in df.columns
    ]
    return rep.select(*cols)


def ensure_sf1(
    spark: SparkSession | None = None,
    src: str = DEFAULT_SRC,
    out: str | None = None,
    replicas: int = REPLICAS,
) -> str:
    """Generate (once) and return the sf1 directory. Idempotent: a manifest
    written LAST marks a complete generation; a torn previous attempt (no
    manifest) is regenerated from scratch."""
    out = out or os.environ.get("SPARK_GRAFT_SF1_DIR", DEFAULT_OUT)
    marker = pathlib.Path(out, MARKER)
    if marker.exists():
        return out
    own_session = spark is None
    if own_session:
        from n5_dask_spark.session import get_spark

        spark = get_spark("n5ds-gen-sf1")
    from n5_dask_spark.catalog import load_table

    os.makedirs(out, exist_ok=True)
    manifest: dict[str, dict] = {"replicas": replicas, "src": src, "tables": {}}
    # pass 1: strides from source maxes (one tiny agg per keyed table)
    strides: dict[str, int] = {}
    for key, (table, col) in STRIDE_SOURCE.items():
        cache_key = (table, col)
        if cache_key not in strides:
            mx = load_table(spark, src, table).agg(F.max(col)).collect()[0][0]
            strides[cache_key] = int(mx) + 1
        strides[key] = strides[cache_key]
    # pass 2: replicate + write
    for table, (keys, files) in TABLE_SPEC.items():
        df = load_table(spark, src, table)
        if keys:
            df = _replicate(df, {k: strides[k] for k in keys}, replicas)
        (
            df.repartition(files)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{table}.parquet"))
        )
        manifest["tables"][table] = {
            "files": files,
            "keys": {k: strides[k] for k in keys},
        }
    marker.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    print(ensure_sf1())
