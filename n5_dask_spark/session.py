"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB target, tested on local[32]):
- AQE on: runtime partition coalescing + skew-join splitting replaces any
  hand-tuned shuffle sizing at scale.
- Arrow on: every pandas UDF / toPandas crosses the JVM<->Python boundary in
  columnar batches, not rows.
- autoBroadcastJoinThreshold raised to 64 MB: at any scale factor the TPC-H
  dimension tables (region/nation/part/supplier/customer) stay far below
  this, so dim joins never shuffle the fact table.
- session timezone pinned to UTC so timestamp semantics are independent of
  the host and match a naive-timestamp oracle (DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _default_shuffle_partitions() -> str:
    """Scale-adaptive shuffle width (r14, guide §2.2/§2.5).

    A constant tuned to local core count is a cluster bug: 32 reduce
    partitions on a 512-core deployment serializes every shuffle 16x.
    Resolution order:
    - SPARK_GRAFT_SHUFFLE_PARTITIONS: explicit production override.
    - max(32, $SPARK_GRAFT_CPUS): on the local harness (cpus <= 32) this
      is exactly the historical 32, keeping the driver's bench and its
      lower-core scaling runs comparable; a larger deployment gets at
      least one reduce slot per core.
    The DOWNWARD direction — fewer, larger partitions when the data is
    small — is AQE partition coalescing (enabled below), which is the
    mechanism that actually adapts to input size at runtime; this value
    is only the pre-coalesce ceiling.

    r15 (ADVICE): evaluated LAZILY by get_spark/tune_session — not frozen
    at module import — so env vars set after importing this module still
    take effect; the explicit override is validated like the CPUS path
    (a non-numeric/zero value falls through to the derived default
    instead of propagating garbage into spark.sql.shuffle.partitions).
    """
    explicit = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "")
    if explicit.isdigit() and int(explicit) > 0:
        return explicit
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    return str(max(32, int(cpus))) if cpus.isdigit() else "32"


def _bloom_threshold_overrides() -> dict[str, str]:
    """Runtime Bloom-filter join thresholds, env-parameterized (r15,
    guide §3.2; VERDICT r14 item 5).

    Measured this round (plans/r15/bloom_synthetic_sf1_fired.txt): Spark
    4.1's automatic runtime Bloom filter is estimate-driven, and without
    CBO stats a FILTERED dimension's size estimate is its full scan size —
    so the default 10 MB creationSideThreshold suppresses injection for
    every TPC-H-shaped dim join at any real scale (verified: q3/q5/q10
    plans carry no might_contain at sf1 even with the application-side
    threshold lowered; raising creationSideThreshold makes it fire, and
    the injected filter ran 1.5x faster than the bare sort-merge join on
    the sf1 forced-SMJ probe). Locally there is nothing to win — the
    bench fact scans sit far below the 10 GiB application-side threshold
    and the dims broadcast — so LOCAL DEFAULTS STAY SPARK'S (bench
    comparable); a production deployment opts in per its own sizes:
      SPARK_GRAFT_BLOOM_CREATION_THRESHOLD   (e.g. "512m": admit
        unfiltered-estimate dims as creation side)
      SPARK_GRAFT_BLOOM_APPLICATION_THRESHOLD (e.g. "1g": inject for
        smaller fact scans than the 10 GiB default)
    """
    out: dict[str, str] = {}
    for env, conf in (
        ("SPARK_GRAFT_BLOOM_CREATION_THRESHOLD",
         "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
        ("SPARK_GRAFT_BLOOM_APPLICATION_THRESHOLD",
         "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
    ):
        v = os.environ.get(env)
        if v:
            out[conf] = v
    return out


DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": _default_shuffle_partitions(),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # wide-row memory bound, JVM->Python direction (r11 Arrow probe): Spark
    # 4.1's 64 MB default, pinned so a deployment default change can't
    # reopen the lane; the Python->JVM direction is bounded in-kernel by
    # udfbatch.bounded_frames (same 64 MB)
    "spark.sql.execution.arrow.maxBytesPerBatch": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Verify parquet page CRCs on read (r12 corruption probe). parquet-mr —
    # and therefore every Spark-written file — stores a CRC32 per page by
    # default, but Spark never CHECKS it: the probe measured ALL 64
    # payload-byte bit flips of a CRC-bearing file decoding to silently
    # wrong values with this off, and all 64 refusing loudly with it on.
    # Bitrot is a certainty at 100-TB scale; the cost is one CRC32 per
    # page on files that carry checksums, and a no-op on files that don't
    # (e.g. pyarrow's default write_page_checksum=False — the driver's
    # testdata pays nothing). Session-conf keys without a spark. prefix
    # are merged into the per-plan Hadoop conf, so this applies to every
    # parquet scan. Footer/statistics bytes have no CRC — a flipped stats
    # byte can still silently prune a filtered read (measured: 6 offsets)
    # — so store-level integrity remains the fleet answer for metadata.
    "parquet.page.verify-checksum.enabled": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # progress surface (SURVEY §2.A X2): the Spark UI is opt-in so headless
    # harness runs stay port-free; SPARK_GRAFT_UI=1/true/yes/on enables it,
    # and every registry query labels its jobs via setJobDescription
    # (registry.py). Normalized here — Spark's boolean conf parser throws
    # on anything other than literal true/false.
    "spark.ui.enabled": (
        "true"
        if os.environ.get("SPARK_GRAFT_UI", "").strip().lower() in ("1", "true", "yes", "on")
        else "false"
    ),
    # static conf: bucketed-table tests and any saveAsTable land in /tmp,
    # never in the repo working tree
    "spark.sql.warehouse.dir": os.path.join(
        __import__("tempfile").gettempdir(), "n5ds-warehouse"
    ),
}


def get_spark(
    app_name: str = "n5_dask_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession on local[cpus].

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or '*'. ``extra_conf`` entries are
    applied to the BUILDER (so static confs work) and override defaults.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    # shuffle width re-derived here (not at module import) so env vars set
    # after importing this module are honored (r15 ADVICE)
    merged = {
        **DEFAULT_CONFS,
        "spark.sql.shuffle.partitions": _default_shuffle_partitions(),
        **_bloom_threshold_overrides(),
        **(extra_conf or {}),
    }
    # spark-submit's launcher warns-and-IGNORES builder configs without a
    # spark. prefix (e.g. the parquet verify-checksum key, which is a
    # Hadoop/Parquet property merged from the SESSION conf at plan time) —
    # those keys must go through spark.conf.set after the session exists
    runtime_only = {k: v for k, v in merged.items() if not k.startswith("spark.")}
    for k, v in merged.items():
        if k not in runtime_only:
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    for k, v in runtime_only.items():
        spark.conf.set(k, v)
    return spark


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Pandas-UDF closures defined in this package are cloudpickled BY REFERENCE
    (module + qualname); if the driver process imported us via a sys.path
    hack (as __spark_entry__ does), executor workers can't resolve the import
    unless the package is distributed. Idempotent per session.
    """
    if getattr(spark, "_n5ds_pyfile_added", False):
        return
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    zip_path = pathlib.Path(tempfile.gettempdir()) / f"n5_dask_spark_pkg_{os.getpid()}.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, "n5_dask_spark/" + str(p.relative_to(pkg_dir)))
    spark.sparkContext.addPyFile(str(zip_path))
    spark._n5ds_pyfile_added = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session.

    The driver hands us its own SparkSession; these confs are all
    runtime-mutable so correctness-critical settings (UTC timestamps,
    Arrow batching) hold regardless of who built the session.
    """
    # keys the user set explicitly (cli --conf records them on the session):
    # TUNING defaults must not stomp those — re-applying ours on every
    # table load would silently revert the user's --conf. Determinism
    # confs (UTC timestamps, Arrow batching) always apply regardless.
    user = getattr(spark, "_n5ds_user_confs", frozenset())
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
    ):
        try:
            spark.conf.set(k, DEFAULT_CONFS[k])
        except Exception:
            pass  # conf not runtime-settable in this deployment: keep going
    tuning = {
        k: DEFAULT_CONFS[k]
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.execution.arrow.maxBytesPerBatch",
            "parquet.page.verify-checksum.enabled",
        )
    }
    # re-derived lazily, same reason as in get_spark (r15 ADVICE)
    tuning["spark.sql.shuffle.partitions"] = _default_shuffle_partitions()
    tuning.update(_bloom_threshold_overrides())
    for k, v in tuning.items():
        if k in user:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not runtime-settable in this deployment: keep going
    try:
        ensure_package_on_executors(spark)
    except Exception:
        pass  # e.g. session without a real SparkContext; UDF queries will surface it
    return spark
