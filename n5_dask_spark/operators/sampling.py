"""Reproducible sampling operators for training-data pipelines.

Random sampling (``df.sample``/``TABLESAMPLE``) is non-deterministic
across engines, runs and partitionings — useless for auditable corpus
construction. These operators use the standard at-scale alternative:
HASH-based sampling, where membership is a pure function of the row key.
md5 is uniform, stable everywhere, and both engines compute it
identically, so every query is hash-checked against DuckDB exactly.

- sample_stratified_hash: per-stratum rates via a lexicographic threshold
  on an md5 prefix — the reproducible analog of ``sampleBy``. One scan,
  no shuffle before the filter; at 100 TB the filter is scan-local and
  the sample never materializes the rejected rows.
- sample_pergroup_topk_hash: exactly k rows per group, chosen by hash
  rank — the reproducible analog of per-group reservoir sampling.
  Partitioned window, no global sort.
- agg_approx_quantiles: approx_percentile sketches vs the exact
  percentiles, emitted as within-tolerance booleans (the sketch values
  themselves are engine-specific, the guarantee is not — same pattern as
  agg_approx_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register

# per-language keep-rates as 4-hex-digit thresholds: P(md5 prefix < 't') =
# int(t, 16) / 65536. Pure string comparison -> engine-identical.
_RATES = {"en": "2000", "es": "4000", "de": "8000", "fr": "4000"}
_DEFAULT_RATE = "1000"

_THRESHOLD_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _RATES.items())
    + f" ELSE '{_DEFAULT_RATE}' END"
)


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4)
          < ({_THRESHOLD_CASE})
    ORDER BY doc_id
    """,
    doc=(
        "Deterministic stratified sampling: keep a doc iff the first 4 hex "
        "digits of md5(doc_id ':' lang) fall below the stratum's "
        "threshold (12.5% en, 25% es/fr, 50% de, 6.25% otherwise). "
        "Membership is a pure row function: reproducible across engines, "
        "runs, partitionings — and scan-local at any scale."
    ),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    h = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))), 1, 4)
    return (
        t["documents"]
        .filter(h < F.expr(_THRESHOLD_CASE))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "sample_pergroup_topk_hash",
    oracle="""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '#res'), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    ORDER BY lang, rk
    """,
    doc=(
        "Reproducible per-group fixed-size sample (reservoir analog): rank "
        "rows inside each stratum by a salted md5 of the key and keep the "
        "first 20. Hash order is uniform, so this IS a uniform k-sample, "
        "but deterministic. Partitioned window only — no global sort, no "
        "driver-side state."
    ),
)
def sample_pergroup_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-phase exact top-k: a window partitioned ONLY by lang would give
    # one task per stratum (5 giant partitions at corpus scale). Phase 1
    # ranks within (lang, salt-of-hash) — 32 sub-partitions per stratum —
    # and keeps k per sub-partition; the true per-stratum top-k is a
    # subset of those k*32 survivors, so phase 2's per-lang window ranks
    # only <= 640 candidate rows per stratum. Output identical to the
    # single-window formulation (the oracle).
    t = load_tables(spark, sf_dir, ("documents",))
    k = 20
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#res")))
    docs = t["documents"].select(
        "lang", "doc_id", h.alias("hk"), F.pmod(F.xxhash64(h), F.lit(32)).alias("salt")
    )
    w1 = Window.partitionBy("lang", "salt").orderBy("hk", "doc_id")
    survivors = docs.select(
        "lang", "doc_id", "hk", F.row_number().over(w1).alias("prk")
    ).filter(F.col("prk") <= k)
    w2 = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        survivors.select("lang", "doc_id", "hk", F.row_number().over(w2).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


@register(
    "agg_approx_quantiles",
    # The within-tol booleans are robust across sf_dirs, not pinned to the
    # test scales: approx_percentile(accuracy=10000) guarantees rank error
    # <= n/10000 — a scale-invariant FRACTION of rows — and a 1e-4 rank
    # shift over l_extendedprice's broad distribution moves the value far
    # less than the 1% tolerance at any sf. The oracle asserts TRUE.
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) + 0.0 AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) + 0.0 AS exact_p95,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc=(
        "approx_percentile (Greenwald-Khanna sketch) checked against the "
        "exact interpolated percentiles: emits within-1%-tolerance "
        "booleans, hash-comparable across engines even though sketch "
        "outputs are not. Spark's exact `percentile` and DuckDB's "
        "quantile_cont share the (n-1)*q interpolation definition."
    ),
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
            F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
        )
        .select(
            "l_returnflag",
            F.round("e50", 6).alias("exact_p50"),
            F.round("e95", 6).alias("exact_p95"),
            (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= 0.01).alias("p50_within_tol"),
            (F.abs(F.col("a95") - F.col("e95")) / F.col("e95") <= 0.01).alias("p95_within_tol"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram_numeric",
    oracle="""
    SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
                WHEN l_extendedprice >= 2000.0 THEN 23
                ELSE CAST(FLOOR((l_extendedprice - 900.0) / 50.0) AS INT) + 1 END AS bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(l_extendedprice), 6) + 0.0 AS lo,
           ROUND(MAX(l_extendedprice), 6) + 0.0 AS hi
    FROM lineitem GROUP BY bucket ORDER BY bucket
    """,
    doc=(
        "Equi-width histogram (22 buckets of width 50 over [900, 2000), "
        "SQL:2016 width_bucket semantics spelled out arithmetically: "
        "below-range -> 0, above -> n+1): one map-side-combined groupBy "
        "over the fact table, the building block of every distribution "
        "profile / sketch validation at scale."
    ),
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .select(
            F.expr(
                "CASE WHEN l_extendedprice < 900.0D THEN 0"
                " WHEN l_extendedprice >= 2000.0D THEN 23"
                " ELSE CAST(FLOOR((l_extendedprice - 900.0D) / 50.0D) AS INT) + 1 END"
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("l_extendedprice"), 6).alias("lo"),
            F.round(F.max("l_extendedprice"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )
