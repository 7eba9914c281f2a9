"""Central query registry: the contract between operator modules and the
driver harness (``__spark_entry__.py``).

Every operator from SURVEY.md §2 that is demonstrable as a query registers
itself here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation), and
- optionally an ANSI-SQL oracle string DuckDB can run over the same parquet
  tables (the correctness gate). Queries with no SQL-expressible semantics
  (e.g. N5 array pipelines) register ``oracle=None`` and get a weaker
  rows-only check.

Determinism discipline (so value-hashes match the oracle EXACTLY):
- Float SUM/AVG go through decimal-exact aggregation: the addends are cast
  to DECIMAL(18,6), summed exactly, and the final value cast back to DOUBLE.
  Both engines then produce bit-identical doubles (see ``dsum``/``davg``).
- Transcendental / similarity outputs are rounded to 6 decimals before any
  ranking or output, and all rankings carry a total-order tiebreaker key.
- Every computed column is aliased identically on both sides (the driver
  sorts columns by name before hashing).
- Window ORDER BY keys must be NON-NULLABLE (all current ones are): the
  engines default null ordering differently (Spark ASC = NULLS FIRST,
  DuckDB = NULLS LAST), so a rank over a nullable key would silently
  diverge; spell NULLS FIRST/LAST on both sides if one is ever needed.
- ROUND(double, s) boundary (characterized r8, never observed in a
  query): Spark rounds the double's SHORTEST DECIMAL REPR (HALF_UP on
  what java.math.BigDecimal.valueOf reads), DuckDB the BINARY value —
  they disagree exactly when a double's shortest repr terminates in a
  "...5" at scale s+1 while the binary value sits just below/above it
  (round(-2.445, 2): Spark -2.45, DuckDB -2.44; probe-pinned in
  tests/test_dedup_cap.py). Computed doubles (sums/ratios/sqrt) have
  ~17-digit reprs and essentially never terminate on such a boundary —
  8 rounds of driver hash gates and 30+ fuzz-net seeds never hit it —
  and decimal-exact aggregation (dsum/davg) sidesteps it for the money
  columns. Treat any future hash flip on a ROUND(...) column as this
  boundary first.
- Cross-engine string-function scope (differential-fuzzed in
  tests/test_dedup_cap.py): tokenization lowering is ASCII-translate
  (fully portable); upper()/levenshtein() agree only on ASCII inputs
  (Java vs utf8proc case mapping; codepoints vs bytes) — fine for the
  ASCII driver tables, documented per query where used.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# The external driver grades only the FIRST 50 entries of ``queries()``
# (round-1 CORRECTNESS stopped at position 50). This list pins the window
# explicitly; everything not listed keeps registration order after it.
# Rotation policy since every query went green (r4): each round the window
# takes (a) queries NEW or CHANGED that round, (b) anything the bench
# flagged, (c) multi-job pipelines under drift watch, then fills with the
# queries whose last driver-green row is OLDEST, so no family's proof goes
# stale. Build the next rotation from CORRECTNESS_r*.json last-green ages,
# not from family coverage — cumulative coverage is already total.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- round 8 policy (VERDICT r7 #1): (a) everything CHANGED this
    # round — the try_element_at + float->double->DECIMAL centroid fix
    # (both engines' casts now route through DOUBLE), the NULL-aware
    # COSINE template, the SPARK_N_TOKENS array-free token count, the
    # session-window oracle's exact-gap boundary fix, the asof oracle's
    # explicit NULL-ts filter, and two roundtrips re-proving the
    # path-key-scoped sink guard; (b) all 21 round-4-stale greens;
    # (c) fill with round-5-stale greens, one per family first. After r8,
    # no query's last green predates round 5.
    # (a) changed in r8
    "join_asof",  # oracle now encodes the NULL-ts drop explicitly
    "array_label_centroids",  # try_element_at + double-hop decimal cast
    "knn_ivf_probe",  # same centroid conventions
    "knn_bruteforce_cosine",  # NULL-propagating COSINE template
    "embedding_near_duplicates",  # same template
    "pipeline_sequence_packing",  # SPARK_N_TOKENS + drift re-baseline
    "pipeline_clean_corpus",  # SPARK_N_TOKENS
    "pipeline_corpus_e2e",  # composes the clean-corpus stage
    "text_bpe_pretokenize",  # SPARK_N_TOKENS denominator (also r4-stale)
    "streaming_session_window",  # oracle exact-gap boundary fix (fuzz find)
    "n5_roundtrip_zprofile",  # sink guard now counts the path key
    "tiff_roundtrip_zprofile",  # same guard, ndim<3 import path
    # (b) the 20 remaining round-4-stale greens
    "agg_approx_quantiles",
    "agg_histogram_numeric",
    "decontaminate_ngram_overlap",
    "dedup_exact",
    "embedding_quantize_int8",
    "formats_partitioned_pruning",
    "join_bucketed_colocated",
    "join_null_safe_eq",
    "join_range_binned",
    "knn_signbucket_lsh",
    "multimodal_audio_frame_energy",
    "n5_zprofile",
    "q6_forecast_revenue",
    "q12_late_shipment",
    "sample_pergroup_topk_hash",
    "sample_stratified_hash",
    "scalar_url_funcs",
    "udf_pandas_zscore",
    "upsert_orders_snapshot",
    "window_row_number",
    # (c) round-5-stale fill, family-spread: aggs, dedup pipelines, the
    # events/session family, join types, TPC-H anchors, scalars and the
    # streaming restart row — three slots re-taken late-r8 by the
    # multimodal queries whose oracles changed (changed-first policy);
    # join_left_anti / dedup_subset_key / window_first_last stay r5-stale
    # and lead the r9 rotation
    "agg_cube",
    "agg_grouping_sets",
    "dedup_cc_star",
    "dedup_connected_clusters",
    "dedup_ngram_jaccard",
    "multimodal_resize",  # oracle: empty doc keeps its output row (r8)
    "events_sessionization_funnel",
    "events_session_window",
    "join_full_outer",
    "join_range_nonequi",
    "multimodal_feature_extract",  # oracle: encode() + empty-payload -1 (r8)
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "scalar_date_funcs",
    "streaming_incremental_restart",
    "multimodal_metadata_stats",  # oracle: encode() byte length (r8)
)

def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkFn], SparkFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
            # progress surface (SURVEY §2.A X2): every job this query's plan
            # spawns shows up in the Spark UI / event log under its name.
            # The description is thread-local and deliberately NOT restored
            # after construction: Spark attaches it at job SUBMISSION (the
            # caller's collect()), which happens after this returns, so
            # clearing here would unlabel the very jobs being named. The
            # contract is therefore construction-adjacent execution (what the
            # driver, bench and tests all do); a caller that builds several
            # query DataFrames before collecting any sees the last label win.
            try:
                spark.sparkContext.setJobDescription(f"n5ds:{name}")
            except Exception:
                pass  # session without a live context; the query still runs
            return fn(spark, sf_dir)

        labeled.__name__ = fn.__name__
        labeled.__qualname__ = fn.__qualname__
        labeled.__doc__ = fn.__doc__
        labeled.__module__ = fn.__module__
        REGISTRY[name] = Query(
            name=name, fn=labeled, oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        # return the raw fn: in-module composition (pipelines calling other
        # query fns directly) keeps the caller's job label
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (each registers its queries) and return
    the populated registry."""
    # Imported here (not at module top) so registry.py has no heavy deps.
    from n5_dask_spark.operators import (  # noqa: F401
        tpch,
        relational,
        windows,
        events,
        dedup,
        similarity,
        text,
        multimodal,
        arrayops,
        n5ops,
        tpch_extra,
        udfs,
        relational2,
        text2,
        pipeline,
        pipeline2,
        relational3,
        n5oracle,
        tpch_extra2,
        relational4,
        formats,
        bucketed,
        multimodal2,
        relational5,
        tiffops,
        graph,
        sampling,
        embeddings,
        merge,
        decontam,
    )
    from n5_dask_spark.streaming import dedup as streaming_dedup  # noqa: F401
    from n5_dask_spark.streaming import static_join  # noqa: F401
    from n5_dask_spark.streaming import jobs, joins, stateful  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
