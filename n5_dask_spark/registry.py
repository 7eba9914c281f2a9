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
    # --- round 5 policy (VERDICT r4 #6): (a) everything NEW or CHANGED
    # this round, (b) the four bench-flagged queries + the two r4 codec
    # roundtrips, (c) the three multi-job pipelines under drift watch,
    # then (d) fill with the OLDEST banked greens — all 38 queries whose
    # last driver-green row is round 1, plus the oldest r2 query — so the
    # stalest families re-prove first. After r5, nothing's last green
    # predates r2.
    # (a) new/changed in r5
    "n5_region_export_zprofile",  # NEW: distributed slab export (S4 at scale)
    "n5_roundtrip_blosc",  # blosc codec gained split-layout + blosclz decode
    "streaming_incremental_restart",  # restart replay check relaxed (ADVICE)
    # (b) bench-flagged + r4 codecs
    "q1_pricing_summary",  # flagship; r4 bench artifact to re-prove
    "q3_shipping_priority",
    "text_tf_top_terms",
    "multimodal_feature_extract",
    "n5_roundtrip_lz4",
    # (c) drift-watch pipelines
    "tiff_roundtrip_zprofile",
    "dedup_connected_clusters",
    "dedup_cc_star",
    # (d) oldest banked greens: every last-green-in-r1 query (38)
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q4_order_priority",
    "join_inner",
    "join_left_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_range_nonequi",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    "set_union_all",
    "set_intersect",
    "set_except",
    "distinct_pairs",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_case_when",
    "orderby_limit_topk",
    "window_rank_dense",
    "window_lag_lead",
    "window_running_sum",
    "topk_per_group",
    "window_first_last",
    "events_json_extract",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_sessionization_funnel",
    "dedup_subset_key",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_near_duplicates",
    "text_token_stats",
    # ...and the oldest r2 green to round out 50
    "scalar_math_funcs",
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
