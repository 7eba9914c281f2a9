"""Star-contraction connected components (the 100-TB-scale dedup clusterer).

``dedup_connected_clusters`` (relational2.py) runs plain min-label
propagation: simple, but its iteration count is the component DIAMETER —
fine for shallow near-dup clusters, wrong for deep chains. This module
implements the alternating large-star / small-star contraction of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14),
whose round count is O(log² n) REGARDLESS of diameter — the algorithm the
propagation docstring names as its at-scale replacement, here made real
and driver-verified against the same recursive-CTE oracle.

Shape per round: each star step is ONE groupBy(u) shuffle + an in-group
columnar emit (collect_set -> higher-order-function transform -> explode);
no joins anywhere. Neighbor lists concentrate onto component minima as the
graph contracts — that concentration is the algorithm's mechanism (hub
formation), bounded by component size, and the reason the round count is
logarithmic. localCheckpoint truncates per-round lineage exactly as the
propagation loop does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.registry import register
from n5_dask_spark.operators.dedup import DUCK_MINHASH_PAIRS as _DUCK_MINHASH_PAIRS
from n5_dask_spark.operators.relational2 import _CC_ORACLE_TAIL

# large-star, columnar: from u's full neighbor set, connect every LARGER
# neighbor to min(N(u) ∪ {u}).
_LARGE_STAR = (
    "transform(filter(vs, x -> x > u),"
    " x -> named_struct('nu', x, 'nv', least(u, array_min(vs))))"
)
# small-star on a larger->smaller directed edge set: connect u and all its
# (smaller) targets to the minimum of the group.
_SMALL_STAR = (
    "transform(filter(array_union(vs, array(u)), x -> x != array_min(vs)),"
    " x -> named_struct('nu', x, 'nv', array_min(vs)))"
)


def _star_round(edges: DataFrame, expr: str) -> DataFrame:
    return (
        edges.groupBy("u")
        .agg(F.collect_set("v").alias("vs"))
        .select(F.explode(F.expr(expr)).alias("e"))
        .select(F.col("e.nu").alias("u"), F.col("e.nv").alias("v"))
        .distinct()
    )


def connected_components_star(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(u, v) undirected edge list -> (node, component) with component =
    min node id of the component. Nodes not on any edge are absent, as in
    the propagation variant."""
    # canonical directed form: larger -> smaller. Materialized up front:
    # the bidirectional union below references it twice per round, which
    # would otherwise re-evaluate the (possibly expensive) upstream edge
    # computation — e.g. the whole MinHash pipeline — once per branch.
    cur = (
        edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = None
    prev_count = -1  # r14: carry the count forward — prev is already
    # materialized (localCheckpoint), so recounting it each round was a
    # whole redundant job per iteration
    for _ in range(max_rounds):
        bidir = cur.unionByName(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        large = _star_round(bidir, _LARGE_STAR)
        small = _star_round(large, _SMALL_STAR).localCheckpoint()
        small_count = small.count()
        # fixpoint probe on materialized partitions: equal cardinality plus
        # empty one-sided difference == set equality (both sides distinct)
        if (
            prev is not None
            and small_count == prev_count
            and small.exceptAll(prev).limit(1).count() == 0
        ):
            cur = small
            break
        prev, prev_count, cur = small, small_count, small
    else:
        raise RuntimeError(f"cc_star did not converge in {max_rounds} rounds")
    return (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(cur.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


@register(
    "dedup_cc_star",
    # identical cluster semantics to dedup_connected_clusters -> same
    # composed oracle (dedup.DUCK_MINHASH_PAIRS pair graph + the shared
    # recursive-CTE tail from relational2)
    oracle="WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ("
    + _DUCK_MINHASH_PAIRS
    + ")" + _CC_ORACLE_TAIL,
    doc=(
        "Connected components via alternating large-star/small-star "
        "contraction (Kiveris et al.): O(log² n) rounds independent of "
        "component diameter, each round one groupBy shuffle with columnar "
        "in-group edge emission — the at-scale replacement for label "
        "propagation, verified against the same recursive-CTE oracle as "
        "dedup_connected_clusters."
    ),
)
def dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the UNSORTED pair helper (r14): the registered query's presentation
    # orderBy is a range exchange + sampling pass that the CC shuffles
    # below would immediately destroy; the pair SET is identical
    from n5_dask_spark.operators.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(spark, sf_dir)
    labels = connected_components_star(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint").alias("cluster_id")
    ).orderBy("doc_id")
