"""Second relational batch: pivot, listagg/collect ordering, large-large
sort-merge join, cohort retention, approximate aggregates, and iterative
connected-components clustering of near-duplicate pairs.

The clustering query is the one genuinely ITERATIVE algorithm in the engine:
a driver loop of label-propagation joins until fixpoint (Spark's analog of
the reference's driver-side pyramid level loop). The oracle is a DuckDB
recursive CTE computing the same min-label closure — so even the iterative
path is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register
from n5_dask_spark.operators.dedup import DUCK_MINHASH_PAIRS as _DUCK_MINHASH_PAIRS

# recursive-CTE clustering tail shared with graph.py's dedup_cc_star oracle
_CC_ORACLE_TAIL = """
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(u, lbl) AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
    )
    SELECT u AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
    FROM reach GROUP BY u
    ORDER BY doc_id
    """


@register(
    "pivot_segment_by_year",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS y1996,
           CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS y1997,
           CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998 THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS y1998
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="PIVOT: revenue by segment x year (explicit value list -> no extra pass).",
)
def pivot_segment_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    j = t["orders"].join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
    return (
        j.withColumn("yr", F.year("o_orderdate"))
        .groupBy("c_mktsegment")
        .pivot("yr", [1996, 1997, 1998])
        .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"))
        .select(
            "c_mktsegment",
            F.col("1996").alias("y1996"),
            F.col("1997").alias("y1997"),
            F.col("1998").alias("y1998"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "listagg_nations_per_region",
    oracle="""
    SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="listagg / ordered string aggregation (array_sort(collect_list) -> join).",
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("nation", "region"))
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


@register(
    "join_sort_merge_largelarge",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
           MAX(o_totalprice) AS o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey
    ORDER BY total_qty DESC, l_orderkey LIMIT 25
    """,
    doc=(
        "Large-large join forced to sort-merge (merge hint): the shape used "
        "when neither side fits broadcast; AQE still coalesces and handles "
        "skew. Correctness identical to the broadcast plan."
    ),
)
def join_sort_merge_largelarge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    orders = t["orders"].filter(F.col("o_orderstatus") == "F").hint("merge")
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "total_qty"),
            F.max("o_totalprice").alias("o_totalprice"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("l_orderkey"))
        .limit(25)
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(CAST(e.ts AS DATE) - f.cohort_day AS INT) // 7 AS week_no
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, CAST(week_no AS INT) AS week_no,
           COUNT(*) AS active_users
    FROM activity
    GROUP BY cohort_day, week_no
    ORDER BY cohort_day, week_no
    """,
    doc="Cohort retention: first-touch cohort day x active week buckets.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("user_id", F.col("ts").cast("date").alias("day"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        # no broadcast hint: firsts is one row per user — an aggregate over
        # the whole events fact that scales linearly with the data; AQE
        # broadcasts it when (and only when) it is actually small
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.datediff("day", "cohort_day") / 7).cast("int").alias("week_no"),
        )
        .distinct()
    )
    return (
        activity.groupBy(F.col("cohort_day").cast("timestamp_ntz").alias("cohort_day"), "week_no")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "week_no")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT ck FROM (
      SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'P'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) ORDER BY ck
    """,
    doc="INTERSECT ALL (multiset semantics: min of per-side multiplicities).",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    a = t["orders"].filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("ck"))
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ck"))
    return a.intersectAll(b).orderBy("ck")


@register(
    "set_except_all",
    oracle="""
    SELECT ck FROM (
      SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'P'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) ORDER BY ck
    """,
    doc="EXCEPT ALL (multiset difference of per-side multiplicities).",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    a = t["orders"].filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("ck"))
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ck"))
    return a.exceptAll(b).orderBy("ck")


@register(
    "scalar_map_funcs",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE o_orderstatus IS NOT NULL
      GROUP BY c_mktsegment, o_orderstatus
    )
    SELECT c_mktsegment,
           STRING_AGG(o_orderstatus || ':' || CAST(n AS VARCHAR), ',' ORDER BY o_orderstatus)
             AS status_counts,
           CAST(COUNT(*) AS INT) AS n_keys
    FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc=(
        "Map-typed column construction: per-segment status->count map via "
        "map_from_entries; emitted as sorted entry strings because map "
        "iteration order is engine-specific (maps are unhashable for the "
        "oracle gate, string form is canonical)."
    ),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    m = (
        t["orders"]
        # a map KEY cannot be NULL — Spark throws NULL_MAP_KEY in the
        # executor, so one dirty status row would kill the whole job
        # (TPC-H NULL-row probe find); both sides drop NULL statuses
        # before the map is built.
        .filter(F.col("o_orderstatus").isNotNull())
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # real map column built, then canonicalized: sorted entries -> string
    return (
        m.groupBy("c_mktsegment")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
            ).alias("status_map")
        )
        .select(
            "c_mktsegment",
            F.array_join(
                F.expr(
                    "transform(map_entries(status_map), e -> concat(e.key, ':', CAST(e.value AS STRING)))"
                ),
                ",",
            ).alias("status_counts"),
            F.size("status_map").cast("int").alias("n_keys"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "unpivot_price_metrics",
    oracle="""
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    ) WHERE p_partkey <= 100
    ORDER BY p_partkey, metric
    """,
    doc="UNPIVOT/melt: wide columns -> (metric, value) rows via df.unpivot.",
)
def unpivot_price_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 100)
        .select("p_partkey", F.col("p_retailprice").alias("retail"), F.col("p_size").cast("double").alias("size"))
        .unpivot("p_partkey", ["retail", "size"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@register(
    "agg_approx_distinct",
    # HLL sketch VALUES are engine-specific, so the hashable contract is the
    # sketch's accuracy guarantee: exact counts (computed in both engines)
    # plus a boolean asserting the Spark sketch landed within 3x rsd of exact
    # (rsd=0.02 -> 6%). 3 sigma holds at ANY sf_dir, not just the pinned test
    # scales: the sketch is deterministic per dataset, and a >3-sigma HLL++
    # miss is vanishingly rare, so the oracle asserts TRUE unconditionally.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS parts_within_tol,
           TRUE AS supps_within_tol
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc=(
        "approx_count_distinct (HyperLogLog++) checked against the exact "
        "distinct counts: emits within-3x-rsd tolerance booleans, which ARE "
        "hash-comparable across engines even though raw sketch values are not."
    ),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_suppkey").alias("exact_supps"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            (F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts") <= 0.06).alias(
                "parts_within_tol"
            ),
            (F.abs(F.col("approx_supps") - F.col("exact_supps")) / F.col("exact_supps") <= 0.06).alias(
                "supps_within_tol"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "dedup_connected_clusters",
    # composed from dedup.DUCK_MINHASH_PAIRS: same pair graph as
    # dedup_minhash_lsh by construction (no hand-inlined copy to drift)
    oracle="WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ("
    + _DUCK_MINHASH_PAIRS
    + ")" + _CC_ORACLE_TAIL,
    doc=(
        "Connected components over the near-dup pair graph: iterative "
        "min-label propagation (driver loop of joins to fixpoint) vs a "
        "DuckDB recursive CTE oracle. Docs in no pair are excluded."
    ),
)
def dedup_connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the UNSORTED pair helper (r14): the registered query's presentation
    # orderBy is a range exchange + sampling pass wasted on a localCheckpoint
    # input; the pair SET is identical
    from n5_dask_spark.operators.dedup import minhash_candidate_pairs

    # materialize the pair list BEFORE the bidirectional union: both union
    # branches reference it, and without this the whole MinHash pipeline
    # evaluates once per branch
    pairs = minhash_candidate_pairs(spark, sf_dir).localCheckpoint()
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .cache()
    )
    labels = edges.select("u").distinct().withColumn("lbl", F.col("u"))
    # min-label propagation: clusters here are tiny (near-dup groups), so a
    # handful of iterations reaches the fixpoint; each iteration is ONE job
    # (shuffle join + aggregate, materialized by the eager localCheckpoint,
    # which also truncates lineage). The old label rides along through the
    # checkpoint, so the convergence probe is a filter over already-
    # materialized partitions — no second join, no recompute per iteration.
    # At 100 TB with deep components, swap this loop for large-star/small-
    # star (Kiveris et al.) to bound the iteration count; near-dup clusters
    # are shallow so plain propagation wins here.
    while True:
        neighbor_min = (
            edges.join(labels.withColumnRenamed("u", "v2"), F.col("v") == F.col("v2"))
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("lbl") != F.col("old_lbl")).limit(1).count()
        labels = stepped.select("u", "lbl")
        if changed == 0:
            break
    edges.unpersist()  # labels are localCheckpointed; don't pin the cache
    return labels.select(F.col("u").alias("doc_id"), F.col("lbl").cast("bigint").alias("cluster_id")).orderBy(
        "doc_id"
    )
