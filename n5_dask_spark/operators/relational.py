"""Relational operator coverage (SURVEY.md §2.B): every join type, set ops,
aggregation variants (distinct / approx / rollup / cube / grouping sets),
scalar string/date/math/conditional functions, non-equi range join, as-of
join.

The reference has none of these (SURVEY.md §0); each registers a DuckDB
oracle so the driver's t2 gate hash-checks it.

Scale notes: only CONSTANT-cardinality sides (region/nation, literal
bands, 1-row aggregates) carry broadcast hints — F.broadcast ignores the
size threshold, so a hint on an SF-scaling dim (customer/supplier/part) or
a fact would OOM executors at 100 TB; those joins are left to AQE, which
still broadcasts them at small scale via autoBroadcastJoinThreshold. The
as-of join is the join+window pattern (at 100 TB it would be a
range-bucketed join — the window dedup stays per-key and AQE handles
skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register

# ---------------------------------------------------------------------------
# Join types
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    ORDER BY o_orderkey
    """,
    doc="Inner equi-join; AQE broadcasts the dim when it is small.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 400000)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    doc="Left outer join with join-side predicate (nulls preserved).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey, n_cust, n_supp
    FROM cn FULL JOIN sn ON cn.nk = sn.nk
    ORDER BY nationkey
    """,
    doc="Full outer join of two aggregates.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("snk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cn.join(sn, cn.nk == sn.snk, "full")
        .select(F.coalesce("nk", "snk").alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS): customers with at least one pending order.",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    pend = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(pend, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY from_region, to_region
    """,
    doc="Cross join of a tiny table with itself (5x5).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("region",))
    a = t["region"].select(F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region"))
    b = t["region"].select(F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region"))
    return (
        a.crossJoin(b)
        .filter(F.col("ak") != F.col("bk"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "join_range_nonequi",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM part p
    JOIN (VALUES ('budget', 900.0, 933.0), ('mid', 933.0, 966.0), ('premium', 966.0, 1000.0))
         AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
    doc="Non-equi (range/theta) join: price-band bucketing via broadcast nested loop.",
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    bands = spark.createDataFrame(
        [("budget", 900.0, 933.0), ("mid", 933.0, 966.0), ("premium", 966.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        t["part"]
        .join(F.broadcast(bands), (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), dsum("p_retailprice", "sum_price"))
        .orderBy("band")
    )


@register(
    "join_asof",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_orderdate
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL) e
    ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    ORDER BY e.event_id
    """,
    doc=(
        "As-of join: latest order at-or-before each purchase event. Spark has "
        "no ASOF primitive; implemented scale-linearly as union + last_value: "
        "tag both inputs, union on (key, ts), and a running "
        "last(order_cols, ignorenulls) over (key, ts, tag) carries each "
        "order forward to every later event of the same user. Zero joins, "
        "one sort exchange, and — unlike the equi+range-join + row_number "
        "formulation — never materializes the event x per-user-order-dates "
        "expansion, so a power user with years of history costs O(rows), "
        "not O(events x order dates). Orders pre-deduped per (custkey, "
        "orderdate) so ties are deterministic on both engines; orders sort "
        "before events at equal timestamps (tag 0 < 1), matching the >= "
        "(inclusive) asof bound; events with no prior order drop, matching "
        "the inner ASOF JOIN oracle. NULL event timestamps drop too (the "
        "SQL reading: NULL >= x is never true) — a bare DuckDB ASOF JOIN "
        "would instead match them to the user's latest order, a NULLS-LAST "
        "sort artifact, so the registered oracle filters ts IS NOT NULL to "
        "encode the pinned drop semantics explicitly; the boundary is also "
        "pinned by the randomized-ties fuzz in tests/test_oracle_parity.py."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "events"))
    # ts_cmp is the shared timeline: events.ts is TIMESTAMP_NTZ, o_orderdate
    # TIMESTAMP(LTZ); Spark's mixed comparison coerces NTZ -> LTZ via the
    # session zone, so casting ts the same way makes the union ordering
    # bit-identical to the old `ts >= o_orderdate` predicate, ties included.
    # Order columns travel as ONE nullable struct so the window evaluates a
    # single running last() (two scalar last() frames measured ~12% slower
    # at sf0.1); the struct is NULL — not struct(NULL, NULL) — on event
    # rows so ignorenulls skips them.
    od = (
        t["orders"]
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts_cmp"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            F.struct("o_orderkey", "o_orderdate").alias("ord"),
        )
    )
    ev = t["events"].filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts_cmp"),
        F.lit(1).alias("tag"),
        "event_id",
        "ts",
        F.lit(None)
        .cast("struct<o_orderkey:bigint,o_orderdate:timestamp>")
        .alias("ord"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_cmp", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        od.unionByName(ev)
        .select(
            "tag",
            "event_id",
            "user_id",
            "ts",
            F.last("ord", ignorenulls=True).over(w).alias("o"),
        )
        .filter((F.col("tag") == 1) & F.col("o").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o.o_orderkey").alias("o_orderkey"),
            # surfaced-timestamp convention (registry notes): collect()
            # renders LTZ through the PYTHON PROCESS timezone
            # (datetime.fromtimestamp), NTZ timezone-independently — this
            # was the one LTZ leak among all registered outputs (r9
            # process-TZ gate). Identity under the tuned UTC session zone.
            F.col("o.o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="COUNT(DISTINCT) — expand-based distinct aggregation.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals with GROUPING id.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT Spark's native .rollup(): its Expand+grouped-agg plan drops the
    # () grouping set's grand-total row when the input is EMPTY (zero rows
    # where the standard — and DuckDB/Postgres/Trino — return one row with
    # NULL groups and COUNT 0; found by the r11 empty-input parity sweep).
    # Standard semantics by construction: the non-() sets via GROUPING
    # SETS, the () set as a separate GLOBAL aggregate union leg — a global
    # agg always yields exactly one row. Cost: one extra column-pruned,
    # map-side-combined pass over the fact table (the () slice of the
    # Expand disappears, so the expand multiplier drops 3x -> 2x).
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    aggs = (F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    levels = o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        *aggs,
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast("int").alias("gid"),
    )
    grand = o.agg(*aggs).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n_orders",
        "sum_price",
        F.lit(3).cast("int").alias("gid"),
    )
    return levels.unionByName(grand).orderBy(
        F.col("gid"),
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE over two low-cardinality dims.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT Spark's native .cube() — same empty-input grand-total fix as
    # agg_rollup above: non-() sets via GROUPING SETS, () as a global-agg
    # union leg (one row even on empty input, per the SQL standard).
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    levels = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int").alias("gid"),
    )
    grand = li.agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "n_rows",
        F.lit(3).cast("int").alias("gid"),
    )
    return levels.unionByName(grand).orderBy(
        F.col("gid"),
        F.col("l_returnflag").asc_nulls_first(),
        F.col("l_linestatus").asc_nulls_first(),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (via Spark SQL).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Statistical aggregates (stddev/variance rounded: order-dependent).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Set operations / distinct
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT nk, kind FROM (
      SELECT c_nationkey AS nk, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nk, 'supplier' AS kind FROM supplier
    ) ORDER BY kind, nk
    """,
    doc="UNION ALL of two projections.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(F.col("c_nationkey").alias("nk"), F.lit("customer").alias("kind"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nk"), F.lit("supplier").alias("kind"))
    return a.unionByName(b).orderBy("kind", "nk")


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nk
    """,
    doc="INTERSECT (distinct semantics).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(F.col("c_nationkey").alias("nk"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nk"))
    return a.intersect(b).orderBy("nk")


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'P'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY ck
    """,
    doc="EXCEPT: customers with pending but no finished orders (duplicate-heavy left side).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    a = t["orders"].filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("ck"))
    b = t["orders"].filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("ck"))
    # subtract == EXCEPT DISTINCT: drops EVERY left row whose value appears
    # in b (exceptAll(b.distinct()) would only remove one occurrence each —
    # and this left side genuinely has duplicates)
    return a.subtract(b).orderBy("ck")


@register(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="DISTINCT projection (dropDuplicates).",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REGEXP_EXTRACT(p_brand, '[0-9]+', 0) AS brand_num,
           p_type || '/' || p_brand AS type_brand,
           REPLACE(p_type, 'E', '*') AS type_repl
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
    doc=(
        "String functions: upper/substring/length/regexp_extract/concat/"
        "replace. ASCII-scoped contract for UPPER (differential fuzzing, "
        "tests/test_dedup_cap.py): Java uppercases 'ß' to 'SS' where "
        "DuckDB gives 'ẞ' — identical on the ASCII p_brand here; substring"
        "/length are codepoint-based on BOTH engines and fully portable."
    ),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("int").alias("name_len"),
            F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
            # oracle spells `||`, not CONCAT(): DuckDB's CONCAT is
            # NULL-skipping where Spark's (and ||) propagate NULL — a
            # NULL p_type must yield NULL type_brand on both engines
            # (TPC-H NULL-row probe find).
            F.concat(F.col("p_type"), F.lit("/"), F.col("p_brand")).alias("type_brand"),
            F.replace(F.col("p_type"), F.lit("E"), F.lit("*")).alias("type_repl"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS order_dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY AS due_date
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
    doc=(
        "Date/time functions: extract, date_trunc, interval arithmetic. "
        "due_date is cast to TIMESTAMP on BOTH engines before the interval "
        "add: on a DATE-typed column Spark's date + INTERVAL stays DATE "
        "while DuckDB's promotes to TIMESTAMP (type-tagged hash flip) — "
        "the driver corpus stores o_orderdate as timestamp[us] so the old "
        "form was green only by corpus luck (r9 extreme-date probe). "
        "Values agree on any proleptic-Gregorian date incl. year 1 and "
        "the 1582 cutover week (probe-pinned in test_oracle_parity)."
    ),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    # DuckDB dow: Sunday=0. Spark dayofweek: Sunday=1 -> subtract 1.
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
            (F.col("o_orderdate").cast("timestamp_ntz") + F.expr("INTERVAL 90 DAY")).alias(
                "due_date"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT s_suppkey,
           ABS(s_acctbal) + 0.0 AS abs_bal,
           CASE WHEN ABS(s_acctbal) >= 4503599627370496.0 THEN s_acctbal
                ELSE ROUND(s_acctbal, 1) + 0.0 END AS round_bal,
           FLOOR(s_acctbal) + 0.0 AS floor_bal,
           CEIL(s_acctbal) + 0.0 AS ceil_bal,
           CASE WHEN ABS(s_acctbal) >= 100000000.0 THEN SQRT(ABS(s_acctbal) + 0.0)
                ELSE ROUND(SQRT(ABS(s_acctbal) + 0.0), 6) + 0.0 END AS sqrt_bal,
           ROUND(LN(ABS(s_acctbal) + 1), 6) AS ln_bal,
           CAST(s_suppkey % 7 AS BIGINT) AS mod7
    FROM supplier ORDER BY s_suppkey
    """,
    doc="Math functions (transcendentals rounded to 6dp: libm may differ by 1 ulp).",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier",))

    def _int_part(rounder):
        # Spark's floor/ceil(double) return BIGINT and SILENTLY CLAMP to
        # +/-Long.MAX at |x| >= 2^63 (even under ANSI) while DuckDB's
        # double-returning FLOOR/CEIL keep the true value — a silent hash
        # flip on extreme magnitudes. Every double at |x| >= 2^63 > 2^52 is
        # already integral, so floor(x) = ceil(x) = x there: guard the
        # builtin to the representable range and pass the value through
        # beyond it. Engine-equal for ALL finite doubles (probe-pinned in
        # tests/test_oracle_parity.py).
        c = F.col("s_acctbal")
        return F.when(F.abs(c) >= F.lit(9.223372036854775808e18), c).otherwise(
            rounder(c).cast("double")
        )

    # ROUND(double, s) is engine-equal only while |x|*10^s stays inside
    # double precision: DuckDB rounds via nearbyint(x*10^s)/10^s, which
    # loses ulps once x*10^s > 2^53, while Spark's BigDecimal path is
    # exact (probe: ROUND(9223372036854774784.0, 1) diverged). Every
    # double at |x| >= 2^52 is integral, so round-to-decimals is the
    # identity there — both sides pass the value through (same CASE in
    # the oracle). The sub-2^52 shortest-repr-vs-binary lane stays the
    # documented ROUND boundary (registry determinism notes).
    bal = F.col("s_acctbal")
    round_bal = F.when(F.abs(bal) >= F.lit(4503599627370496.0), bal).otherwise(
        F.round(bal, 1)
    )

    # sqrt itself is IEEE correctly-rounded — bit-exact across engines with
    # NO tolerance needed. The ROUND-to-6dp wrapper (there for symmetry
    # with ln's libm tolerance) is what DIVERGES once sqrt's ulp nears the
    # 6th decimal (probe: bal = 9.2e18 -> sqrt = 3e9, x*1e6 at ulp 0.5 —
    # BigDecimal half-up vs nearbyint ties-to-even). Past |bal| >= 1e8 the
    # raw sqrt is surfaced unrounded; below it sqrt < 1e4 keeps the
    # boundary-hit probability at the measure-zero level of the documented
    # ROUND contract. ln(|x|+1) <= 709 at any double, so its 6dp wrapper
    # is safe everywhere.
    sqrt_bal = F.when(F.abs(bal) >= F.lit(1e8), F.sqrt(F.abs(bal))).otherwise(
        F.round(F.sqrt(F.abs(bal)), 6)
    )

    return (
        t["supplier"]
        .select(
            "s_suppkey",
            F.abs("s_acctbal").alias("abs_bal"),
            round_bal.alias("round_bal"),
            # Cast to double: Spark floor/ceil return BIGINT while DuckDB's
            # FLOOR/CEIL(double) return DOUBLE — the driver hash is type-aware.
            _int_part(F.floor).alias("floor_bal"),
            _int_part(F.ceil).alias("ceil_bal"),
            sqrt_bal.alias("sqrt_bal"),
            F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 6).alias("ln_bal"),
            (F.col("s_suppkey") % 7).cast("bigint").alias("mod7"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "scalar_case_when",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           CASE c_mktsegment WHEN 'BUILDING' THEN 1 ELSE 0 END AS is_building
    FROM customer ORDER BY c_custkey
    """,
    doc="CASE WHEN conditional logic (searched + simple form).",
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .when(F.col("c_acctbal") < 9000, "mid")
            .otherwise("high")
            .alias("bal_bucket"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("is_building"),
        )
        .orderBy("c_custkey")
    )


@register(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject (no full sort).",
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )
