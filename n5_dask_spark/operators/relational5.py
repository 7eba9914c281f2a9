"""Round-2 tail additions: bitwise scalar functions and per-dimension
embedding statistics (SURVEY.md §2.B scalar-functions + similarity rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.registry import register


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey << 2 AS BIGINT) AS shifted_up,
           CAST(o_orderkey >> 3 AS BIGINT) AS shifted_down,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
    doc=(
        "Bitwise scalar surface: and/or/xor/shifts/popcount — the ops "
        "hash-partitioners, bloom filters, and bitmask flags are built from."
    ),
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return (
        t["orders"]
        .filter(k <= 500)
        .select(
            "o_orderkey",
            k.bitwiseAND(255).cast("bigint").alias("low_byte"),
            k.bitwiseOR(4096).cast("bigint").alias("with_flag"),
            k.bitwiseXOR(c).cast("bigint").alias("key_xor"),
            F.expr("shiftleft(o_orderkey, 2)").cast("bigint").alias("shifted_up"),
            F.expr("shiftright(o_orderkey, 3)").cast("bigint").alias("shifted_down"),
            F.bit_count(k).cast("int").alias("popcount"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "embedding_dimension_stats",
    oracle="""
    WITH ex AS (
      -- linear flat form, not the lateral `UNNEST(range) .. embedding[i]`:
      -- the lateral duplicates the whole embedding LIST per generated row,
      -- O(dim^2) per vector (10x slower already at 2048 dims; see
      -- dedup.DUCK_SHINGLES for the same class on token lists).
      SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    SELECT dim,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(ROUND(v, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_val,
           ROUND(MIN(v), 6) + 0.0 AS min_val,
           ROUND(MAX(v), 6) + 0.0 AS max_val
    FROM ex WHERE isfinite(v) GROUP BY dim ORDER BY dim
    """,
    doc=(
        "Per-dimension corpus statistics over the embedding column "
        "(posexplode): the drift/collapse monitor a production embedding "
        "pipeline runs per batch. Elements rounded to 6dp then summed as "
        "exact decimals (float32 -> double promotion is exact; the "
        "order-independent decimal sum keeps both engines bit-identical); "
        "mean = exact sum / count in double. Stats run over FINITE "
        "elements only (r9 probe: a single NaN element crashed DuckDB's "
        "decimal cast while Spark kept aggregating — the finite filter is "
        "the engine-agreed convention for malformed embedder output; "
        "n_vecs counts finite contributions per dim)."
    ),
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = widen(t["embeddings"])
    exploded = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),  # WITH ORDINALITY is 1-based
            F.col("v").cast("double").alias("v"),
        )
        .filter("NOT isnan(v) AND abs(v) <> CAST('Infinity' AS DOUBLE)")
    )
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum(F.round("v", 6).cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)))
            .alias("mean_val"),
            F.round(F.min("v"), 6).alias("min_val"),
            F.round(F.max("v"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )


@register(
    "join_range_binned",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey,
             CAST(900 + o_orderkey % 1100 AS DOUBLE) - 2.0 AS lo,
             CAST(900 + o_orderkey % 1100 AS DOUBLE) + 2.0 AS hi
      FROM orders
    )
    SELECT CAST(iv.o_orderkey % 50 AS INT) AS ivbucket,
           COUNT(*) AS n_matches,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM iv JOIN part p ON p.p_retailprice >= iv.lo AND p.p_retailprice < iv.hi
    GROUP BY ivbucket ORDER BY ivbucket
    """,
    doc=(
        "LARGE-large interval join via bin bucketing: a pure range join "
        "(no equi key) between fact-derived intervals and points is a "
        "cross product to the planner. Binning makes it an EQUI join: "
        "intervals replicate to each width-16 bin they overlap "
        "(explode(sequence(floor(lo/W), floor(hi/W)))), points key to "
        "their single bin, and the bin equi-join + residual range filter "
        "meets each true pair exactly once (at the point's bin) — no "
        "dedup pass. Both sides shuffle-partition on the bin: O(n/bins) "
        "per task instead of O(n^2) total."
    ),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "part"))
    W = 16
    iv = (
        t["orders"]
        .select(
            "o_orderkey",
            (F.lit(900.0) + (F.col("o_orderkey") % 1100).cast("double") - 2.0).alias("lo"),
            (F.lit(900.0) + (F.col("o_orderkey") % 1100).cast("double") + 2.0).alias("hi"),
        )
        .select(
            "o_orderkey",
            "lo",
            "hi",
            F.explode(
                F.expr(f"sequence(CAST(floor(lo / {W}) AS INT), CAST(floor(hi / {W}) AS INT))")
            ).alias("bin"),
        )
    )
    pts = t["part"].select(
        "p_retailprice", F.expr(f"CAST(floor(p_retailprice / {W}) AS INT)").alias("bin")
    )
    return (
        iv.join(pts, "bin")
        .filter((F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")))
        .groupBy((F.col("o_orderkey") % 50).cast("int").alias("ivbucket"))
        .agg(F.count(F.lit(1)).alias("n_matches"), dsum("p_retailprice", "sum_price"))
        .orderBy("ivbucket")
    )


@register(
    "scalar_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-'
               || CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'ref=([0-9]+)', 1) AS ref_param
    FROM u ORDER BY doc_id
    """,
    doc=(
        "URL parsing via engine-portable regexp_extract (host, path, "
        "query param) over deterministically synthesized URLs — the "
        "log-scrubbing scalar surface. Pure projection, codegen'd; no "
        "Python, no shuffle beyond the output sort."
    ),
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("lang"),
        F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?ref="), (F.col("doc_id") % 7).cast("string"),
    )
    return (
        t["documents"]
        .filter(F.col("doc_id") < 300)
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"),
            F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1).alias("path"),
            F.regexp_extract("url", r"ref=([0-9]+)", 1).alias("ref_param"),
        )
        .orderBy("doc_id")
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS k
      FROM documents WHERE doc_id < 250
    ), b AS (
      SELECT doc_id AS b_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS k
      FROM documents WHERE doc_id < 250
    )
    SELECT COALESCE(a.k, '<null>') AS k, COUNT(*) AS n_pairs,
           CAST(SUM(a.doc_id + b.b_id) AS BIGINT) AS id_sum
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k ORDER BY k
    """,
    doc=(
        "Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT FROM): "
        "NULL keys match each other instead of silently dropping — the "
        "semantics CDC/merge pipelines need for nullable business keys. "
        "Still a hash-partitionable equi-join (NULL is just another key "
        "value), unlike OR-based null workarounds that degrade to "
        "nested-loop plans."
    ),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    base = t["documents"].filter(F.col("doc_id") < 250)
    a = base.select(
        "doc_id", F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("lang")).alias("k")
    )
    b = base.select(
        F.col("doc_id").alias("b_id"),
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang")).alias("k2"),
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k2"]))
        .groupBy(F.coalesce(a["k"], F.lit("<null>")).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("doc_id") + F.col("b_id")).cast("bigint").alias("id_sum"),
        )
        .orderBy("k")
    )
