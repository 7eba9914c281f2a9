"""TF-IDF and salted-join patterns.

text_tfidf_top_terms completes the text-analysis family (SURVEY.md §2.B:
HashingTF/IDF row) with exact arithmetic: tf from the token explode, idf =
ln((N+1)/(df+1)) + 1 (smoothed), both engines computing the identical
formula; scores rounded to 6dp before ranking with tiebreakers.

join_salted demonstrates the skew-mitigation pattern the 100 TB design
calls for (SURVEY.md §2.B joins row): the hot side's key is salted into
SALT_BUCKETS sub-keys and the small side is replicated per salt value, so
one hot key spreads over SALT_BUCKETS tasks. Results are identical to the
unsalted join (the oracle is the plain join), which is exactly the point —
salting is a physical rewrite, not a semantic one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables, widen
from n5_dask_spark.operators._exact import dsum
from n5_dask_spark.operators.dedup import DUCK_TOKENS, SPARK_N_TOKENS, SPARK_TOKENS, nul_escape
from n5_dask_spark.registry import register

SALT_BUCKETS = 8


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST({DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM tf) GROUP BY tok
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, {nul_escape("tok")}) AS rk
      FROM scored
    )
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tfidf
    FROM ranked WHERE rk <= 3 AND doc_id < 50
    ORDER BY doc_id, rk
    """,
    doc="TF-IDF: tf explode + df aggregate + smoothed idf join; per-doc top-3 terms.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("documents",))
    docs = widen(t["documents"])
    tf = (
        docs.select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # (doc_id, tok) is already unique after the tf groupBy — no distinct pass
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # n_docs stays IN the plan (broadcast 1-row aggregate, the oracle's
    # CROSS JOIN n shape): an eager .count() here would launch a full scan
    # job at DataFrame-construction time — even for explain-only callers —
    # and scan documents once more than the query needs
    n = t["documents"].agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
            ).alias("tfidf"),
        )
    )
    # NUL-escaped tok tiebreak: DuckDB's sort comparator ties 'x' with
    # 'x\x00' (see dedup.nul_escape) — identity on NUL-free corpora
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.expr(nul_escape("tok")))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "rk", "tok", "tfidf")
        .orderBy("doc_id", "rk")
    )


@register(
    "join_salted",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc=(
        "Skew-salted join: fact keys get a deterministic salt (pmod of a "
        "hash), the dimension side is replicated across all salt values, the "
        "join key becomes (key, salt). Same result as the plain join (the "
        "oracle) — salting only changes the physical key distribution."
    ),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)).cast("int")
    )
    salts = spark.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("osalt"))
    orders_rep = t["orders"].crossJoin(F.broadcast(salts))
    return (
        li.join(
            orders_rep,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("salt") == F.col("osalt")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_extendedprice", "sum_price"))
        .orderBy("o_orderpriority")
    )


# GPT-2-style pre-tokenizer, simplified to the alternations both regex
# engines (Java util.regex / RE2) share: contraction suffixes, optional-
# space word runs, optional-space digit runs, optional-space punctuation
# runs, space runs. No lookaround (RE2 has none).
BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


@register(
    "text_bpe_pretokenize",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS INT)
             AS n_bpe_tokens,
           CAST(len({DUCK_TOKENS}) AS INT) AS n_ws_tokens,
           ROUND(CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS DOUBLE)
                 / len({DUCK_TOKENS}), 6) AS bpe_per_ws
    FROM documents ORDER BY doc_id
    """,
    doc=(
        "BPE-ish pre-tokenization count (the GPT-2 pattern minus "
        "lookaround): contraction suffixes, space-prefixed word/digit/"
        "punctuation runs. The per-doc BPE-vs-whitespace token ratio is "
        "the standard tokens-per-word cost estimate for corpus budgeting."
    ),
)
def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
    n_ws = F.expr(SPARK_N_TOKENS)
    return (
        t["documents"]
        .select(
            "doc_id",
            n_bpe.cast("int").alias("n_bpe_tokens"),
            n_ws.cast("int").alias("n_ws_tokens"),
            F.round(n_bpe.cast("double") / n_ws, 6).alias("bpe_per_ws"),
        )
        .orderBy("doc_id")
    )
