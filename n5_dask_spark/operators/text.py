"""Text analysis operators over ``documents`` (driver-mandated LLM-pipeline
surface; no reference counterpart — SURVEY.md §2.B).

- text_token_stats:   token counting (whitespace + regex word tokens)
- text_langid:        n-gram/stopword-heuristic language ID
- text_quality_score: length/punctuation/stopword-ratio quality scoring
- text_fingerprint:   canonical fingerprint (sorted distinct tokens -> md5),
                      the OpenRefine-style clustering key
- text_tf_top_terms:  per-source term frequency top-k (tokenize -> explode ->
                      count -> window top-k), the TF building block of TF-IDF

All deterministic string/integer arithmetic -> every query oracle-checked.

Scale: tokenize+explode is the one cardinality-expanding step (~50x rows);
it stays JVM-side (split/explode are codegen'd), aggregates immediately
(map-side partial agg), and never shuffles raw text — only (token, count)
pairs. At 100 TB that is the standard shape for corpus statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators.dedup import (
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_tokens_over,
    nul_escape,
    spark_tokens_over,
)
from n5_dask_spark.registry import register

# Stopword lists per language for the heuristic language ID / quality score.
STOP_EN = ("the", "a", "of", "and", "to")
STOP_ES = ("el", "la", "de", "y", "que")
STOP_FR = ("le", "la", "de", "et", "que")
STOP_DE = ("der", "die", "das", "und", "zu")


def _count_in_sql(tokens_expr: str, words: tuple[str, ...]) -> str:
    """SQL fragment counting how many tokens are in `words` (works in both
    engines: filter on the token array, then size/len)."""
    lst = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({tokens_expr}, t -> t IN ({lst})))"


def _count_in_duck(tokens_expr: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_expr}, t -> t IN ({lst})))"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({DUCK_TOKENS}) AS INT) AS n_tokens,
           CAST(len(list_distinct({DUCK_TOKENS})) AS INT) AS n_unique_tokens,
           CAST(length(text) AS INT) AS n_chars_actual,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INT) AS n_word_tokens,
           ROUND(CAST(length(text) AS DOUBLE) / len({DUCK_TOKENS}), 6) AS chars_per_token
    FROM documents ORDER BY doc_id
    """,
    doc="Token counting: whitespace tokens, distinct tokens, regex word tokens.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    toks = F.expr(SPARK_TOKENS)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.size(toks).cast("int").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("int").alias("n_unique_tokens"),
            F.length("text").cast("int").alias("n_chars_actual"),
            F.size(F.expr("regexp_extract_all(text, '[a-zA-Z]+', 0)")).cast("int").alias("n_word_tokens"),
            F.round(F.length("text").cast("double") / F.size(toks), 6).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


_LANG_SCORE_SPARK = {
    "en": _count_in_sql(SPARK_TOKENS, STOP_EN),
    "es": _count_in_sql(SPARK_TOKENS, STOP_ES),
    "de": _count_in_sql(SPARK_TOKENS, STOP_DE),
}
_LANG_SCORE_DUCK = {
    "en": _count_in_duck(DUCK_TOKENS, STOP_EN),
    "es": _count_in_duck(DUCK_TOKENS, STOP_ES),
    "de": _count_in_duck(DUCK_TOKENS, STOP_DE),
}


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN {_LANG_SCORE_DUCK['en']} >= {_LANG_SCORE_DUCK['es']}
              AND {_LANG_SCORE_DUCK['en']} >= {_LANG_SCORE_DUCK['de']} THEN 'en'
             WHEN {_LANG_SCORE_DUCK['es']} >= {_LANG_SCORE_DUCK['de']} THEN 'es'
             ELSE 'de'
           END AS predicted_lang,
           CAST({_LANG_SCORE_DUCK['en']} AS INT) AS en_hits,
           CAST({_LANG_SCORE_DUCK['es']} AS INT) AS es_hits,
           CAST({_LANG_SCORE_DUCK['de']} AS INT) AS de_hits
    FROM documents ORDER BY doc_id
    """,
    doc="Heuristic stopword-vote language ID (deterministic tie order en>es>de).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    en, es, de = (F.expr(_LANG_SCORE_SPARK[k]) for k in ("en", "es", "de"))
    return (
        t["documents"]
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            F.when((en >= es) & (en >= de), "en").when(es >= de, "es").otherwise("de").alias("predicted_lang"),
            en.cast("int").alias("en_hits"),
            es.cast("int").alias("es_hits"),
            de.cast("int").alias("de_hits"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({DUCK_TOKENS}) AS INT) AS n_tokens,
             CAST(length(text) AS INT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS INT) AS n_punct,
             CAST({_count_in_duck(DUCK_TOKENS, STOP_EN + STOP_ES + STOP_DE + STOP_FR)} AS INT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_chars, n_punct, n_stop,
           ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           CASE WHEN n_tokens BETWEEN 10 AND 1000
                 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
                THEN 1 ELSE 0 END AS passes_quality
    FROM m ORDER BY doc_id
    """,
    doc="Quality scoring: length, punctuation ratio, stopword ratio, pass flag.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    toks = F.expr(SPARK_TOKENS)
    n_tokens = F.size(toks).cast("int")
    n_chars = F.length("text").cast("int")
    n_punct = (F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))).cast("int")
    n_stop = F.expr(_count_in_sql(SPARK_TOKENS, STOP_EN + STOP_ES + STOP_DE + STOP_FR)).cast("int")
    m = t["documents"].select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
    )
    # try_divide, NOT `/`: under ANSI mode (Spark 4 default) a plain divide
    # THROWS on n_chars = 0, so one empty document crashes the whole query
    # at corpus scale. DuckDB's double division yields NULL there, and
    # try_divide matches it exactly (found by the random-corpus fuzz —
    # the driver tables happen to contain no empty text).
    punct_ratio = F.try_divide(F.col("n_punct").cast("double"), F.col("n_chars"))
    stop_ratio = F.try_divide(F.col("n_stop").cast("double"), F.col("n_tokens"))
    return (
        m.select(
            "doc_id",
            "n_tokens",
            "n_chars",
            "n_punct",
            "n_stop",
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(stop_ratio, 6).alias("stop_ratio"),
            F.when(
                (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000) & (punct_ratio < 0.1), 1
            )
            .otherwise(0)
            .alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


# Fingerprint tokens are drawn from NUL-ESCAPED text (nul_escape: identity
# on the driver corpus and any \x00/\x01-free string): DuckDB v1.0.0's
# list_sort comparator ties 'x' with 'x\x00' (NUL-terminated sort keys,
# order falls back to input order) while Spark's array_sort compares full
# bytes, so sorting RAW tokens diverges the joined canonical string on any
# document with an embedded NUL (r9 NUL-byte probe; pinned in
# tests/test_oracle_parity.py). Escaped tokens are NUL-free — both engines
# sort them binary-identically — and the escape is injective per token, so
# fingerprint equality still means token-set equality.
_FP_SPARK_TOKENS = spark_tokens_over(nul_escape("text"))
_FP_DUCK_TOKENS = duck_tokens_over(nul_escape("text"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT md5(array_to_string(list_sort(list_distinct({_FP_DUCK_TOKENS})), ' ')) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    ORDER BY fingerprint
    """,
    doc=(
        "Document fingerprint: md5 of sorted distinct NUL-escaped tokens "
        "(word-order- and repetition-insensitive canonical key), grouped for "
        "dedup clustering."
    ),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(F.expr(_FP_SPARK_TOKENS))), " "))
    return (
        t["documents"]
        .groupBy(fp.alias("fingerprint"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("fingerprint")
    )


@register(
    "text_tf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, COUNT(*) AS freq
      FROM (SELECT source, UNNEST({DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY source, tok
    ), ranked AS (
      SELECT source, tok, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, {nul_escape("tok")}) AS rk
      FROM tf
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, tok, freq
    FROM ranked WHERE rk <= 5
    ORDER BY source, rk
    """,
    doc=(
        "Per-source top-5 terms by frequency (tokenize->explode->count->topk). "
        "The tok tiebreak ranks the NUL-ESCAPED token (identity on NUL-free "
        "corpora): DuckDB's sort comparator ties 'x' with 'x\\x00' where "
        "Spark compares full bytes, so a raw-token tiebreak could surface "
        "different rows at the top-5 boundary on NUL-bearing text."
    ),
)
def text_tf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    tf = (
        t["documents"]
        .select("source", F.explode(F.expr(SPARK_TOKENS)).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.expr(nul_escape("tok")))
    return (
        tf.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("source", "rk", "tok", "freq")
        .orderBy("source", "rk")
    )
