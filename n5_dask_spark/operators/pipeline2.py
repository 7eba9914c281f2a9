"""Training-data pipeline operators, part 2: deterministic dataset
splitting, sequence packing, and text scrubbing — the remaining plumbing a
100 TB corpus pipeline needs between cleaning and tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.operators.dedup import DUCK_TOKENS, SPARK_N_TOKENS
from n5_dask_spark.registry import register

PACK_BUDGET = 512  # tokens per packed sequence


@register(
    "pipeline_train_val_split",
    oracle="""
    WITH split AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) < 14
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM split GROUP BY split, lang ORDER BY split, lang
    """,
    doc=(
        "Deterministic train/val split: first md5 nibble of the doc id "
        "buckets 16 ways (14 train / 2 val = 87.5/12.5). Hash-based splits "
        "are stable under reprocessing and resharding — the property random "
        "splits lack at scale."
    ),
)
def pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    nibble = F.expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1")
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.when(nibble < 14, "train").otherwise("val").alias("split"),
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("split", "lang")
    )


N_PACK_SHARDS = 8  # packing shards: running sums never cross a shard


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) % {N_PACK_SHARDS} AS shard,
             CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT shard, doc_id, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // {PACK_BUDGET} AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT shard, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
    doc=(
        "Sequence packing: docs are hash-sharded (md5 nibble — deterministic "
        "and engine-portable), then a per-shard running token count assigns "
        "each doc to the pack where its window starts (greedy first-fit in "
        "doc order within the shard). The window is PARTITIONED: no global "
        "single-task sort exists at any scale; shards pack independently "
        "exactly as a 1000-executor run would."
    ),
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    shard = (
        F.expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1")
        .cast("bigint")
        % N_PACK_SHARDS
    )
    toks = t["documents"].select(
        shard.alias("shard"),
        "doc_id",
        F.expr(SPARK_N_TOKENS).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.select(
        "shard",
        "doc_id",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


@register(
    "text_pii_scrub",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g')) AS scrubbed_hash,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
    doc=(
        "PII scrubbing plumbing: email/phone patterns replaced with "
        "placeholder tokens (regexp_replace, JVM-side); output hashed so the "
        "whole scrubbed text is oracle-checked without shipping it."
    ),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>"),
        "[0-9]{3}[- ][0-9]{4}",
        "<PHONE>",
    )
    return (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.md5(scrubbed).alias("scrubbed_hash"),
            (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).cast("int").alias("n_digits"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_outlier_filter",
    oracle="""
    WITH med AS (
      SELECT lang, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
      FROM documents GROUP BY lang
    ), mad AS (
      SELECT d.lang, m.med,
             quantile_cont(abs(CAST(d.n_chars AS DOUBLE) - m.med), 0.5) AS mad
      FROM documents d JOIN med m ON d.lang = m.lang
      GROUP BY d.lang, m.med
    ), flagged AS (
      SELECT d.lang, d.n_chars,
             abs(0.6745 * (CAST(d.n_chars AS DOUBLE) - s.med) / s.mad) > 3.5 AS is_outlier
      FROM documents d JOIN mad s ON d.lang = s.lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN is_outlier THEN 0 ELSE n_chars END) AS BIGINT) AS kept_chars
    FROM flagged GROUP BY lang ORDER BY lang
    """,
    doc=(
        "Robust outlier gate (corpus length-quality filter): per-stratum "
        "median + MAD, modified z-score 0.6745*(x-med)/MAD, drop |z|>3.5 "
        "(Iglewicz-Hoaglin). Median/MAD are per-group scalars joined back "
        "broadcast — two tiny aggregates, one fact pass; robust statistics "
        "because at corpus scale a handful of 100 MB documents drags a "
        "mean/stddev gate into uselessness."
    ),
)
def pipeline_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "lang", F.col("n_chars").cast("double").alias("x"), "n_chars"
    )
    med = docs.groupBy("lang").agg(F.expr("percentile(x, 0.5)").alias("med"))
    mad = (
        docs.join(F.broadcast(med), "lang")
        .groupBy("lang", "med")
        .agg(F.expr("percentile(abs(x - med), 0.5)").alias("mad"))
    )
    # try_divide, NOT `/`: a stratum where >=50% of docs share one length
    # has MAD = 0, and ANSI double division would crash the job on it.
    # DuckDB's x/0 yields NULL there -> NULL > 3.5 is NULL -> counted as
    # not-outlier; try_divide reproduces that exact convention.
    flagged = docs.join(F.broadcast(mad), "lang").select(
        "lang",
        "n_chars",
        (
            F.abs(F.try_divide(F.lit(0.6745) * (F.col("x") - F.col("med")), F.col("mad")))
            > 3.5
        ).alias("is_outlier"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.sum(F.when(F.col("is_outlier"), 0).otherwise(F.col("n_chars")))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_corpus_e2e",
    oracle="""
    WITH gated AS (
      SELECT doc_id, lang, text, n_chars FROM documents
      WHERE n_chars BETWEEN 120 AND 2000
    ), deduped AS (
      SELECT * FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ), sampled AS (
      SELECT doc_id, lang, n_chars FROM deduped
      WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':e2e'), 1, 1) < 'c'
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM sampled GROUP BY lang ORDER BY lang
    """,
    doc=(
        "End-to-end corpus build as ONE declarative plan: length-quality "
        "gate (scan-local filter) -> exact content dedup (single hash "
        "shuffle on md5(text), keep min doc_id) -> deterministic 75% "
        "hash sample (scan-local) -> per-stratum budget stats. Catalyst "
        "fuses the gate and sample into the scan and the dedup window "
        "into one exchange — the whole pipeline is two shuffles "
        "regardless of corpus size."
    ),
)
def pipeline_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    gated = docs.filter(F.col("n_chars").between(120, 2000))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
    )
    sampled = deduped.filter(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":e2e"))), 1, 1)
        < F.lit("c")
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("lang")
    )
