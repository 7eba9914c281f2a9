"""UDF / UDAF / UDTF surface (SURVEY.md §2.B UDF row; the reference's only
analog is ad-hoc map_blocks fns, §2.A T5).

- pandas_udf (vectorized scalar): z-score of order totals — Arrow-batched,
  numpy math; deterministic (mean/std passed in as exact literals would be
  ideal, here computed decimal-exact in a prior job).
- spark.udf.register + SQL: classify() usable from a SQL string.
- Python UDTF (Spark 4): explodes an order into (fee-band, amount) rows.

Each registers an oracle with the same deterministic arithmetic, so the
whole Python execution path is hash-checked against DuckDB.

Scale: pandas_udf and UDTFs stream Arrow batches; the per-batch Python cost
amortizes. Row-at-a-time F.udf is deliberately absent from the hot path —
register() exists to prove the SQL-integration surface, not for bulk use.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from n5_dask_spark.catalog import load_tables
from n5_dask_spark.registry import register


def _round_half_away(s: "pd.Series", digits: int = 6) -> "pd.Series":
    """Round half AWAY from zero, matching SQL ROUND on both engines.
    pandas/numpy .round() is half-to-even: np.round(2.5e-6, 6) = 2e-6 but
    DuckDB (and Spark F.round) give 3e-6 — an exact-tie input would flip
    the driver's value hash. Same trick as the stateful streaming
    accumulator: shift, floor(abs + 0.5), unshift."""
    import numpy as np

    scale = 10.0**digits
    v = s.to_numpy() * scale
    # + 0.0: an input in (-0.5*10^-digits, 0) yields sign * 0 = -0.0 here;
    # surfaced rounded doubles are negative-zero-normalized on both engines
    # (registry determinism notes, r9 negative-zero probe), and numpy's
    # -0.0 + 0.0 = +0.0 is the same normalization the oracles spell.
    return pd.Series(np.sign(v) * np.floor(np.abs(v) + 0.5) / scale + 0.0, index=s.index)



@register(
    "udf_pandas_zscore",
    oracle="""
    WITH stats AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu,
             ROUND(STDDEV_SAMP(o_totalprice), 6) AS sigma
      FROM orders
    )
    SELECT o_orderkey,
           ROUND((o_totalprice - mu) / sigma, 6) + 0.0 AS zscore
    FROM orders, stats
    ORDER BY o_orderkey
    """,
    doc="Vectorized pandas UDF: z-score of order totals (Arrow-batched numpy).",
)
def udf_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    orders = t["orders"]
    # exact decimal mean; stddev rounded identically on both sides
    row = orders.agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)").alias("mu"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sigma"),
    ).collect()[0]
    if row["mu"] is None or row["sigma"] is None:
        # mu is NULL on an empty table (or all-NULL totals); sigma is NULL
        # on a SINGLE-row table too (stddev_samp's n-1 = 0) — all legal
        # corpora where float(None) crashed the job (r9 empty-table
        # probe). The oracle's per-row arithmetic against a NULL stat is
        # NULL, so the engine-equal answer is a NULL zscore per row.
        return orders.select(
            "o_orderkey", F.lit(None).cast("double").alias("zscore")
        ).orderBy("o_orderkey")
    mu, sigma = float(row["mu"]), float(row["sigma"])

    @pandas_udf(DoubleType())
    def zscore(total: pd.Series) -> pd.Series:
        return _round_half_away((total - mu) / sigma)

    return orders.select("o_orderkey", zscore("o_totalprice").alias("zscore")).orderBy("o_orderkey")


@register(
    "udf_sql_registered",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'S'
                WHEN o_totalprice < 300000 THEN 'M'
                ELSE 'L' END AS size_class
    FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
    """,
    doc="spark.udf.register: python fn callable from SQL text (the SQL-extension surface).",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))

    def classify(total: float | None) -> str:
        # total is NULLABLE: one NULL price must not kill the job (the
        # NULL-row probe found the bare comparison raising TypeError in
        # every executor). The reference semantic is the oracle's SQL
        # CASE, whose ELSE catches the NULL comparisons — mirror it.
        if total is None:
            return "L"
        return "S" if total < 100000 else ("M" if total < 300000 else "L")

    spark.udf.register("order_size_class", classify, StringType())
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, order_size_class(o_totalprice) AS size_class
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
        """
    )


@register(
    "udtf_fee_schedule",
    oracle="""
    WITH bands AS (
      SELECT o_orderkey, o_totalprice,
             UNNEST(['base', 'volume', 'premium']) AS fee_band
      FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey, fee_band,
           ROUND(CASE fee_band
             WHEN 'base' THEN o_totalprice * 0.01
             WHEN 'volume' THEN GREATEST(o_totalprice - 200000, 0) * 0.005
             ELSE GREATEST(o_totalprice - 400000, 0) * 0.0025 END, 6) AS fee
    FROM bands
    ORDER BY o_orderkey, fee_band
    """,
    doc="Python UDTF (Spark 4): one input row -> three fee-band rows, lateral join.",
)
def udtf_fee_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="fee_band string, fee double")
    class FeeSchedule:
        def eval(self, total: float | None):
            # NULLABLE input: one dirty row must not kill the job (the
            # NULL-row probe found the bare multiply raising TypeError in
            # every executor). The reference semantic is the oracle's SQL:
            # base = NULL * 0.01 -> NULL, but volume/premium go through
            # GREATEST(NULL, 0), which BOTH engines evaluate NULL-skipping
            # to 0 (Spark and DuckDB agree; the SQL standard leaves it
            # vendor-defined) -> fee 0.0. Mirror that exactly.
            if total is None:
                yield "base", None
                yield "volume", 0.0
                yield "premium", 0.0
                return
            yield "base", round(total * 0.01, 6)
            yield "volume", round(max(total - 200000, 0.0) * 0.005, 6)
            yield "premium", round(max(total - 400000, 0.0) * 0.0025, 6)

    spark.udtf.register("fee_schedule", FeeSchedule)
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    # r14 optimization (guide §4: the optimizer cannot see through the
    # Python boundary): with the WHERE outside, Catalyst left the filter
    # ABOVE BatchEvalPythonUDTF — the row-at-a-time UDTF evaluated every
    # orders row (150k at sf0.1, measured 5.4 s; the whole fact at scale)
    # and 99.9% of its output was then discarded. Filtering in a subquery
    # before the lateral join pushes the predicate to the parquet scan
    # (PushedFilters: o_orderkey <= 200) and the UDTF sees exactly the
    # 200 surviving rows. Results identical: the predicate references
    # only the left side's key.
    return spark.sql(
        """
        SELECT o_orderkey, f.fee_band, f.fee
        FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 200) o,
             LATERAL fee_schedule(o_totalprice) f
        ORDER BY o_orderkey, fee_band
        """
    )


@register(
    "udaf_applyinpandas_minmax_scale",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ROUND(CASE WHEN mx = mn THEN 0.5 ELSE (c_acctbal - mn) / (mx - mn) END, 6) AS scaled_bal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
             MAX(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
      FROM customer
    )
    ORDER BY c_mktsegment, c_custkey
    """,
    doc=(
        "applyInPandas grouped transform: per-segment min-max scaling — the "
        "custom-UDAF shape (group in JVM, batch to Python, full-group numpy)."
    ),
)
def udaf_applyinpandas_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        scaled = pd.Series(0.5, index=pdf.index) if mx == mn else (pdf["c_acctbal"] - mn) / (mx - mn)
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "scaled_bal": _round_half_away(scaled),
            }
        )

    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .applyInPandas(scale, schema="c_mktsegment string, c_custkey long, scaled_bal double")
        .orderBy("c_mktsegment", "c_custkey")
    )
