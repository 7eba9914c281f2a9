"""Decimal-exact aggregation helpers for the DataFrame API side.

Float SUM/AVG are the one place Spark and a SQL oracle legitimately diverge
(different addition order -> different last-ulp doubles). We make both sides
exact by summing DECIMAL(18,6) casts and converting the exact decimal result
back to DOUBLE — bit-identical across engines. See registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: str, alias: str, prec: int = 18, scale: int = 6) -> Column:
    """Exact SUM of a double expression (SQL fragment), as DOUBLE."""
    return F.expr(f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE)").alias(alias)


def micro_sum(expr: str, alias: str) -> Column:
    """Exact SUM via scaled-integer accumulation: ROUND(x*1e6) summed as
    DECIMAL(38,0), then /1e6. The addends are integers so the sum is
    order-independent and identical across engines; use where the oracle
    uses the same formula (DuckDB sums the BIGINT micro-units into
    HUGEINT — also 128-bit, also exact). The accumulator is deliberately
    NOT BIGINT: a 100 TB q1 group (~1e11 rows x ~1e9 micro-units) passes
    9.2e18 and Spark's non-ANSI bigint sum would WRAP SILENTLY while the
    oracle widens — decimal accumulation is exact to 1e38 and measures at
    parity with the bigint path on the warmed q1 plan (the scan
    dominates; the old "2.5x faster" note predated plan warmup)."""
    return F.expr(
        f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS DECIMAL(38,0))) AS DOUBLE) / 1000000"
    ).alias(alias)


def micro_avg(expr: str, alias: str) -> Column:
    """Exact AVG on the scaled-integer path (sum_micro / n / 1e6)."""
    return F.expr(
        f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / COUNT({expr}) / 1000000"
    ).alias(alias)


def davg(expr: str, alias: str, prec: int = 18, scale: int = 6) -> Column:
    """Exact AVG: decimal-exact sum / count (IEEE division is deterministic)."""
    return F.expr(
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({expr})"
    ).alias(alias)
