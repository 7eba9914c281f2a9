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
    """Exact SUM via scaled-long accumulation: ROUND(x*1e6) AS BIGINT summed,
    then /1e6. ~2.5x faster than decimal aggregation (hot aggregate path);
    the addends are integers so the sum is order-independent and identical
    across engines. Use where the oracle uses the same formula. BIGINT
    micro-units bound the safe domain to ~9e12 total — plenty for per-group
    sums here; extreme-scale groups fall back to dsum."""
    return F.expr(f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000").alias(alias)


def micro_avg(expr: str, alias: str) -> Column:
    """Exact AVG on the scaled-long path (sum_micro / n / 1e6)."""
    return F.expr(
        f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE) / COUNT({expr}) / 1000000"
    ).alias(alias)


def davg(expr: str, alias: str, prec: int = 18, scale: int = 6) -> Column:
    """Exact AVG: decimal-exact sum / count (IEEE division is deterministic)."""
    return F.expr(
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({expr})"
    ).alias(alias)
