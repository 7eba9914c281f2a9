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


def davg(expr: str, alias: str, prec: int = 18, scale: int = 6) -> Column:
    """Exact AVG: decimal-exact sum / count (IEEE division is deterministic)."""
    return F.expr(
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({expr})"
    ).alias(alias)
