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


def _micro_total(expr: str) -> str:
    """Exact SUM(ROUND(x*1e6)) as a DECIMAL(38,0) SQL fragment, computed
    through a HI/LO SPLIT: two BIGINT accumulators (whole units and
    sub-unit remainder) recombined exactly per group.

    Why not one BIGINT sum: a 100 TB-scale group (~1e11 rows x ~1e9
    micro-units) passes the int64 ceiling and Spark's non-ANSI bigint sum
    WRAPS SILENTLY while the DuckDB oracle widens to HUGEINT. Why not a
    decimal accumulator: summing DECIMAL(38,0) per row measures ~3x the
    bigint path on q1 (and DECIMAL(18,6) ~2x). The split keeps the hot
    per-row adds in int64 — SUM(m DIV 1e6) is bounded by the true total
    in WHOLE units (safe past 1e15 rows/group at 1e4-unit values) and
    SUM(m % 1e6) by 1e6 x rows — at ~9% over the plain bigint sum, and
    the truncated-division identity m == (m DIV d)*d + m % d makes the
    recombined total EXACTLY SUM(m): values are bit-identical to both the
    single-sum formula and the oracle's HUGEINT total."""
    m = f"CAST(ROUND(({expr}) * 1000000) AS BIGINT)"
    return f"(CAST(SUM({m} DIV 1000000) AS DECIMAL(38,0)) * 1000000 + SUM({m} % 1000000))"


def micro_sum(expr: str, alias: str) -> Column:
    """Exact SUM via scaled-integer accumulation (see _micro_total), /1e6.
    Use where the oracle uses the single-BIGINT-sum micro formula — the
    totals are identical."""
    return F.expr(f"CAST({_micro_total(expr)} AS DOUBLE) / 1000000").alias(alias)


def micro_avg(expr: str, alias: str) -> Column:
    """Exact AVG on the scaled-integer path (sum_micro / n / 1e6).

    try_divide on the COUNT: a group whose values are ALL NULL has
    COUNT(expr) = 0, which ANSI division turns into a job-killing
    DIVIDE_BY_ZERO; the oracle's SQL yields NULL there (as does SQL AVG),
    and try_divide matches it while staying bit-identical otherwise."""
    return F.expr(
        f"try_divide(CAST({_micro_total(expr)} AS DOUBLE), COUNT({expr})) / 1000000"
    ).alias(alias)


def davg(expr: str, alias: str, prec: int = 18, scale: int = 6) -> Column:
    """Exact AVG: decimal-exact sum / count (IEEE division is deterministic).
    try_divide for the same all-NULL-group reason as micro_avg."""
    return F.expr(
        f"try_divide(CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE), COUNT({expr}))"
    ).alias(alias)
