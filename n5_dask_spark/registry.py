"""Central query registry: the contract between operator modules and the
driver harness (``__spark_entry__.py``).

Every operator from SURVEY.md §2 that is demonstrable as a query registers
itself here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation), and
- optionally an ANSI-SQL oracle string DuckDB can run over the same parquet
  tables (the correctness gate). Queries with no SQL-expressible semantics
  (e.g. N5 array pipelines) register ``oracle=None`` and get a weaker
  rows-only check.

Determinism discipline (so value-hashes match the oracle EXACTLY):
- Float SUM/AVG go through decimal-exact aggregation: the addends are cast
  to DECIMAL(18,6), summed exactly, and the final value cast back to DOUBLE.
  Both engines then produce bit-identical doubles (see ``dsum``/``davg``).
- Transcendental / similarity outputs are rounded to 6 decimals before any
  ranking or output, and all rankings carry a total-order tiebreaker key.
- Every computed column is aliased identically on both sides (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkFn], SparkFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (each registers its queries) and return
    the populated registry."""
    # Imported here (not at module top) so registry.py has no heavy deps.
    from n5_dask_spark.operators import (  # noqa: F401
        tpch,
        relational,
        windows,
        events,
        dedup,
        similarity,
        text,
        multimodal,
        arrayops,
        n5ops,
        tpch_extra,
        udfs,
        relational2,
        text2,
        pipeline,
        pipeline2,
        relational3,
    )
    from n5_dask_spark.streaming import jobs, joins, stateful  # noqa: F401

    return REGISTRY
