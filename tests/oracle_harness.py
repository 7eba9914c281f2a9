"""Local replica of the driver's t2 gate: run a registered Spark query and
its DuckDB oracle over the same parquet tables, canonicalize, and compare
row-count + column names + values. Strict equality — our determinism
discipline (registry.py) is supposed to make results EXACTLY equal."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from n5_dask_spark.catalog import TABLES, table_path

_EPOCH_COLS_CACHE: dict[str, duckdb.DuckDBPyConnection] = {}


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):
            # Spark-written datasets are DIRECTORIES of part files (the
            # sf1 scale-up, any engine-written fixture); Spark reads those
            # transparently but DuckDB needs the glob spelled out. The
            # recursive ** also picks up Hive-partitioned (key=val
            # subdirectory) layouts — duckdb globs ** across directories
            p = os.path.join(p, "**", "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon_cell(v):
    """Canonicalize a cell VALUE while keeping its TYPE observable.

    The external driver's value-hash stringifies cells, so ``8752`` (BIGINT)
    and ``8752.0`` (DOUBLE) hash differently even though ``8752 == 8752.0``
    in Python.  Every canonical cell is therefore a ``(type_tag, value)``
    pair — int-vs-float drift fails locally exactly like it fails the gate
    (that drift gave scalar_math_funcs a false local green in round 1).
    Decimal is tagged as float: our determinism discipline casts decimal
    aggregates back to DOUBLE on both sides, so a Decimal here is already
    a float in spirit and the driver sees its plain string form.
    """
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        v = float(v)  # fall through to the float canon (sign-of-zero aware)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            # The driver stringifies cells, and str(-0.0) = "-0.0" !=
            # "0.0" — but Python compares -0.0 == 0.0, so a raw float
            # canon silently PASSES a sign-of-zero disagreement the
            # driver's value hash would flip on (r9 negative-zero probe:
            # Spark's BigDecimal-based ROUND emits +0.0 where DuckDB's
            # binary round keeps -0.0). Tag it like NaN so local compares
            # see exactly what the driver sees.
            return ("f", "-0.0")
        return ("f", v)
    if hasattr(v, "isoformat"):  # datetime / date
        try:
            return ("t", v.isoformat(sep=" "))
        except TypeError:
            # plain date: keep distinct from a midnight timestamp so DATE vs
            # TIMESTAMP schema drift surfaces as a mismatch (driver would too)
            return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    # repr-based tiebreak: any DETERMINISTIC total order preserves
    # multiset equality, and mixed cells (the "NaN" string inside an
    # ("f", ...) tag) must not TypeError the sort — r9 NaN probes hit that
    out.sort(key=lambda r: tuple((x is None, str(type(x)), repr(x)) for x in r))
    return sorted_cols, out


def _has_ltz(dt) -> bool:
    """True if the data type contains a session-timezone TIMESTAMP (LTZ)."""
    from pyspark.sql.types import ArrayType, MapType, StructType, TimestampType

    if isinstance(dt, TimestampType):
        return True
    if isinstance(dt, StructType):
        return any(_has_ltz(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _has_ltz(dt.elementType)
    if isinstance(dt, MapType):
        return _has_ltz(dt.keyType) or _has_ltz(dt.valueType)
    return False


def compare_query(spark, name: str, sf_dir: str) -> dict:
    from n5_dask_spark.registry import load_all

    q = load_all()[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    result = {"name": name, "rows": len(s_rows), "oracle": q.oracle is not None}
    # Surfaced-timestamp convention (registry notes): every surfaced
    # timestamp must be TIMESTAMP_NTZ. collect() renders LTZ through the
    # PYTHON PROCESS timezone (datetime.fromtimestamp) — tz-dependent even
    # with the session zone tuned to UTC — while NTZ collects timezone-
    # independently. An LTZ output is a latent hash flip on any non-UTC
    # driver host (r9 process-TZ gate caught join_asof's o_orderdate), so
    # the harness fails it loudly even when values happen to match here.
    ltz_cols = [f.name for f in sdf.schema.fields if _has_ltz(f.dataType)]
    if ltz_cols:
        result["ltz_cols"] = ltz_cols
        result["match"] = False
        return result
    if q.oracle is None:
        result["match"] = len(s_rows) >= 0
        return result

    con = duck_connection(sf_dir)
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]
    con.close()

    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)

    result["cols_match"] = sc == dc
    result["count_match"] = len(sr) == len(dr)
    result["values_match"] = sr == dr
    result["match"] = result["cols_match"] and result["count_match"] and result["values_match"]
    if not result["match"]:
        result["spark_cols"], result["duck_cols"] = sc, dc
        result["spark_n"], result["duck_n"] = len(sr), len(dr)
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        result["first_diffs"] = diffs
        result["spark_head"], result["duck_head"] = sr[:2], dr[:2]
    return result
