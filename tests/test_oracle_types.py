"""Guard: no oracle output column may have a DuckDB type that the driver's
pandas materialization widens to float64 while Spark emits an integer.

The external driver fetches the DuckDB oracle result through pandas and
stringifies cells before hashing.  DuckDB HUGEINT (the default result type
of ``SUM(<integer>)``) becomes float64 there, so ``362`` hashes as
``362.0`` against Spark's ``362`` — a value-identical result reads as a
hash mismatch (this is exactly what made ``q12_late_shipment`` the one red
row of round 3).  ``DESCRIBE`` catches the drift statically, without
running Spark: every oracle's output schema is checked against the types
whose pandas round trip is not string-stable.

No fixture data is touched — DESCRIBE only binds the views.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import duck_connection

# Types pandas cannot hold losslessly as integers: HUGEINT/UHUGEINT widen
# to float64 (or raise), so their stringification diverges from Spark's
# BIGINT.  DECIMAL also lands as float64 — fine when the Spark side is
# DOUBLE (our decimal-exact discipline casts back to DOUBLE on both sides),
# wrong when Spark emits an integer — so bare DECIMAL outputs are flagged
# too: discipline says every decimal aggregate ends in CAST(... AS DOUBLE).
_BANNED = ("HUGEINT", "UHUGEINT")


def _oracle_items():
    from n5_dask_spark.registry import load_all

    return sorted((n, q.oracle) for n, q in load_all().items() if q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name,oracle", _oracle_items(), ids=lambda p: p if isinstance(p, str) and "\n" not in p else "")
def test_oracle_output_types_hash_stable(duck, name, oracle):
    try:
        rows = duck.execute(f"DESCRIBE {oracle}").fetchall()
    except duckdb.Error as e:  # oracles that need per-query temp views etc.
        pytest.skip(f"DESCRIBE not applicable: {e}")
    bad = [(col, typ) for col, typ, *_ in rows if any(b in typ.upper() for b in _BANNED)]
    decimals = [(col, typ) for col, typ, *_ in rows if typ.upper().startswith("DECIMAL")]
    assert not bad, (
        f"{name}: oracle output column(s) {bad} have pandas-unstable integer "
        f"types; wrap in CAST(... AS BIGINT)"
    )
    assert not decimals, (
        f"{name}: oracle output column(s) {decimals} are DECIMAL; the "
        f"determinism discipline requires CAST(... AS DOUBLE) on both sides"
    )


def test_exact_agg_helpers_match_duckdb_on_random_data(spark):
    """Differential contract test for the exact-aggregation helpers that
    underlie most float oracles (operators/_exact.py): on randomized
    doubles — including NEGATIVES and values with >6 decimal places, which
    the driver tables never exercise — Spark's dsum/davg/micro_sum/
    micro_avg must produce bit-identical doubles to the equivalent DuckDB
    formulas. micro_sum's hi/lo split relies on the truncated-division
    identity, which differs between engines for negative operands ONLY if
    misused; the recombined total must still equal DuckDB's plain
    HUGEINT-widened sum."""
    import duckdb as _duck
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from n5_dask_spark.operators._exact import davg, dsum, micro_avg, micro_sum

    rng = np.random.default_rng(101)
    vals = np.concatenate(
        [
            (rng.random(4000) - 0.5) * 2e5,  # signed, wide range
            rng.random(100) * 1e-7,  # sub-micro magnitudes
            np.round(rng.random(900) * 1e3, 2),  # price-like 2dp
        ]
    )
    grp = rng.integers(0, 7, len(vals))
    pdf = pd.DataFrame({"g": grp, "x": vals})

    sdf = spark.createDataFrame(pdf)
    got = {
        (int(r["g"]),): (r["ds"], r["da"], r["ms"], r["ma"])
        for r in sdf.groupBy("g")
        .agg(dsum("x", "ds"), davg("x", "da"), micro_sum("x", "ms"), micro_avg("x", "ma"))
        .collect()
    }

    con = _duck.connect()
    con.register("t", pdf)
    want = {
        (int(g),): (ds, da, ms, ma)
        for g, ds, da, ms, ma in con.execute(
            """
            SELECT g,
                   CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE),
                   CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x),
                   CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000,
                   CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / COUNT(x) / 1000000
            FROM t GROUP BY g
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        for i, (a, b) in enumerate(zip(got[k], want[k])):
            assert a == b, (k, i, a, b)
