"""Every registered query must match its DuckDB oracle exactly at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _all_query_names():
    from n5_dask_spark.registry import load_all

    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, name):
    from tests.oracle_harness import compare_query

    result = compare_query(spark, name, SF_SMALL)
    assert result["match"], result
