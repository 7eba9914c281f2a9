"""Registry invariants the external driver depends on."""

from __future__ import annotations

from n5_dask_spark.registry import DRIVER_WINDOW, load_all


def test_window_is_first_50_in_queries_order():
    """The driver grades exactly the first 50 queries() entries; the pinned
    window must BE that prefix, or rotations silently grade the wrong set."""
    assert len(DRIVER_WINDOW) == 50
    assert list(load_all())[:50] == list(DRIVER_WINDOW)


def test_window_names_unique():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)


def test_every_query_has_oracle():
    """Every registered query is hash-checkable: no rows-only rows left."""
    missing = [n for n, q in load_all().items() if q.oracle is None]
    assert missing == [], missing


def test_registered_docs_nonempty():
    undocumented = [n for n, q in load_all().items() if not q.doc.strip()]
    assert undocumented == [], undocumented


def test_queries_label_their_jobs(spark):
    """X2 progress surface: running a registry query stamps the Spark job
    description, so the UI / event log attributes every job to its query."""
    q = load_all()["q6_forecast_revenue"]
    q.fn(spark, "/root/testdata/sf0.001").collect()
    desc = spark.sparkContext.getLocalProperty("spark.job.description")
    assert desc == "n5ds:q6_forecast_revenue"
