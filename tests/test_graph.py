"""connected_components_star correctness on shapes the oracle gate can't
produce: deep chains (where plain label propagation needs diameter
iterations — the case star contraction exists for) and multi-component
forests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from n5_dask_spark.operators.graph import connected_components_star


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    out = connected_components_star(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_deep_chain(spark):
    # path 0-1-2-...-40: diameter 40, star CC must converge in O(log^2 n)
    n = 41
    got = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (20, 21), (21, 22), (22, 20)]
    got = _labels(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20}


def test_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(2, 1), (1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_propagation_variant(spark):
    """Both CC implementations must produce identical clusters on a random
    (seeded) graph."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    star = _labels(spark, edges)

    # inline min-label propagation reference (small graph, driver loop)
    import collections

    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    lbl = {n: n for n in adj}
    changed = True
    while changed:
        changed = False
        for n in adj:
            m = min([lbl[n]] + [lbl[x] for x in adj[n]])
            if m < lbl[n]:
                lbl[n] = m
                changed = True
    assert star == lbl
