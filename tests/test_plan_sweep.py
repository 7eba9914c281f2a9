"""Registry-wide physical-plan sweep (r12 — promoted from a per-round
manual ritual to a pinned gate).

Every registered query's EXECUTED plan is built against the sf0.001
fixtures and screened for the two shapes that do not survive a 100-TB
scale-up:

- ``CartesianProduct`` — both-sides-shuffled cross product: quadratic
  work AND quadratic shuffle. Zero tolerance; there is always a
  broadcast, bucketing, binning, or LSH formulation.
- ``BroadcastNestedLoopJoin`` — legal ONLY when the broadcast side is
  constant-bounded (a literal/1-row aggregate, a bounded query set, a
  salt range); broadcasting an SF-scaling side is an executor OOM at
  fleet scale. The allowlist below names every justified user; a new
  query joining non-equi must either earn a slot here (with its bound
  stated) or find an equi formulation.

~2 min wall: plan construction only, except the few queries that run
driver-side staging jobs as part of building their result.
"""

from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# query -> why its BroadcastNestedLoopJoin side is constant-bounded
BNLJ_JUSTIFIED = {
    "join_range_nonequi": "broadcast side is the bounded bands/tiers dim",
    "embedding_near_duplicates": (
        "documented exception (similarity.py): non-equi pair condition; "
        "the LSH variant is the scale path"
    ),
    "knn_bruteforce_cosine": "broadcast side is the fixed k-row query set",
    "knn_ivf_probe": "broadcast side is the fixed k-row query set",
    "text_boilerplate_shingles": "broadcast side is a 1-row corpus aggregate",
    "text_tfidf_top_terms": "broadcast side is a 1-row doc-count aggregate",
    "join_cross": "cross join vs the constant-cardinality region dim",
    "join_salted": "broadcast side is the bounded salt-range/dim expansion",
}


@pytest.mark.usefixtures("spark")
def test_no_cartesian_products_and_only_justified_bnlj(spark):
    from n5_dask_spark.registry import load_all

    cart, bnlj, fails = [], [], []
    for name, q in load_all().items():
        try:
            df = q.fn(spark, SF_SMALL)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a query that can't PLAN is a failure too
            fails.append((name, str(exc)[:120]))
            continue
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj.append(name)
    assert not fails, f"queries failed to plan: {fails}"
    assert cart == [], f"CartesianProduct in executed plans: {cart}"
    unjustified = sorted(set(bnlj) - set(BNLJ_JUSTIFIED))
    assert not unjustified, (
        f"new BroadcastNestedLoopJoin users {unjustified} — state the "
        "broadcast side's constant bound in BNLJ_JUSTIFIED or re-formulate "
        "as an equi join"
    )
    gone = sorted(set(BNLJ_JUSTIFIED) - set(bnlj))
    assert not gone, (
        f"allowlisted queries no longer use BNLJ: {gone} — prune the "
        "allowlist so it stays an exact census"
    )
