"""Bucketed range join: agrees with the naive containment model and
produces an equi-join plan (not a broadcast nested loop)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_to_nexus_spark.operators.range_join import bucketed_range_join

points_s = st.lists(st.integers(0, 50), min_size=0, max_size=10)
intervals_s = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 20)), min_size=0, max_size=6
)

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run(spark, pts, ivs, width):
    p = spark.createDataFrame([(j, t) for j, t in enumerate(pts)], "pid long, ts long")
    i = spark.createDataFrame(
        [(j, s, s + w) for j, (s, w) in enumerate(ivs)], "iid long, start long, end long"
    )
    out = bucketed_range_join(p, i, "ts", "start", "end", bucket_width=width)
    return {(r.pid, r.iid) for r in out.collect()}


@given(pts=points_s, ivs=intervals_s, width=st.integers(1, 30))
@PROP_SETTINGS
def test_matches_naive_containment(spark, pts, ivs, width):
    naive = {
        (pj, ij)
        for pj, t in enumerate(pts)
        for ij, (s, w) in enumerate(ivs)
        if s <= t <= s + w
    }
    assert _run(spark, pts, ivs, width) == naive


def test_plan_is_hash_join_not_nested_loop(spark):
    p = spark.range(100).selectExpr("id AS pid", "id * 7 % 500 AS ts")
    i = spark.range(20).selectExpr("id AS iid", "id * 25 AS start", "id * 25 + 40 AS end")
    out = bucketed_range_join(p, i, "ts", "start", "end", bucket_width=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
