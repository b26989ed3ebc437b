"""Physical-plan quality gates: the properties that matter at 100 TB.

These assert on `.explain` output, not results — a correct query whose
time-window predicate no longer reaches the parquet scan is a perf
regression we want to catch at test time.
"""

from __future__ import annotations

import pytest

from kafka_to_nexus_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, sql: str) -> str:
    # formatted mode: one attribute per line, no truncation of filter lists
    qe = spark.sql(sql)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    Q.register_views(spark, SF_DIR)


def test_time_window_pushes_ns_range_to_parquet(spark):
    """f2's window predicate must reach PushedFilters as a long range on the
    raw ns column (row-group pruning), despite the ns→µs view projection."""
    plan = _plan(spark, Q.SPARK_SQL["f2_time_window"])
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[-1]
    assert "GreaterThanOrEqual(ts," in line and "LessThanOrEqual(ts," in line, line


def test_asof_buffer_pushes_ns_bounds(spark):
    plan = _plan(spark, Q.SPARK_SQL["f3_asof_buffer"])
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    # both branches (pre-start scan, in-window scan) must prune
    assert any("LessThan(ts," in l for l in pushed), plan
    assert any("GreaterThanOrEqual(ts," in l for l in pushed), plan


def test_tpch_date_filters_push_down(spark):
    for name, col in [
        ("q6_forecast_revenue", "l_shipdate"),
        ("q5_local_supplier", "o_orderdate"),
    ]:
        plan = _plan(spark, Q.SPARK_SQL[name])
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l and col in l]
        assert any(
            f"GreaterThanOrEqual({col}" in l or f"LessThan({col}" in l for l in pushed
        ), f"{name}: no pushed range on {col}"


def test_q5_broadcasts_small_dims(spark):
    """nation/region/supplier are small dims — the join must broadcast them,
    not shuffle 100 TB of lineitem against a 25-row table."""
    plan = _plan(spark, Q.SPARK_SQL["q5_local_supplier"])
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_column_pruning_reaches_scan(spark):
    """f1 projects 4 columns; the events scan must not read props (the wide
    string column)."""
    plan = _plan(spark, Q.SPARK_SQL["f1_source_filter"])
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "props" not in scan, scan


def test_exists_subqueries_become_semi_joins(spark):
    """q21's EXISTS / NOT EXISTS must decorrelate to semi/anti hash joins,
    not per-row re-scans of lineitem."""
    plan = _plan(spark, Q.SPARK_SQL["q21_waiting_orders"])
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_correlated_avg_decorrelates_to_aggregate_join(spark):
    """q17's correlated scalar avg must plan as one grouped aggregate
    joined back, not a subquery per probe row."""
    plan = _plan(spark, Q.SPARK_SQL["q17_small_quantity_revenue"])
    assert "HashAggregate" in plan and "Join" in plan, plan


def test_agg_is_partial_before_shuffle(spark):
    """Running min/max/mean must combine map-side (partial_*) so the shuffle
    carries one row per (partition, source), not the full stream."""
    plan = _plan(spark, Q.SPARK_SQL["w1_f144_stats"])
    assert "partial_min" in plan and "partial_max" in plan, plan


def test_partition_pruning_on_date_partitioned_layout(spark, tmp_path):
    """At 100 TB the stream table is date-partitioned; a day predicate must
    prune partitions at plan time (PartitionFilters), not scan-and-filter."""
    from pyspark.sql import functions as F

    src = spark.table("events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    src.write.partitionBy("day").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("day") == "2024-01-03")
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "2024-01-03" in pf[-1], plan
    # and the pruned read returns only that day (partition values are
    # type-inferred back as DATE)
    days = {str(r.day) for r in df.select("day").distinct().collect()}
    assert days == {"2024-01-03"}
