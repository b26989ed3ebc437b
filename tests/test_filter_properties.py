"""Property-based specs for the filter plane: Spark operators must agree
with a naive Python model on arbitrary message streams.

The reference pins these semantics with example-based unit tests
(tests/Stream/SourceFilterTest.cpp:65-253); hypothesis generalizes them.
Examples are kept small and few — each case is a Spark round-trip.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_to_nexus_spark.operators import filters

# messages: (offset, ts) per source; single partition, consumption order =
# offset order. Timestamps small ints to force collisions/out-of-order.
msg_lists = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["s1", "s2"])),
    min_size=0,
    max_size=12,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, msgs):
    rows = [
        ("f144", src, 0, i, ts, float(ts))
        for i, (ts, src) in enumerate(msgs)
    ]
    return spark.createDataFrame(
        rows, "schema string, source_name string, partition int, offset long, timestamp long, value double"
    )


@given(msgs=msg_lists, start=st.integers(0, 30), width=st.integers(0, 30))
@PROP_SETTINGS
def test_asof_buffer_matches_naive_model(spark, msgs, start, width):
    stop = start + width
    out = filters.with_asof_buffer(_df(spark, msgs), start, stop).collect()

    # naive model: per source keep latest (ts, offset) with ts < start,
    # plus every in-window row
    naive_buffered = {}
    naive_window = set()
    for off, (ts, src) in enumerate(msgs):
        if ts < start:
            cur = naive_buffered.get(src)
            if cur is None or (ts, off) > cur:
                naive_buffered[src] = (ts, off)
        elif start <= ts <= stop:
            naive_window.add(off)

    got_buffered = {r.source_name: (r.timestamp, r.offset) for r in out if r.is_buffered_message}
    got_window = {r.offset for r in out if not r.is_buffered_message}
    assert got_buffered == naive_buffered
    assert got_window == naive_window


@given(msgs=msg_lists)
@PROP_SETTINGS
def test_drop_repeated_matches_naive_model(spark, msgs):
    out = filters.drop_repeated_timestamps(_df(spark, msgs)).collect()
    keep = set()
    prev: dict[str, int] = {}
    for off, (ts, src) in enumerate(msgs):
        if src not in prev or prev[src] != ts:
            keep.add(off)
        prev[src] = ts
    assert {r.offset for r in out} == keep


@given(msgs=msg_lists)
@PROP_SETTINGS
def test_out_of_order_flag_matches_naive_model(spark, msgs):
    out = filters.with_out_of_order_flag(_df(spark, msgs)).collect()
    flagged = set()
    prev: dict[str, int] = {}
    for off, (ts, src) in enumerate(msgs):
        if src in prev and ts < prev[src]:
            flagged.add(off)
        prev[src] = ts
    assert {r.offset for r in out if r.is_out_of_order} == flagged
    # F5 never drops rows
    assert len(out) == len(msgs)
