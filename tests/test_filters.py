"""Filter-plane contract tests — mirrors the reference's SourceFilterTest
enumeration (tests/Stream/SourceFilterTest.cpp:65-253): in-window passes,
wrong source ignored, out-of-order passes (flagged), invalid dropped,
before-start buffered, after-stop excluded, repeated-ts dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_to_nexus_spark.operators import filters, quality
from kafka_to_nexus_spark.sources.fixtures import messages_from_json

NS = 1_000_000  # fixture-ms → ns

START = 10_000 * NS
STOP = 15_000 * NS


def mk(spark, rows):
    return messages_from_json(spark, rows)


def f144_row(ts_ms, value, source="src1", offset=None, topic="t"):
    row = {
        "schema": "f144",
        "topic": topic,
        "kafka_timestamp": ts_ms,
        "source_name": source,
        "timestamp": ts_ms,
        "value": value,
    }
    if offset is not None:
        row["offset"] = offset
    return row


def test_source_filter(spark):
    df = mk(spark, [f144_row(10100, 1, "a"), f144_row(10200, 2, "b")])
    out = filters.source_filter(df, "f144", "a").collect()
    assert len(out) == 1 and out[0].value == 1.0


def test_window_filter_bounds_inclusive(spark):
    df = mk(spark, [f144_row(9_999, 0), f144_row(10_000, 1), f144_row(15_000, 2), f144_row(15_001, 3)])
    vals = sorted(r.value for r in filters.window_filter(df, START, STOP).collect())
    assert vals == [1.0, 2.0]


def test_asof_buffer_keeps_latest_prestart(spark):
    # last-before-start written, earlier pre-start ignored, post-stop dropped
    # (domain test test_messages_before_and_after.py:17-37)
    df = mk(
        spark,
        [
            f144_row(9_000, 1),
            f144_row(9_500, 2),  # the buffered one
            f144_row(10_100, 10),
            f144_row(10_110, 15),
            f144_row(16_000, 99),  # past stop
        ],
    )
    out = filters.with_asof_buffer(df, START, STOP)
    rows = sorted(out.collect(), key=lambda r: r.timestamp)
    assert [r.value for r in rows] == [2.0, 10.0, 15.0]
    assert [r.is_buffered_message for r in rows] == [True, False, False]


def test_asof_buffer_no_prestart(spark):
    df = mk(spark, [f144_row(10_100, 10)])
    out = filters.with_asof_buffer(df, START, STOP).collect()
    assert len(out) == 1 and not out[0].is_buffered_message


def test_asof_buffer_per_source(spark):
    df = mk(spark, [f144_row(9_000, 1, "a"), f144_row(9_100, 2, "b"), f144_row(10_500, 3, "a")])
    out = filters.with_asof_buffer(df, START, STOP)
    buffered = {r.source_name: r.value for r in out.filter("is_buffered_message").collect()}
    assert buffered == {"a": 1.0, "b": 2.0}


def test_drop_repeated_timestamps(spark):
    # repeated f144 timestamps skipped (test_repeated_messages.py:18)
    df = mk(
        spark,
        [
            f144_row(10_100, 10, offset=0),
            f144_row(10_100, 11, offset=1),  # dropped: same ts as previous
            f144_row(10_200, 12, offset=2),
            f144_row(10_100, 13, offset=3),  # kept: not equal to *previous* (10_200)
        ],
    )
    vals = [r.value for r in sorted(filters.drop_repeated_timestamps(df).collect(), key=lambda r: r.offset)]
    assert vals == [10.0, 12.0, 13.0]


def test_out_of_order_flagged_not_dropped(spark):
    df = mk(spark, [f144_row(10_200, 1, offset=0), f144_row(10_100, 2, offset=1)])
    rows = sorted(filters.with_out_of_order_flag(df).collect(), key=lambda r: r.offset)
    assert [r.is_out_of_order for r in rows] == [False, True]
    assert len(rows) == 2  # written anyway


def test_drop_invalid_zero_ts(spark):
    df = mk(spark, [f144_row(0, 1), f144_row(10_100, 2)])
    out = filters.drop_invalid(df).collect()
    assert len(out) == 1 and out[0].value == 2.0


def test_error_taxonomy(spark):
    rows = [
        f144_row(10_100, 1),
        {**f144_row(10_200, 2), "schema": "zzzz"},
        {**f144_row(10_300, 3), "source_name": ""},
        f144_row(0, 4),
    ]
    df = quality.with_error_code(mk(spark, rows))
    codes = {r.kafka_timestamp: r.error_code for r in df.collect()}
    assert codes[10_100] is None
    assert codes[10_200] == "UnknownFlatbufferID"
    assert codes[10_300] == "NotValidFlatbuffer"
    assert codes[0] == "InvalidTimestamp"


def test_offset_gap_detection(spark):
    rows = [f144_row(10_100, 1, offset=0), f144_row(10_200, 2, offset=1), f144_row(10_300, 3, offset=5)]
    df = quality.with_offset_gap_flag(mk(spark, rows))
    flags = {r.offset: r.has_offset_gap for r in df.collect()}
    assert flags == {0: False, 1: False, 5: True}


def test_observe_metrics(spark):
    rows = [f144_row(10_100, 1), f144_row(0, 2), {**f144_row(10_300, 3), "schema": "zzzz"}]
    observed, obs = quality.observe_stream_metrics(mk(spark, rows), name="m1")
    observed.collect()
    m = obs.get
    assert m["messages_received"] == 3
    assert m["flatbuffer_errors"] == 2
    assert m["unknown_schema"] == 1
    assert m["invalid_timestamp"] == 1
