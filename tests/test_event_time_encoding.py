"""Event-time physical-encoding drift guard.

The driver's fixture parquet has shipped two different physical encodings of
the same logical event time (TIMESTAMP(NANOS) read as long in r1/r2, then
timestamp[us] TIMESTAMP_NTZ), and the encoding may drift again. The engine's
contract (queries.normalize_event_time) is: whatever the file stores, the
registered view exposes the SAME canonical pair —

    ts     TIMESTAMP   (session-TZ µs; session pinned UTC)
    ts_ns  BIGINT      (ns since epoch)

These tests build every encoding from one logical dataset in tmp and assert
the normalized outputs are value-identical, and that the window predicate
still reaches the parquet scan (PushedFilters) for each encoding.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_to_nexus_spark.queries import normalize_event_time

# One logical dataset: whole-µs instants (ns-resolution fixtures are
# generated at whole-µs too — parquet µs encoding can't carry sub-µs).
_US = [
    1704067200_000000,  # 2024-01-01 00:00:00
    1704240000_123456,  # 2024-01-03 00:00:00.123456
    1704844799_999999,  # 2024-01-09 23:59:59.999999
    1704844800_000000,  # 2024-01-10 00:00:00
]
_IDS = list(range(len(_US)))


def _write(path, arr: pa.Array) -> str:
    t = pa.table({"event_id": pa.array(_IDS, pa.int64()), "ts": arr})
    pq.write_table(t, path)
    return str(path)


@pytest.fixture(scope="module")
def encoded_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("enc")
    ns = _write(d / "ns.parquet", pa.array([u * 1000 for u in _US], pa.timestamp("ns")))
    us = _write(d / "us.parquet", pa.array(_US, pa.timestamp("us")))
    return {"ns": ns, "us": us}


# NOTE: nanosAsLong=true is set session-wide WITHOUT restore on purpose —
# the engine itself pins it for every session (queries.register_views and
# bench.py set the same conf), so the whole suite runs under the
# production setting; normalize_event_time handles both encodings either
# way.


def _normalized_rows(spark, path):
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_event_time(spark.read.parquet(path), "ts")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert dict(df.dtypes)["ts_ns"] == "bigint"
    # unix_micros is instant-based → independent of the driver's local TZ
    # (plain collect() of TIMESTAMP converts via local time, which would
    # make this test depend on the host's TZ setting).
    return {
        r["event_id"]: (r["ts_us"], r["ts_ns"])
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "ts_ns"
        ).collect()
    }


def test_both_encodings_normalize_identically(spark, encoded_files):
    rows_ns = _normalized_rows(spark, encoded_files["ns"])
    rows_us = _normalized_rows(spark, encoded_files["us"])
    assert rows_ns == rows_us
    # and both match the logical instants exactly
    for i, us in zip(_IDS, _US):
        assert rows_ns[i] == (us, us * 1000)


@pytest.mark.parametrize("enc", ["ns", "us"])
def test_window_predicate_reaches_scan(spark, encoded_files, enc):
    """For each encoding, the canonical two-conjunct window predicate (µs
    timestamp range AND redundant ns-long range) must land in PushedFilters:
    the ns conjunct pushes on ns-as-long files, the timestamp conjunct on
    µs-timestamp files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_event_time(spark.read.parquet(encoded_files[enc]), "ts")
    df.createOrReplaceTempView("enc_events")
    q = spark.sql(
        """
        SELECT event_id FROM enc_events
        WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND ts <= TIMESTAMP '2024-01-10 00:00:00'
          AND ts_ns >= unix_micros(TIMESTAMP '2024-01-03 00:00:00') * 1000
          AND ts_ns <= unix_micros(TIMESTAMP '2024-01-10 00:00:00') * 1000
        """
    )
    assert [r["event_id"] for r in q.collect()] == [1, 2, 3]
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    assert any(
        "GreaterThanOrEqual(ts," in l or "GreaterThanOrEqual(ts_ns," in l
        for l in pushed
    ), plan


def test_ns_upper_bound_is_exact_for_sub_us_residues(spark, tmp_path):
    """A ns-encoded event 500 ns past T_STOP must be EXCLUDED: Spark's
    derived µs timestamp truncates to T_STOP and passes the timestamp
    conjunct, so only an exact (unwidened) ns bound preserves the
    ns-precision semantics the DuckDB oracle applies."""
    stop_us = 1704844800_000000  # 2024-01-10 00:00:00
    arr = pa.array(
        [(stop_us - 1_000_000) * 1000, stop_us * 1000, stop_us * 1000 + 500],
        pa.timestamp("ns"),
    )
    t = pa.table({"event_id": pa.array([0, 1, 2], pa.int64()), "ts": arr})
    path = str(tmp_path / "subus.parquet")
    pq.write_table(t, path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_event_time(spark.read.parquet(path), "ts")
    df.createOrReplaceTempView("subus_events")
    got = spark.sql(
        """
        SELECT event_id FROM subus_events
        WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'
          AND ts_ns <= unix_micros(TIMESTAMP '2024-01-10 00:00:00') * 1000
        """
    ).collect()
    assert sorted(r.event_id for r in got) == [0, 1]  # 2 is 500 ns late
