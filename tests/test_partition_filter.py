"""F6 stop decision (PartitionFilter.cpp:46-68 contract) and S3 topic
discovery with exponential backoff (MetaDataQuery.h:33-38)."""

from __future__ import annotations

import pytest

from kafka_to_nexus_spark.sources.discovery import await_topics, backoff_schedule_ms
from kafka_to_nexus_spark.streaming.partition_filter import (
    PartitionFilter,
    PartitionState,
    PollStatus,
)


class FakeClock:
    def __init__(self, t: float = 1000.0) -> None:
        self.t = t

    def __call__(self) -> float:
        return self.t


def test_messages_never_stop():
    clk = FakeClock()
    pf = PartitionFilter(stop_time_s=0.0, clock=clk)  # stop time long past
    for _ in range(5):
        assert not pf.should_stop_partition(PollStatus.MESSAGE)
        clk.t += 100
    assert pf.state is PartitionState.DEFAULT


def test_timeout_stops_only_at_eof_past_stop_time():
    clk = FakeClock(t=1000.0)
    pf = PartitionFilter(stop_time_s=1050.0, stop_leeway_s=5.0, clock=clk)
    # timeout without EOF: never a stop, even past stop time
    clk.t = 2000.0
    assert not pf.should_stop_partition(PollStatus.TIMED_OUT)
    # EOF then timeout before stop+leeway: no stop
    clk.t = 1010.0
    assert not pf.should_stop_partition(PollStatus.END_OF_PARTITION)
    assert not pf.should_stop_partition(PollStatus.TIMED_OUT)
    # past stop + leeway: stop
    clk.t = 1056.0
    assert pf.should_stop_partition(PollStatus.TIMED_OUT)


def test_no_stop_time_runs_forever_on_timeouts():
    clk = FakeClock()
    pf = PartitionFilter(stop_time_s=None, clock=clk)
    pf.should_stop_partition(PollStatus.END_OF_PARTITION)
    clk.t += 1e6
    assert not pf.should_stop_partition(PollStatus.TIMED_OUT)


def test_error_stops_only_after_persisting_30s():
    clk = FakeClock(t=0.0)
    pf = PartitionFilter(error_timeout_s=30.0, clock=clk)
    assert not pf.should_stop_partition(PollStatus.ERROR)  # state begins
    clk.t = 29.0
    assert not pf.should_stop_partition(PollStatus.ERROR)  # not yet
    clk.t = 31.0
    assert pf.should_stop_partition(PollStatus.ERROR)  # persisted > 30 s


def test_message_resets_error_persistence():
    clk = FakeClock(t=0.0)
    pf = PartitionFilter(error_timeout_s=30.0, clock=clk)
    pf.should_stop_partition(PollStatus.ERROR)
    clk.t = 29.0
    pf.should_stop_partition(PollStatus.MESSAGE)  # recovery resets the clock
    clk.t = 58.0
    assert not pf.should_stop_partition(PollStatus.ERROR)  # fresh 30 s window
    clk.t = 89.0
    assert pf.should_stop_partition(PollStatus.ERROR)


def test_streaming_job_errors_out_after_timeout(spark, tmp_path):
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.streaming.job import StreamingJob

    tpl = {
        "children": [{
            "type": "group", "name": "entry",
            "children": [{
                "name": "g", "type": "group", "attributes": [],
                "children": [{"module": "f144",
                              "config": {"topic": "t", "source": "s"}}],
            }],
        }]
    }
    start = StartMessage(job_id="e", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    job = StreamingJob(spark, start, str(tmp_path / "o"))
    clk = FakeClock(t=0.0)
    job.partition_filter._clock = clk
    assert not job.notify_source_error()
    clk.t = 31.0
    assert job.notify_source_error()
    assert job.state.finished


# ---------------------------------------------------------------------------
# S3 discovery
# ---------------------------------------------------------------------------

def test_backoff_schedule_doubles_to_cap():
    delay = backoff_schedule_ms()
    assert [delay(a) for a in range(7)] == [400, 800, 1600, 3200, 6400, 10_000, 10_000]


def test_await_topics_retries_until_present():
    listings = [["a"], ["a"], ["a", "b"]]
    sleeps: list[float] = []
    out = await_topics(
        ["a", "b"],
        list_topics=lambda: listings.pop(0),
        sleeper=sleeps.append,
        clock=FakeClock(),
    )
    assert out == ["a", "b"]
    assert sleeps == [0.4, 0.8]  # exponential 400 ms → 800 ms


def test_await_topics_times_out_naming_missing():
    clk = FakeClock(t=0.0)

    def sleeper(s: float) -> None:
        clk.t += s

    with pytest.raises(TimeoutError, match="missing_topic"):
        await_topics(
            ["missing_topic"],
            list_topics=lambda: ["other"],
            max_wait_s=5.0,
            sleeper=sleeper,
            clock=clk,
        )


def test_await_topics_survives_listing_errors():
    calls = {"n": 0}

    def flaky() -> list[str]:
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("broker warming up")
        return ["t"]

    out = await_topics(["t"], flaky, sleeper=lambda s: None, clock=FakeClock())
    assert out == ["t"] and calls["n"] == 3
