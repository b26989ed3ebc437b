"""Execute the Kafka-facing arms without a broker.

The sandbox has no Kafka, so these paths were previously import-gated and
uncovered. Two strategies:

- ``KafkaPoolTransport`` (control/transport.py) runs against an in-process
  fake ``kafka`` module implementing the poll/commit/send subset the
  transport uses, with commit-as-claim group semantics — the real
  transport code executes end to end (claim → FSM → answ/wrdn/x5f2).
- The time→offset resolution contract (streaming/job.py, the round-1
  ``startingTimestamp`` fix) is a pure option dict
  (``kafka_reader_options``) asserted directly for both the stream and
  batch readers.

Reference behaviors mirrored: claim-once via offset commit
(src/CommandSystem/Handler.cpp:45-53), offsetsForTimes start resolution
(src/Kafka/Topic.cpp:109-155), stop + leeway scan bound
(src/Stream/Partition.cpp stop logic).
"""

from __future__ import annotations

import json
import sys
import types
import uuid

import pytest


# ---------------------------------------------------------------------------
# In-process fake of the kafka-python subset KafkaPoolTransport uses
# ---------------------------------------------------------------------------

class _FakeBroker:
    """Topic log store shared by consumers/producers; per-group committed
    offsets give commit-as-claim semantics."""

    def __init__(self) -> None:
        self.logs: dict[str, list[bytes]] = {}
        self.committed: dict[tuple[str, str], int] = {}

    def append(self, topic: str, value: bytes) -> None:
        self.logs.setdefault(topic, []).append(value)


class _FakeRecord:
    def __init__(self, value: bytes) -> None:
        self.value = value


def _install_fake_kafka(broker: _FakeBroker) -> types.ModuleType:
    mod = types.ModuleType("kafka")

    class KafkaConsumer:
        def __init__(self, topic, bootstrap_servers=None, group_id=None,
                     enable_auto_commit=True, max_poll_records=None):
            assert enable_auto_commit is False  # claim must be manual
            self._topic = topic
            self._group = group_id
            self._pos = None  # set on first poll from committed offset

        def poll(self, timeout_ms=0, max_records=1):
            log = broker.logs.get(self._topic, [])
            # resync with the group's committed offset (what a rebalance
            # does for a consumer that lost the partition in between)
            committed = broker.committed.get((self._group, self._topic), 0)
            self._pos = max(self._pos or 0, committed)
            if self._pos >= len(log):
                return {}
            records = [_FakeRecord(v) for v in log[self._pos : self._pos + max_records]]
            self._pos += len(records)
            return {(self._topic, 0): records}

        def commit(self):
            broker.committed[(self._group, self._topic)] = self._pos

    class KafkaProducer:
        def __init__(self, bootstrap_servers=None):
            pass

        def send(self, topic, value):
            broker.append(topic, value)

    mod.KafkaConsumer = KafkaConsumer
    mod.KafkaProducer = KafkaProducer
    return mod


@pytest.fixture()
def fake_kafka(monkeypatch):
    broker = _FakeBroker()
    monkeypatch.setitem(sys.modules, "kafka", _install_fake_kafka(broker))
    return broker


def _start_msg(job_id: str) -> dict:
    return {
        "job_id": job_id,
        "filename": "out.nxs",
        "nexus_structure": {"children": []},
        "start_time_ms": 10_000,
        "stop_time_ms": 15_000,
    }


def test_kafka_pool_transport_claims_once_and_responds(fake_kafka):
    from kafka_to_nexus_spark.control.commands import JobController
    from kafka_to_nexus_spark.control.transport import make_transport

    jid1, jid2 = str(uuid.uuid4()), str(uuid.uuid4())
    fake_kafka.append("pool", json.dumps(_start_msg(jid1)).encode())
    fake_kafka.append("pool", json.dumps(_start_msg(jid2)).encode())

    w1 = make_transport("kafka", brokers="b:9092", pool_topic="pool", worker_id="w1")
    w2 = make_transport("kafka", brokers="b:9092", pool_topic="pool", worker_id="w2")

    r1 = w1.claim_into(JobController())
    assert r1 is not None and r1.accepted and r1.job_id == jid1
    # the commit advanced the group's offset: w2 gets the NEXT job, not jid1
    r2 = w2.claim_into(JobController())
    assert r2 is not None and r2.accepted and r2.job_id == jid2
    # pool drained
    assert w1.try_claim() is None

    w1.send_status({"service_id": "s", "state": "writing"})
    w1.send_finished({"job_id": jid1, "error_encountered": False})
    answs = [json.loads(v) for v in fake_kafka.logs["pool_responses"]]
    assert [a["type"] for a in answs] == ["answ", "answ", "x5f2", "wrdn"]
    assert answs[0]["job_id"] == jid1 and answs[0]["accepted"]
    assert answs[-1]["error_encountered"] is False


def test_kafka_pool_transport_rejects_malformed_without_requeue(fake_kafka):
    from kafka_to_nexus_spark.control.commands import JobController
    from kafka_to_nexus_spark.control.transport import make_transport

    fake_kafka.append("pool", json.dumps({"job_id": "not-a-uuid"}).encode())
    w = make_transport("kafka", brokers="b:9092", pool_topic="pool", worker_id="w")
    resp = w.claim_into(JobController())
    assert resp is not None and not resp.accepted and resp.status_code == 400
    # consumed (committed), not returned to the pool — Handler behavior
    assert w.try_claim() is None


# ---------------------------------------------------------------------------
# Time→offset resolution contract (the r1 startingTimestamp fix)
# ---------------------------------------------------------------------------

def test_stream_reader_options_time_pushdown():
    from kafka_to_nexus_spark.streaming.job import (
        BEFORE_START_LEEWAY_NS,
        MS_TO_NS,
        kafka_reader_options,
    )

    start_ms = 1_704_240_000_000
    opts = kafka_reader_options(
        "b1:9092,b2:9092",
        ["t1", "t2"],
        start_time_ms=start_ms,
        max_offsets_per_trigger=50_000,
        min_partitions=64,
        streaming=True,
    )
    assert opts["subscribe"] == "t1,t2"
    # global timestamp (NOT per-partition startingOffsetsByTimestamp — that
    # would require partition enumeration), with the pre-start leeway applied
    expect = start_ms - BEFORE_START_LEEWAY_NS // MS_TO_NS
    assert opts["startingTimestamp"] == str(expect)
    # empty-partition fallback matches the reference's offsetsForTimes
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "false"
    # streaming readers never set an ending bound
    assert "endingTimestamp" not in opts


def test_batch_reader_options_both_bounds():
    from kafka_to_nexus_spark.streaming.job import (
        AFTER_STOP_LEEWAY_NS,
        BEFORE_START_LEEWAY_NS,
        MS_TO_NS,
        kafka_reader_options,
    )

    start_ms, stop_ms = 10_000, 15_000
    opts = kafka_reader_options(
        "b:9092", ["t"], start_time_ms=start_ms, stop_time_ms=stop_ms,
        streaming=False,
    )
    assert opts["startingTimestamp"] == str(
        max(start_ms - BEFORE_START_LEEWAY_NS // MS_TO_NS, 0)
    )
    assert opts["endingTimestamp"] == str(
        stop_ms + AFTER_STOP_LEEWAY_NS // MS_TO_NS
    )
    assert "maxOffsetsPerTrigger" not in opts
    assert "failOnDataLoss" not in opts


def test_reader_options_clamp_lookback_at_epoch():
    from kafka_to_nexus_spark.streaming.job import kafka_reader_options

    opts = kafka_reader_options("b:9092", ["t"], start_time_ms=1, streaming=True)
    assert opts["startingTimestamp"] == "0"


def test_reader_options_backpressure_floor_and_ceiling():
    """F10: offset ceiling caps batch size; the floor batches trickles and
    always rides with a max trigger delay so data can't stall forever."""
    from kafka_to_nexus_spark.streaming.job import kafka_reader_options

    opts = kafka_reader_options(
        "b:9092", ["t"],
        max_offsets_per_trigger=100_000,
        min_offsets_per_trigger=1_000,
        max_trigger_delay="30s",
        streaming=True,
    )
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["minOffsetsPerTrigger"] == "1000"
    assert opts["maxTriggerDelay"] == "30s"
    # floor without an explicit delay gets a bounded default
    opts = kafka_reader_options(
        "b:9092", ["t"], min_offsets_per_trigger=1_000, streaming=True
    )
    assert opts["maxTriggerDelay"] == "15m"
    # batch mode ignores trigger pacing entirely
    opts = kafka_reader_options(
        "b:9092", ["t"], min_offsets_per_trigger=1_000, streaming=False
    )
    assert "minOffsetsPerTrigger" not in opts


def test_stream_and_batch_readers_build_from_options(spark):
    """The reader builders execute against the real DataStreamReader /
    DataFrameReader surface (no broker needed to BUILD the plan source)."""
    from kafka_to_nexus_spark.streaming import job as J

    assert J.kafka_stream_reader(
        spark, "b:9092", ["t"], start_time_ms=10_000
    ) is not None
    assert J.kafka_batch_reader(
        spark, "b:9092", ["t"], start_time_ms=10_000, stop_time_ms=15_000
    ) is not None
