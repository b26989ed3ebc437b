"""Live-broker integration tier (reference parity:
integration-tests/test_filewriter.py:146,197,262 run against real Kafka).

These tests exercise the ONE leg the fake-broker tier cannot reach: the
real `KafkaPoolTransport` (kafka-python consumer/producer, claim = offset
commit) and the real `readStream.format("kafka")` source with
`startingOffsetsByTimestamp` time→offset pushdown.

Gating: skipped unless the environment provides a broker via
``KAFKA_BROKERS`` (e.g. ``KAFKA_BROKERS=localhost:9092 pytest
tests/test_live_broker.py``). kafka-python and the Spark Kafka connector
(org.apache.spark:spark-sql-kafka-0-10) must also be present; each is
skip-reported separately so a partial environment is diagnosable. Until a
broker exists, the in-process fake tier (tests/test_kafka_arm.py) stands.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

BROKERS = os.environ.get("KAFKA_BROKERS", "")

pytestmark = pytest.mark.skipif(
    not BROKERS, reason="KAFKA_BROKERS not set (live-broker tier)"
)


@pytest.fixture(scope="module")
def kafka_python():
    return pytest.importorskip(
        "kafka", reason="kafka-python required for the live-broker tier"
    )


@pytest.fixture(scope="module")
def kafka_connector(spark):
    """Skip (not fail) when the Spark Kafka connector jar is absent."""
    try:
        (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", BROKERS)
            .option("subscribe", f"probe_{uuid.uuid4().hex[:8]}")
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load()
            .schema
        )
    except Exception as exc:  # noqa: BLE001 - classify, then re-raise
        if "Failed to find data source" in str(exc):
            pytest.skip("spark-sql-kafka connector not on the classpath")
        raise
    return True


def test_pool_transport_claims_once_and_reports(kafka_python):
    """C1 against a real broker: produce two jobs on a fresh pool topic,
    claim them sequentially (claim = manual offset commit, so each job is
    delivered exactly once and the pool drains), report finished; the
    response topic carries the answs then the wrdn.

    One worker claims both on purpose: the pool group shares a group_id by
    design, so on a 1-partition auto-created topic a second consumer would
    sit unassigned — multi-worker claim exclusivity is the offset commit
    itself, asserted here by the drained pool, and partition assignment is
    the broker's concern. Cross-partition order is not guaranteed either,
    hence the set comparison."""
    from kafka import KafkaConsumer, KafkaProducer

    from kafka_to_nexus_spark.control.commands import JobController
    from kafka_to_nexus_spark.control.transport import make_transport

    pool = f"job_pool_{uuid.uuid4().hex[:12]}"
    jid1, jid2 = str(uuid.uuid4()), str(uuid.uuid4())
    producer = KafkaProducer(bootstrap_servers=BROKERS)
    for jid in (jid1, jid2):
        producer.send(
            pool,
            json.dumps(
                {
                    "job_id": jid,
                    "filename": "out.nxs",
                    "nexus_structure": {"children": []},
                    "start_time_ms": 10_000,
                    "stop_time_ms": 15_000,
                }
            ).encode(),
        )
    producer.flush()

    w = make_transport("kafka", brokers=BROKERS, pool_topic=pool, worker_id="w1")

    deadline = time.monotonic() + 60
    claimed = []
    while len(claimed) < 2 and time.monotonic() < deadline:
        r = w.claim_into(JobController())
        if r is not None:
            assert r.accepted
            claimed.append(r.job_id)
    assert set(claimed) == {jid1, jid2}, claimed
    assert w.try_claim() is None  # pool drained, claims committed

    w.send_finished({"job_id": claimed[0], "error_encountered": False})
    w._producer.flush()

    responses = KafkaConsumer(
        f"{pool}_responses",
        bootstrap_servers=BROKERS,
        auto_offset_reset="earliest",
        consumer_timeout_ms=15_000,
    )
    kinds = [json.loads(m.value)["type"] for m in responses]
    assert kinds.count("answ") == 2 and kinds[-1] == "wrdn", kinds


def test_streaming_job_reads_kafka_with_time_pushdown(
    spark, tmp_path, kafka_python, kafka_connector
):
    """S1/S2/K1 against a real broker: produce binary f144 FlatBuffers with
    record timestamps straddling the job window, run the REAL
    readStream.format("kafka") query (startingOffsetsByTimestamp resolves
    start−lookback to offsets), and assert the staged output holds exactly
    the in-window rows — matching what the fixture-path job produces."""
    from kafka import KafkaProducer

    from kafka_to_nexus_spark.fbs.ess import encode_f144_double
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.sinks import staging
    from kafka_to_nexus_spark.streaming.job import run_streaming_job

    topic = f"live_choppers_{uuid.uuid4().hex[:12]}"
    src = "live:choppers:delay"
    now_ms = int(time.time() * 1000)
    start_ms, stop_ms = now_ms - 60_000, now_ms + 60_000

    producer = KafkaProducer(bootstrap_servers=BROKERS)
    # one pre-start message (as-of buffered), two in-window, one past stop
    for ts_ms, value in (
        (start_ms - 5_000, 1.0),
        (start_ms + 1_000, 5.0),
        (start_ms + 2_000, 6.0),
        (stop_ms + 120_000, 9.0),
    ):
        producer.send(
            topic,
            value=encode_f144_double(src, value, ts_ms),
            timestamp_ms=ts_ms,
        )
    producer.flush()

    structure = {
        "children": [
            {
                "name": "entry",
                "type": "group",
                "children": [
                    {
                        "name": "delay",
                        "type": "group",
                        "children": [
                            {
                                "module": "f144",
                                "config": {
                                    "topic": topic,
                                    "source": src,
                                    "dtype": "double",
                                },
                            }
                        ],
                    }
                ],
            }
        ]
    }
    start = StartMessage(
        job_id=f"live-{uuid.uuid4().hex[:8]}",
        filename="live.nxs",
        nexus_structure=structure,
        start_time_ms=start_ms,
        stop_time_ms=stop_ms,
    )
    query, job = run_streaming_job(
        spark,
        start,
        BROKERS,
        str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        value_format="flatbuffers",
    )
    query.awaitTermination(120)
    job.finalize()

    log_dir = staging.dataset_dir(job.out_dir, "/entry/delay", "log")
    rows = sorted(
        (r.time, r.value)
        for r in spark.read.parquet(str(log_dir)).collect()
    )
    ns = 1_000_000
    assert rows == [
        ((start_ms - 5_000) * ns, 1.0),  # as-of buffered row emitted
        ((start_ms + 1_000) * ns, 5.0),
        ((start_ms + 2_000) * ns, 6.0),
    ], rows
