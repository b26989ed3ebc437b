"""C6 metrics registry + sinks (src/Metrics analog)."""

from __future__ import annotations

import logging

from kafka_to_nexus_spark.metrics import (
    FileSink,
    LogSink,
    Metric,
    Registrar,
    Reporter,
    Severity,
    registrar_from_counts,
)


def test_registrar_prefixes_and_dedups():
    root = Registrar()
    writer = root.prefixed("writer")
    src = writer.prefixed("topic1.source_a")
    m = src.register("messages_received", "messages seen")
    m += 3
    m.increment(2)
    assert m.value == 5
    # same full name → same metric object (Registrar re-registration)
    again = src.register("messages_received")
    assert again is m
    assert root.snapshot() == {"writer.topic1.source_a.messages_received": 5}


def test_deregister_removes_from_snapshot():
    root = Registrar()
    m = root.register("gone")
    assert "gone" in root.snapshot()
    root.deregister(m)
    assert root.snapshot() == {}


def test_log_sink_reports_only_error_severity(caplog):
    root = Registrar()
    root.register("quiet", "dbg", Severity.DEBUG).set(1)
    root.register("loud", "errors seen", Severity.ERROR).set(7)
    sink = LogSink(logging.getLogger("test.metrics"))
    with caplog.at_level(logging.ERROR, logger="test.metrics"):
        sink.report(root.metrics(), now=123.0)
    assert len(caplog.records) == 1
    assert "loud = 7" in caplog.records[0].getMessage()


def test_file_sink_writes_carbon_lines(tmp_path):
    root = Registrar()
    root.register("writer.a", "").set(4)
    root.register("writer.b", "").set(9)
    path = tmp_path / "carbon.txt"
    Reporter(root, FileSink(path), clock=lambda: 1700000000.0).report_once()
    lines = sorted(path.read_text().splitlines())
    assert lines == ["writer.a 4 1700000000", "writer.b 9 1700000000"]


def test_reporter_thread_flushes_on_stop(tmp_path):
    root = Registrar()
    root.register("n").set(1)
    path = tmp_path / "out.txt"
    rep = Reporter(root, FileSink(path), interval_s=0.05)
    rep.start()
    import time as _t

    # poll for at least one periodic flush instead of trusting a fixed
    # sleep (a starved CI box can schedule the thread zero times in 200 ms)
    deadline = _t.time() + 5.0
    while _t.time() < deadline:
        if path.exists() and path.read_text().splitlines():
            break
        _t.sleep(0.02)
    rep.stop()
    assert len(path.read_text().splitlines()) >= 2  # interval + final flush


def test_run_job_publishes_to_registrar(spark, tmp_path):
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.runner import run_job
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

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
    msgs = [{"schema": "f144", "topic": "t", "source_name": "s",
             "kafka_timestamp": 11_000, "timestamp": 11_000,
             "value": 1.0, "offset": 0}]
    start = StartMessage(job_id="mreg", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    root = Registrar()
    run_job(spark, start, messages_from_json(spark, msgs),
            str(tmp_path / "o"), registrar=root)
    snap = root.snapshot()
    assert snap["writer.mreg.messages_received"] == 1
    assert snap["writer.mreg.flatbuffer_errors"] == 0
    assert "writer.mreg.approx_file_size_mb" in snap


def test_registrar_from_counts_bridge():
    reg = registrar_from_counts({"a": 1, "b": 2}, "writer.j1")
    assert reg.snapshot() == {"writer.j1.a": 1, "writer.j1.b": 2}


def test_streaming_finalize_publishes_to_registrar(spark, tmp_path):
    import json as _json

    from conftest import DOMAIN_TEMPLATES
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json
    from kafka_to_nexus_spark.streaming.job import StreamingJob

    tpl = _json.loads((DOMAIN_TEMPLATES / "buffered_template.json").read_text())
    start = StartMessage(job_id="sreg", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    job = StreamingJob(spark, start, str(tmp_path / "out"))
    job.registrar = Registrar()
    job.process_batch(messages_from_json(spark, [
        {"schema": "f144", "topic": "local_choppers",
         "source_name": "local:choppers:delay", "kafka_timestamp": 11_000,
         "timestamp": 11_000, "value": 1.0, "offset": 0}]), 0)
    job.finalize()
    snap = job.registrar.snapshot()
    assert snap["writer.sreg.messages_received"] == 1
