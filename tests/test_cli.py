"""CLI parity with the reference apps (file-maker / template-maker)."""

from __future__ import annotations

import json

import numpy as np

from kafka_to_nexus_spark.__main__ import main
from kafka_to_nexus_spark.sinks import hdf5lib

TEMPLATES = "/root/reference/domain-tests/nexus_templates"
DATA = "/root/reference/domain-tests/data_files"


def test_file_maker_end_to_end(tmp_path, capsys):
    out = tmp_path / "out.nxs"
    rc = main([
        "file-maker",
        "-f", f"{TEMPLATES}/writer_modules_template.json",
        "-d", f"{DATA}/writer_modules_data.json",
        "-o", str(out),
        "--staging", str(tmp_path / "staging"),
        "--start-ms", "10000", "--stop-ms", "15000",
        "--master", "local[4]",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["metrics"]["messages_received"] > 0
    with hdf5lib.File(str(out), "r") as f:
        assert np.array_equal(
            f["/entry/instrument/chopper/rotation_speed/value"][:], [10.0, 15.0]
        )


def test_template_maker_statics_only(tmp_path, capsys):
    out = tmp_path / "tpl.nxs"
    rc = main([
        "template-maker",
        "-f", f"{TEMPLATES}/static_information_template.json",
        "-o", str(out),
        "--staging", str(tmp_path / "staging"),
        "--master", "local[4]",
    ])
    assert rc == 0
    with hdf5lib.File(str(out), "r") as f:
        assert f["/entry"] is not None


def test_worker_full_loop_broker_free(tmp_path, spark):
    """C1→K1 end to end: pool claim → streaming query over fixtures →
    finalize → wrdn on the response channel."""
    import uuid

    from kafka_to_nexus_spark.__main__ import main
    from kafka_to_nexus_spark.control.transport import FilePoolTransport
    from kafka_to_nexus_spark.sources.fixtures import _normalize_row

    pool = tmp_path / "pool"
    fixtures = tmp_path / "in"
    fixtures.mkdir()
    rows = [
        {"schema": "f144", "topic": "local_choppers",
         "source_name": "local:choppers:delay", "kafka_timestamp": 11_000,
         "timestamp": 11_000, "value": 5.0, "offset": 0},
        {"schema": "f144", "topic": "local_choppers",
         "source_name": "local:choppers:delay", "kafka_timestamp": 12_000,
         "timestamp": 12_000, "value": 6.0, "offset": 1},
    ]
    offsets: dict = {}
    (fixtures / "data.json").write_text(
        "\n".join(json.dumps(_normalize_row(r, offsets)) for r in rows))

    tpl = json.loads(open(
        "/root/reference/domain-tests/nexus_templates/buffered_template.json"
    ).read())
    producer = FilePoolTransport(pool, "producer")
    jid = str(uuid.uuid4())
    # filename with a directory component: the worker must create it
    # under out_root (hdf_output_prefix semantics)
    producer.offer({"job_id": jid, "filename": "runs/f.nxs",
                    "nexus_structure": tpl, "metadata": '{"proposal": 42}',
                    "start_time": 10_000, "stop_time": 15_000})

    rc = main([
        "kafka-to-nexus", "--transport", "file", "--pool-dir", str(pool),
        "--worker-id", "w0", "--out-root", str(tmp_path / "jobs"),
        "--fixture-dir", str(fixtures), "--once", "--master", "local[4]",
        "--live-snapshot-interval", "1",
    ])
    assert rc == 0
    responses = producer.read_responses()
    kinds = [r["type"] for r in responses]
    assert kinds == ["answ", "wrdn"]
    assert responses[1]["job_id"] == jid and not responses[1]["error_encountered"]
    # wrdn reports the FULL written path and echoes the pl72 metadata
    # (Master.cpp:144-153)
    assert responses[1]["file_name"] == str(tmp_path / "jobs" / "runs" / "f.nxs")
    assert responses[1]["metadata"] == '{"proposal": 42}'
    out_dir = tmp_path / "jobs" / jid
    assert (out_dir / "_nexus_meta.json").exists()
    # the worker materializes the pl72 filename under out_root (K5 pack at
    # close; mid-run, --live-snapshot-interval republished the same path)
    with hdf5lib.File(str(tmp_path / "jobs" / "runs" / "f.nxs"), "r") as f:
        assert list(f["/entry/instrument/chopper/delay/value"][:]) == [5.0, 6.0]


def test_worker_status_heartbeats_and_alt_channel(tmp_path, spark):
    """C5: idle/writing x5f2 heartbeats; a start with control_topic
    redirects status there until idle (Master.cpp:74-76, reverted at
    setToIdle), then the idle heartbeat lands back on the default
    channel."""
    import uuid

    from kafka_to_nexus_spark.__main__ import main
    from kafka_to_nexus_spark.control.transport import FilePoolTransport
    from kafka_to_nexus_spark.sources.fixtures import _normalize_row

    pool = tmp_path / "pool"
    fixtures = tmp_path / "in"
    fixtures.mkdir()
    offsets: dict = {}
    (fixtures / "data.json").write_text(json.dumps(_normalize_row(
        {"schema": "f144", "topic": "local_choppers",
         "source_name": "local:choppers:delay", "kafka_timestamp": 11_000,
         "timestamp": 11_000, "value": 5.0, "offset": 0}, offsets)))

    tpl = json.loads(open(
        "/root/reference/domain-tests/nexus_templates/buffered_template.json"
    ).read())
    producer = FilePoolTransport(pool, "producer")
    jid = str(uuid.uuid4())
    producer.offer({"job_id": jid, "filename": "f.nxs", "nexus_structure": tpl,
                    "start_time": 10_000, "stop_time": 15_000,
                    "control_topic": "alt_status"})

    rc = main([
        "kafka-to-nexus", "--transport", "file", "--pool-dir", str(pool),
        "--worker-id", "w0", "--out-root", str(tmp_path / "jobs"),
        "--fixture-dir", str(fixtures), "--once", "--master", "local[4]",
    ])
    assert rc == 0
    default = [json.loads(l) for l in
               (pool / "status.jsonl").read_text().splitlines()]
    alt = [json.loads(l) for l in
           (pool / "status_alt_status.jsonl").read_text().splitlines()]
    # writing status went to the alternative channel
    assert any(s["state"] == "writing" and s["job_id"] == jid for s in alt)
    # idle heartbeat (pre-claim) and the post-job idle revert on default
    assert default[0]["state"] == "idle"
    assert default[-1]["state"] == "idle"
    assert all(s["state"] != "writing" for s in default)


def test_worker_survives_failing_job_and_reports_wrdn_error(tmp_path, spark):
    """A job that raises mid-run produces wrdn with error_encountered and
    returns the worker to idle instead of killing the loop (Master
    catches job errors; FeedbackProducer carries them in wrdn)."""
    import uuid

    from kafka_to_nexus_spark.__main__ import main
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    pool = tmp_path / "pool"
    fixtures = tmp_path / "in"
    fixtures.mkdir()
    (fixtures / "data.json").write_text("{}")  # schemaless row: harmless

    producer = FilePoolTransport(pool, "producer")
    jid = str(uuid.uuid4())
    # unknown writer module → plan-time failure inside the job run
    producer.offer({
        "job_id": jid, "filename": "f.nxs",
        "nexus_structure": {"children": [{
            "type": "group", "name": "g",
            "children": [{"module": "nope", "config": {"topic": "t", "source": "s"}}],
        }]},
        "start_time": 10_000, "stop_time": 15_000,
    })
    rc = main([
        "kafka-to-nexus", "--transport", "file", "--pool-dir", str(pool),
        "--worker-id", "w0", "--out-root", str(tmp_path / "jobs"),
        "--fixture-dir", str(fixtures), "--once", "--master", "local[4]",
    ])
    assert rc == 1
    wrdn = [r for r in producer.read_responses() if r["type"] == "wrdn"]
    assert wrdn and wrdn[0]["error_encountered"]
    assert "nope" in wrdn[0]["message"]
    # worker reverted to idle on the default status channel
    statuses = [json.loads(l) for l in (pool / "status.jsonl").read_text().splitlines()]
    assert statuses[-1]["state"] == "idle"


def test_worker_rejects_escaping_filename_via_wrdn(tmp_path, spark):
    """The pl72 filename is Kafka-controlled: a relative path that climbs
    out of out_root via '..' is a JOB error (wrdn error_encountered, worker
    survives to idle), and nothing is written outside the prefix."""
    import uuid

    from kafka_to_nexus_spark.__main__ import main
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    pool = tmp_path / "pool"
    fixtures = tmp_path / "in"
    fixtures.mkdir()
    (fixtures / "data.json").write_text("{}")

    out_root = tmp_path / "jobs"
    escape_target = tmp_path / "evil.nxs"  # would land OUTSIDE out_root
    tpl = json.loads(open(
        "/root/reference/domain-tests/nexus_templates/buffered_template.json"
    ).read())
    producer = FilePoolTransport(pool, "producer")
    jid = str(uuid.uuid4())
    producer.offer({"job_id": jid, "filename": "../evil.nxs",
                    "nexus_structure": tpl,
                    "start_time": 10_000, "stop_time": 15_000})
    rc = main([
        "kafka-to-nexus", "--transport", "file", "--pool-dir", str(pool),
        "--worker-id", "w0", "--out-root", str(out_root),
        "--fixture-dir", str(fixtures), "--once", "--master", "local[4]",
    ])
    assert rc == 1
    wrdn = [r for r in producer.read_responses() if r["type"] == "wrdn"]
    assert wrdn and wrdn[0]["error_encountered"]
    assert "escapes" in wrdn[0]["message"]
    assert not escape_target.exists()
    statuses = [json.loads(l) for l in (pool / "status.jsonl").read_text().splitlines()]
    assert statuses[-1]["state"] == "idle"


def test_worker_wire_sequence_matches_reference_contract(tmp_path, spark):
    """Wire-sequence parity with the reference's blank-file message test
    (integration-tests/test_filewriter.py:83-145): over one job lifecycle
    the response channel carries the start answer FIRST and the wrdn LAST
    (exactly one), the wrdn forwards the pl72 metadata verbatim and the
    written file path, and the status stream shows writing-with-job-id
    before reverting to idle. (The reference's pl72/6s4t echoes come from
    commands sharing the Kafka topic — the file transport keeps commands
    in pool files, so the response channel contract is answ* then wrdn.)"""
    import uuid

    from kafka_to_nexus_spark.__main__ import main
    from kafka_to_nexus_spark.control.transport import FilePoolTransport
    from kafka_to_nexus_spark.sources.fixtures import _normalize_row

    pool = tmp_path / "pool"
    fixtures = tmp_path / "in"
    fixtures.mkdir()
    offsets: dict = {}
    (fixtures / "data.json").write_text(json.dumps(_normalize_row(
        {"schema": "f144", "topic": "local_choppers",
         "source_name": "local:choppers:delay", "kafka_timestamp": 11_000,
         "timestamp": 11_000, "value": 5.0, "offset": 0}, offsets)))
    tpl = json.loads(open(
        "/root/reference/domain-tests/nexus_templates/buffered_template.json"
    ).read())
    metadata = json.dumps({"hello": 123})
    producer = FilePoolTransport(pool, "producer")
    jid = str(uuid.uuid4())
    producer.offer({"job_id": jid, "filename": "seq.nxs",
                    "nexus_structure": tpl, "metadata": metadata,
                    "start_time": 10_000, "stop_time": 15_000})
    rc = main([
        "kafka-to-nexus", "--transport", "file", "--pool-dir", str(pool),
        "--worker-id", "w0", "--out-root", str(tmp_path / "jobs"),
        "--fixture-dir", str(fixtures), "--once", "--master", "local[4]",
    ])
    assert rc == 0
    resp = producer.read_responses()
    kinds = [r["type"] for r in resp]
    assert kinds[0] == "answ" and resp[0]["accepted"] and resp[0]["job_id"] == jid
    assert kinds[-1] == "wrdn" and kinds.count("wrdn") == 1
    wrdn = resp[-1]
    assert wrdn["metadata"] == metadata
    assert wrdn["file_name"].endswith("seq.nxs")
    assert not wrdn.get("error_encountered")
    statuses = [json.loads(l) for l in
                (pool / "status.jsonl").read_text().splitlines()]
    writing = [s for s in statuses if s["state"] == "writing"]
    assert writing and writing[0]["job_id"] == jid
    assert statuses[-1]["state"] == "idle"
