"""Control-plane tests — the Handler/Master FSM contract (reference
integration-test behaviors: idle heartbeats, start/stop validation,
pool claim, invalid-input rejection)."""

from __future__ import annotations

import json
import uuid

import pytest

from kafka_to_nexus_spark.control.commands import (
    CommandError,
    JobController,
    JobPool,
    WorkerState,
    parse_start,
    parse_stop,
)

JOB_ID = str(uuid.uuid4())


def start_msg(**overrides):
    msg = {
        "job_id": JOB_ID,
        "filename": "out.h5",
        "nexus_structure": {"children": []},
        "start_time": 10_000,
        "stop_time": 15_000,
    }
    msg.update(overrides)
    return msg


def test_parse_start_required_fields():
    with pytest.raises(CommandError, match="job_id"):
        parse_start(start_msg(job_id=""))
    with pytest.raises(CommandError, match="filename"):
        parse_start(start_msg(filename=""))
    with pytest.raises(CommandError, match="nexus_structure"):
        parse_start(start_msg(nexus_structure=None))


def test_parse_start_rejects_inverted_window():
    with pytest.raises(CommandError, match="not after"):
        parse_start(start_msg(start_time=15_000, stop_time=10_000))


def test_parse_start_json_string_structure():
    s = parse_start(start_msg(nexus_structure='{"children": []}'))
    assert s.nexus_structure == {"children": []}
    with pytest.raises(CommandError, match="not valid JSON"):
        parse_start(start_msg(nexus_structure="{nope"))


def test_parse_stop_defaults():
    s = parse_stop({"job_id": JOB_ID})
    assert s.stop_time_ms is None  # stop-now semantics


def test_fsm_start_stop_cycle():
    c = JobController()
    assert c.state is WorkerState.IDLE
    resp = c.handle_start(start_msg())
    assert resp.accepted and resp.status_code == 201
    assert c.state is WorkerState.WRITING

    # second start rejected while writing
    r2 = c.handle_start(start_msg(job_id=str(uuid.uuid4())))
    assert not r2.accepted and r2.status_code == 400

    # stop with wrong job id rejected
    r3 = c.handle_stop({"job_id": str(uuid.uuid4())})
    assert not r3.accepted and "mismatch" in r3.message

    # stop retargets stop time
    r4 = c.handle_stop({"job_id": JOB_ID, "stop_time": 14_000})
    assert r4.accepted and c.current_job.stop_time_ms == 14_000

    # stop-now
    r5 = c.handle_stop({"job_id": JOB_ID}, now_ms=12_345)
    assert r5.accepted and c.current_job.stop_time_ms == 12_345

    c.set_idle()
    assert c.state is WorkerState.IDLE and c.current_job is None


def test_fsm_rejects_non_uuid_job_id():
    c = JobController()
    resp = c.handle_start(start_msg(job_id="not-a-uuid"))
    assert not resp.accepted and "UUID" in resp.message
    assert c.state is WorkerState.IDLE


def test_fsm_stop_before_start_rejected():
    c = JobController()
    c.handle_start(start_msg())
    r = c.handle_stop({"job_id": JOB_ID, "stop_time": 5_000})
    assert not r.accepted and "before start" in r.message


def test_status_heartbeat_shape():
    c = JobController()
    idle = c.status()
    assert idle["state"] == "idle" and idle["job_id"] == ""
    c.handle_start(start_msg())
    writing = c.status()
    assert writing["state"] == "writing"
    assert writing["job_id"] == JOB_ID
    assert writing["file_being_written"] == "out.h5"
    assert writing["update_interval"] == 2000


def test_finished_writing_report():
    c = JobController()
    c.handle_start(start_msg())
    ok = c.finished_writing()
    assert ok["job_id"] == JOB_ID and not ok["error_encountered"]
    err = c.finished_writing("boom")
    assert err["error_encountered"] and err["message"] == "boom"


def test_job_pool_claim_semantics():
    pool = JobPool()
    a, b = JobController(service_id="w1"), JobController(service_id="w2")
    pool.offer(start_msg())
    r = pool.claim(a)
    assert r.accepted and a.state is WorkerState.WRITING
    # second worker finds the pool empty (offset committed = claimed)
    assert pool.claim(b) is None
    # busy worker never claims
    pool.offer(start_msg(job_id=str(uuid.uuid4())))
    assert pool.claim(a) is None
    r2 = pool.claim(b)
    assert r2.accepted and b.state is WorkerState.WRITING


def test_full_job_lifecycle_pool_to_wrdn(spark, tmp_path):
    """Integration-style: pool claim → status(writing) → batch job runs →
    wrdn report → idle → next pool job claimable. Mirrors the reference's
    integration tests (two writers / start-stop / pool rejoin) Kafka-free."""
    import json as _json
    import uuid as _uuid

    from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
    from kafka_to_nexus_spark.runner import run_job
    from kafka_to_nexus_spark.sources.fixtures import messages_from_file

    structure = _json.loads(
        (DOMAIN_TEMPLATES / "writer_modules_template.json").read_text()
    )
    pool, ctl = JobPool(), JobController()
    job_ids = [str(_uuid.uuid4()), str(_uuid.uuid4())]
    for i, jid in enumerate(job_ids):
        pool.offer(
            {
                "job_id": jid,
                "filename": f"out_{i}.nxs",
                "nexus_structure": structure,
                "start_time": 10_000,
                "stop_time": 15_000,
            }
        )

    for i, jid in enumerate(job_ids):
        resp = pool.claim(ctl)
        assert resp is not None and resp.accepted and resp.job_id == jid
        # claiming while writing yields nothing (pool rejoin happens at idle)
        assert pool.claim(ctl) is None
        st = ctl.status()
        assert st["state"] == "writing" and st["file_being_written"] == f"out_{i}.nxs"

        res = run_job(
            spark,
            ctl.current_job,
            messages_from_file(spark, DOMAIN_DATA / "writer_modules_data.json"),
            str(tmp_path / f"job_{i}"),
        )
        assert res.metrics["messages_received"] > 0

        wrdn = ctl.finished_writing(metadata=_json.dumps(
            {k: v for k, v in res.metadata_values.items() if "average" in k}
        ))
        assert wrdn["job_id"] == jid and not wrdn["error_encountered"]
        ctl.set_idle()
        assert ctl.status()["state"] == "idle"

    assert pool.claim(ctl) is None  # pool drained


def test_stop_command_retargets_running_streaming_job(spark, tmp_path):
    import json as _json
    import uuid as _uuid

    from conftest import DOMAIN_TEMPLATES
    from kafka_to_nexus_spark.control.commands import apply_stop_to_job
    from kafka_to_nexus_spark.streaming.job import StreamingJob

    tpl = _json.loads((DOMAIN_TEMPLATES / "buffered_template.json").read_text())
    jid = str(_uuid.uuid4())
    ctl = JobController()
    resp = ctl.handle_start({
        "job_id": jid, "filename": "f", "nexus_structure": tpl,
        "start_time": 10_000, "stop_time": 60_000,
    })
    assert resp.accepted
    job = StreamingJob(spark, ctl.current_job, str(tmp_path / "out"))
    assert job.stop_ns == 60_000 * 1_000_000

    # wrong job id rejected, job untouched
    bad = apply_stop_to_job(ctl, job, {"job_id": str(_uuid.uuid4()), "stop_time": 12_000})
    assert not bad.accepted and job.stop_ns == 60_000 * 1_000_000

    ok = apply_stop_to_job(ctl, job, {"job_id": jid, "stop_time": 12_000})
    assert ok.accepted and job.stop_ns == 12_000 * 1_000_000


# --------------------------------------------------------------------------
# C1/C4 transport: claim-once semantics + response production
# --------------------------------------------------------------------------

def _start_msg(job_id=None):
    import uuid as _uuid

    return {
        "job_id": job_id or str(_uuid.uuid4()),
        "filename": "f.nxs",
        "nexus_structure": {"children": []},
        "start_time": 10_000,
        "stop_time": 20_000,
    }


def test_file_pool_claim_once(tmp_path):
    """Exactly one of N contending workers claims a job (the offset-commit
    guarantee of Handler.cpp:45-53, via atomic rename)."""
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    producer = FilePoolTransport(tmp_path, "producer")
    producer.offer(_start_msg())

    workers = [FilePoolTransport(tmp_path, f"w{i}") for i in range(3)]
    claims = [w.try_claim() for w in workers]
    assert sum(c is not None for c in claims) == 1


def test_claim_into_drives_fsm_and_answers(tmp_path):
    from kafka_to_nexus_spark.control.commands import JobController, WorkerState
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    t = FilePoolTransport(tmp_path, "w0")
    msg = _start_msg()
    t.offer(msg)
    ctl = JobController()
    resp = t.claim_into(ctl)
    assert resp is not None and resp.accepted
    assert ctl.state is WorkerState.WRITING
    assert ctl.current_job.job_id == msg["job_id"]
    answers = t.read_responses()
    assert answers and answers[0]["type"] == "answ" and answers[0]["accepted"]

    # second poll: pool drained
    assert t.claim_into(ctl) is None

    # busy worker rejects a second job; the command is consumed + answered
    t.offer(_start_msg())
    resp2 = t.claim_into(ctl)
    assert resp2 is not None and not resp2.accepted
    assert len(t.read_responses()) == 2


def test_malformed_start_rejected_with_answ(tmp_path):
    from kafka_to_nexus_spark.control.commands import JobController
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    t = FilePoolTransport(tmp_path, "w0")
    t.offer({"job_id": "not-a-uuid", "filename": "f",
             "nexus_structure": {"children": []}})
    resp = t.claim_into(JobController())
    assert resp is not None and not resp.accepted
    assert "UUID" in resp.message


def test_wrdn_and_status_production(tmp_path):
    from kafka_to_nexus_spark.control.commands import JobController
    from kafka_to_nexus_spark.control.transport import FilePoolTransport

    t = FilePoolTransport(tmp_path, "w0")
    ctl = JobController()
    t.offer(_start_msg())
    t.claim_into(ctl)
    t.send_status(ctl.status())
    t.send_finished(ctl.finished_writing())
    kinds = [r["type"] for r in t.read_responses()]
    assert kinds == ["answ", "wrdn"]
    status = (tmp_path / "status.jsonl").read_text().splitlines()
    assert json.loads(status[0])["state"] == "writing"


def test_two_workers_drain_pool_each_job_written_once(spark, tmp_path):
    """Reference integration-tests/test_filewriter.py:262 (two writers,
    three files): N contending workers drain the pool; every job is
    claimed by exactly one worker, runs to wrdn, and the worker rejoins
    the pool at idle."""
    import json as _json
    import uuid as _uuid

    from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
    from kafka_to_nexus_spark.control.transport import FilePoolTransport
    from kafka_to_nexus_spark.runner import run_job
    from kafka_to_nexus_spark.sources.fixtures import messages_from_file

    structure = _json.loads(
        (DOMAIN_TEMPLATES / "writer_modules_template.json").read_text()
    )
    producer = FilePoolTransport(tmp_path / "pool", "producer")
    job_ids = [str(_uuid.uuid4()) for _ in range(3)]
    for i, jid in enumerate(job_ids):
        producer.offer({
            "job_id": jid, "filename": f"out_{i}.nxs",
            "nexus_structure": structure,
            "start_time": 10_000, "stop_time": 15_000,
        })

    workers = {
        w: (FilePoolTransport(tmp_path / "pool", w), JobController(service_id=w))
        for w in ("w0", "w1")
    }
    messages = messages_from_file(spark, DOMAIN_DATA / "writer_modules_data.json")
    runs: dict[str, str] = {}  # job_id -> worker that ran it
    for _round in range(4):  # alternate claim attempts until drained
        for wname, (t, ctl) in workers.items():
            resp = t.claim_into(ctl)
            if resp is None or not resp.accepted:
                continue
            jid = ctl.current_job.job_id
            assert jid not in runs, "job claimed twice"
            res = run_job(spark, ctl.current_job, messages,
                          str(tmp_path / f"run_{jid[:8]}"))
            assert res.metrics["messages_received"] > 0
            t.send_finished(ctl.finished_writing())
            ctl.set_idle()  # pool rejoin (integration test :197)
            runs[jid] = wname
    assert sorted(runs) == sorted(job_ids)
    assert set(runs.values()) == {"w0", "w1"}  # both workers participated
    assert producer.pending() == []


def test_future_window_job_writes_clean_empty_output(spark, tmp_path):
    """Reference integration-tests/test_filewriter.py:394: a job whose
    window lies entirely after the available data still produces a valid,
    structurally complete file: f144 carries exactly the buffered
    last-before-start value (the F3 as-of contract also asserted by
    domain test_buffered.py), ev44 writes nothing (buffered messages are
    discarded, ev44_Writer.cpp:94-97), and the mdat start/end times are
    recorded (the assertions of integration test :394)."""
    import json as _json

    import pyarrow.parquet as pq

    from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.runner import run_job
    from kafka_to_nexus_spark.sinks import hdf5, hdf5lib, staging
    from kafka_to_nexus_spark.sources.fixtures import messages_from_file

    structure = _json.loads(
        (DOMAIN_TEMPLATES / "writer_modules_template.json").read_text()
    )
    start = StartMessage(
        job_id=str(uuid.uuid4()), filename="future.nxs",
        nexus_structure=structure,
        start_time_ms=10_000_000, stop_time_ms=20_000_000,
    )
    out = str(tmp_path / "future_job")
    res = run_job(
        spark, start,
        messages_from_file(spark, DOMAIN_DATA / "writer_modules_data.json"),
        out,
    )
    assert res.metrics["messages_received"] > 0  # data existed, none in window
    meta = staging.read_meta(out)
    f144 = [s for s in meta["streams"] if s["module"] == "f144"][0]
    t = pq.read_table(staging.dataset_dir(out, f144["path"], "log")).to_pandas()
    # exactly the as-of row: the latest pre-start value, nothing else
    assert list(t["value"]) == [15.0] and list(t["time"]) == [10110000000]
    ev44 = [s for s in meta["streams"] if s["module"] == "ev44"]
    if ev44:
        ev = pq.read_table(staging.dataset_dir(out, ev44[0]["path"], "events"))
        assert ev.num_rows == 0  # ev44 discards buffered messages
    # mdat start/end times recorded even though no data arrived in-window
    mdat_vals = {k: v for k, v in res.metadata_values.items()
                 if k.endswith("start_time") or k.endswith("end_time")}
    assert mdat_vals, res.metadata_values
    hdf_path = str(tmp_path / "future.nxs")
    hdf5.pack(out, hdf_path)
    with hdf5lib.File(hdf_path, "r") as f:
        assert list(f[f144["path"] + "/value"][()]) == [15.0]


def test_malformed_pool_head_is_consumed():
    """A malformed start at the queue head is consumed-and-answered (the
    transport contract) — it must not wedge the pool and starve the valid
    jobs queued behind it."""
    import uuid as _uuid

    from kafka_to_nexus_spark.control.commands import JobController, JobPool

    pool = JobPool()
    pool.offer({"job_id": "not-a-uuid", "filename": "f",
                "nexus_structure": {"children": []}})
    good_id = str(_uuid.uuid4())
    pool.offer({"job_id": good_id, "filename": "g",
                "nexus_structure": {"children": []}})
    c = JobController()
    r1 = pool.claim(c)
    assert r1 is not None and not r1.accepted
    r2 = pool.claim(c)
    assert r2 is not None and r2.accepted and r2.job_id == good_id
