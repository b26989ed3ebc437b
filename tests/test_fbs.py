"""FlatBuffers binary path: runtime invariants, per-schema round-trips,
and the binary twin of the domain-test pipeline (generator → decoder →
run_job goldens — reference domain-tests/test_writer_modules.py:18-41)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
from kafka_to_nexus_spark import fbs
from kafka_to_nexus_spark.fbs import ess
from kafka_to_nexus_spark.fbs.runtime import file_identifier


def test_file_identifier_at_bytes_4_to_8():
    buf = ess.encode_f144_double("src", 1.5, 1000)
    assert buf[4:8] == b"f144"
    assert file_identifier(buf) == "f144"
    for schema, buf in [
        ("ev44", ess.encode_ev44("d", 1, [10], [0], [1, 2], [3, 4])),
        ("al00", ess.encode_al00("a", 5, "Severity::MINOR", "m")),
        ("ep01", ess.encode_ep01("e", "ConnectionInfo::CONNECTED", 5)),
        ("tdct", ess.encode_tdct("t", [1, 2, 3])),
        ("se00", ess.encode_se00("s", 100, [1.0, 2.0])),
        ("ad00", ess.encode_ad00_uint16("i", [[1, 2], [3, 4]], 7)),
        ("da00", ess.encode_da00_int32("m", "signal", "x", 7, [1, 2, 3])),
    ]:
        assert buf[4:8] == schema.encode(), schema
        assert ess.decode(buf)["schema"] == schema


def test_f144_roundtrip():
    buf = ess.encode_f144_double("local:choppers:rotation_speed", 10.0, 10_100)
    d = ess.decode(buf)
    assert d["source_name"] == "local:choppers:rotation_speed"
    assert d["value"] == 10.0
    assert d["timestamp"] == 10_100 * 1_000_000


def test_f144_array_roundtrip():
    buf = ess.encode_f144_array_double("s", [1.5, -2.5, 3.0], 42)
    d = ess.decode(buf)
    assert d["values"] == [1.5, -2.5, 3.0]
    assert "value" not in d


def test_ev44_roundtrip():
    buf = ess.encode_ev44("det", 7, [10_100_000_000], [0], [100, 200, 300], [1, 2, 3])
    d = ess.decode(buf)
    assert d["message_id"] == 7
    assert d["reference_time"] == [10_100_000_000]
    assert d["timestamp"] == 10_100_000_000
    assert d["time_of_flight"] == [100, 200, 300]
    assert d["pixel_ids"] == [1, 2, 3]


def test_al00_ep01_tdct_se00_roundtrip():
    d = ess.decode(ess.encode_al00("alarm", 12, "Severity::MAJOR", "too hot"))
    assert (d["severity"], d["message"], d["timestamp"]) == (
        "Severity::MAJOR", "too hot", 12_000_000)
    d = ess.decode(ess.encode_ep01("pv", "ConnectionInfo::DISCONNECTED", 9))
    assert d["connection_status"] == "ConnectionInfo::DISCONNECTED"
    d = ess.decode(ess.encode_tdct("chop", [5, 6, 7], sequence_counter=2))
    assert d["timestamps"] == [5, 6, 7] and d["timestamp"] == 5
    d = ess.decode(ess.encode_se00("env", 1_000, [1.0, 2.0, 3.0], time_delta=0.5))
    assert d["packet_timestamp"] == 1_000
    assert d["values"] == [1.0, 2.0, 3.0]
    assert d["time_delta"] == 0.5


def test_ad00_da00_roundtrip():
    d = ess.decode(ess.encode_ad00_uint16("img", [[10, 11], [12, 13]], 10_300))
    assert d["dimensions"] == [2, 2]
    assert d["data"] == [10.0, 11.0, 12.0, 13.0]
    d = ess.decode(ess.encode_da00_int32("mon", "signal", "x", 10_500, [1, 2, 3, 4]))
    assert d["name"] == "signal"
    assert d["axis_name"] == "x"
    assert d["data"] == [1.0, 2.0, 3.0, 4.0]


def test_short_buffer_rejected():
    with pytest.raises(ValueError):
        ess.decode(b"\x00\x00\x00")


def test_unknown_schema_rejected():
    buf = bytearray(ess.encode_f144_double("s", 1.0, 1))
    buf[4:8] = b"zz99"
    with pytest.raises(KeyError):
        ess.decode(bytes(buf))


@given(
    source=st.text(min_size=0, max_size=37),
    value=st.floats(allow_nan=False, allow_infinity=False),
    ts=st.integers(min_value=1, max_value=2**40),
)
@settings(max_examples=200, deadline=None)
def test_f144_roundtrip_property(source, value, ts):
    """Alignment shake: arbitrary-length strings exercise every padding
    path in the back-to-front builder."""
    d = ess.decode(ess.encode_f144_double(source, value, ts))
    assert d["source_name"] == source
    assert d["value"] == value
    assert d["timestamp"] == ts * 1_000_000


@given(
    n=st.integers(min_value=0, max_value=65),
    msg_id=st.integers(min_value=0, max_value=2**62),
)
@settings(max_examples=50, deadline=None)
def test_ev44_roundtrip_property(n, msg_id):
    tofs = list(range(n))
    d = ess.decode(ess.encode_ev44("d", msg_id, [1, 2], [0, n // 2], tofs, tofs))
    assert d["time_of_flight"] == tofs
    assert d["reference_time_index"] == [0, n // 2]
    assert d["message_id"] == msg_id


# ---------------------------------------------------------------------------
# Binary pipeline: Kafka-shaped rows → decode_kafka_flatbuffers → run_job
# ---------------------------------------------------------------------------

def _binary_kafka_df(spark, items: list[dict]):
    from pyspark.sql import functions as F

    offsets: dict = {}
    rows = []
    for it in items:
        topic = it.get("topic", "")
        off = offsets.setdefault(topic, 0)
        offsets[topic] = off + 1
        rows.append((topic, 0, off, int(it.get("kafka_timestamp", 0)),
                     bytearray(fbs.encode_fixture(it))))
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, kafka_ms long, value binary"
    )
    return df.select(
        "topic", "partition", "offset",
        F.timestamp_millis("kafka_ms").alias("timestamp"), "value",
    )


def test_binary_pipeline_reproduces_domain_goldens(spark, tmp_path):
    """generator → FlatBuffers decode → run_job reproduces the JSON-path
    goldens from binary input (reference test_writer_modules.py:18-41)."""
    from kafka_to_nexus_spark.plan import StartMessage
    from kafka_to_nexus_spark.runner import run_job
    from kafka_to_nexus_spark.sinks import staging

    items = json.loads((DOMAIN_DATA / "writer_modules_data.json").read_text())
    tpl = json.loads((DOMAIN_TEMPLATES / "writer_modules_template.json").read_text())

    envelope = fbs.decode_kafka_flatbuffers(_binary_kafka_df(spark, items))
    start = StartMessage(job_id="bin", filename="f.nxs", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    res = run_job(spark, start, envelope, str(tmp_path / "out"))

    def staged(group, dataset):
        df = spark.read.parquet(str(staging.dataset_dir(res.out_dir, group, dataset)))
        return df

    log = staged("/entry/instrument/chopper/rotation_speed", "log").orderBy("time")
    assert [(r.time, r.value) for r in log.collect()] == [
        (10_100_000_000, 10.0), (10_110_000_000, 15.0)]
    agg = {k.split("/")[-1]: v for k, v in res.metadata_values.items()
           if "rotation_speed" in k}
    assert agg == {"minimum_value": 10.0, "maximum_value": 15.0,
                   "average_value": 12.5}
    status = staged("/entry/instrument/chopper/rotation_speed", "status")
    assert [r.connection_status for r in status.orderBy("connection_status_time").collect()] == [2, 2]
    alarms = staged("/entry/instrument/chopper/rotation_speed", "alarms")
    assert [r.alarm_severity for r in alarms.orderBy("alarm_time").collect()] == [1, 0]
    pulses = staged("/entry/instrument/event_detector/events", "pulses")
    idx = [r.event_index for r in pulses.orderBy("event_time_zero").collect()]
    assert idx == sorted(idx) and idx[0] == 0


def test_undecodable_message_counted_not_fatal(spark):
    """A garbage buffer yields a null-schema envelope row (D2 taxonomy
    input) and does not kill the decode of its neighbors."""
    from pyspark.sql import functions as F

    good = ess.encode_f144_double("s", 1.0, 11_000)
    rows = [("t", 0, 0, 11_000, bytearray(good)),
            ("t", 0, 1, 11_001, bytearray(b"\x00" * 3)),
            ("t", 0, 2, 11_002, bytearray(b"garbagegarbage"))]
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, kafka_ms long, value binary"
    ).select("topic", "partition", "offset",
             F.timestamp_millis("kafka_ms").alias("timestamp"), "value")
    out = fbs.decode_kafka_flatbuffers(df).orderBy("offset").collect()
    assert out[0]["schema"] == "f144" and out[0]["value"] == 1.0
    assert out[1]["schema"] is None and out[2]["schema"] is None


# ---------------------------------------------------------------------------
# Command-plane schemas: pl72 / 6s4t / x5f2 / answ / wrdn (C2/C4/C5)
# ---------------------------------------------------------------------------

def test_pl72_roundtrip_and_validation():
    from kafka_to_nexus_spark.fbs import commands as fbc

    buf = fbc.encode_pl72(
        job_id="j-1", filename="f.nxs", nexus_structure='{"children": []}',
        start_time_ms=1000, stop_time_ms=2000, instrument_name="DREAM",
        service_id="svc", control_topic="ctl", metadata='{"run": 7}',
    )
    assert buf[4:8] == b"pl72"
    out = fbc.decode_pl72(buf)
    assert out["job_id"] == "j-1" and out["filename"] == "f.nxs"
    assert out["start_time"] == 1000 and out["stop_time"] == 2000
    assert out["instrument_name"] == "DREAM" and out["control_topic"] == "ctl"

    import pytest as _pytest
    bad = fbc.encode_pl72(job_id="", filename="", nexus_structure="")
    with _pytest.raises(ValueError) as e:
        fbc.decode_pl72(bad)
    msg = str(e.value)
    assert "Job ID missing" in msg and "Filename missing" in msg
    assert "NeXus Structure missing" in msg


def test_6s4t_x5f2_answ_wrdn_roundtrip():
    from kafka_to_nexus_spark.fbs import commands as fbc

    stop = fbc.decode_6s4t(fbc.encode_6s4t(
        job_id="j", stop_time_ms=5000, command_id="c-9", service_id="svc"))
    assert stop == {"stop_time": 5000, "run_name": None, "job_id": "j",
                    "service_id": "svc", "command_id": "c-9"}

    st = fbc.decode_x5f2(fbc.encode_x5f2(
        "kafka-to-nexus-spark", "2.0", "svc", "host-1", 42, 2000, '{"state": "idle"}'))
    assert st["process_id"] == 42 and st["status_json"] == '{"state": "idle"}'

    an = fbc.decode_answ(fbc.encode_answ(
        "svc", "j", fbc.ACTION_START_JOB, fbc.OUTCOME_FAILURE,
        status_code=400, message="no", command_id="c"))
    assert an["outcome"] == fbc.OUTCOME_FAILURE and an["status_code"] == 400

    wr = fbc.decode_wrdn(fbc.encode_wrdn(
        "svc", "j", True, "/data/f.nxs", metadata='{"m": 1}', message="boom"))
    assert wr["error_encountered"] and wr["file_name"] == "/data/f.nxs"


def test_command_dispatch_by_identifier():
    from kafka_to_nexus_spark.fbs import commands as fbc

    buf = fbc.encode_6s4t(job_id="j", command_id="c")
    assert fbc.command_schema_id(buf) == "6s4t"
    out = fbc.decode_command(buf)
    assert out["type"] == "6s4t" and out["job_id"] == "j"
    with pytest.raises(ValueError, match="unknown command schema"):
        fbc.decode_command(b"\x00\x00\x00\x00zzzz")


def test_wire_layer_drives_fsm_from_buffers():
    """pl72 bytes → FSM start → answ bytes; 6s4t stop; x5f2/wrdn encode
    (Handler.cpp:107-189 flow, binary end to end)."""
    import json
    import uuid as _uuid

    from kafka_to_nexus_spark.control.commands import JobController, WorkerState
    from kafka_to_nexus_spark.control.wire import (
        finished_writing_buffer, handle_command_buffer, status_buffer)
    from kafka_to_nexus_spark.fbs import commands as fbc

    ctl = JobController()
    jid = str(_uuid.uuid4())
    start = fbc.encode_pl72(
        job_id=jid, filename="f.nxs", nexus_structure='{"children": []}',
        start_time_ms=10_000, stop_time_ms=20_000)
    resp, answ = handle_command_buffer(ctl, start)
    assert resp.accepted and ctl.state is WorkerState.WRITING
    decoded = fbc.decode_answ(answ)
    assert decoded["outcome"] == fbc.OUTCOME_SUCCESS
    assert decoded["action"] == fbc.ACTION_START_JOB
    assert decoded["job_id"] == jid

    st = fbc.decode_x5f2(status_buffer(ctl))
    assert json.loads(st["status_json"])["state"] == "writing"

    stop = fbc.encode_6s4t(job_id=jid, stop_time_ms=15_000, command_id="c1")
    resp2, answ2 = handle_command_buffer(ctl, stop)
    assert resp2.accepted
    assert fbc.decode_answ(answ2)["action"] == fbc.ACTION_SET_STOP_TIME

    wr = fbc.decode_wrdn(finished_writing_buffer(ctl))
    assert wr["job_id"] == jid and not wr["error_encountered"]

    # feedback traffic on the same topic is ignored, not answered
    assert handle_command_buffer(ctl, status_buffer(ctl)) == (None, None)


def test_da00_multi_variable_roundtrip():
    """Full multi-variable DataArray frame: N Variable tables with unit/
    label/axes/shape/dtype survive encode → decode (da00_Writer.cpp
    multi-variable form); the first variable also populates the
    single-variable convenience fields."""
    variables = [
        {"name": "signal", "unit": "counts", "label": "histogram",
         "data_type": "int32", "axes": ["x"], "shape": [4],
         "data": [1, 2, 3, 4]},
        {"name": "errors", "data_type": "float64", "axes": ["x"],
         "shape": [4], "data": [0.1, 0.2, 0.3, 0.4]},
        {"name": "x", "data_type": "float32", "shape": [5],
         "data": [0.0, 1.0, 2.0, 3.0, 4.0]},
    ]
    d = ess.decode(ess.encode_da00("hist", 10_500, variables))
    assert d["timestamp"] == 10_500_000_000
    vs = d["da00_variables"]
    assert [v["name"] for v in vs] == ["signal", "errors", "x"]
    assert vs[0]["unit"] == "counts" and vs[0]["label"] == "histogram"
    assert vs[0]["data_type"] == "int32" and vs[0]["axes"] == ["x"]
    assert vs[0]["data"] == [1.0, 2.0, 3.0, 4.0]
    assert vs[1]["data"] == [0.1, 0.2, 0.3, 0.4]
    assert vs[2]["data_type"] == "float32" and vs[2]["shape"] == [5]
    # convenience fields mirror the first variable
    assert d["name"] == "signal" and d["axis_name"] == "x"
    assert d["data"] == [1.0, 2.0, 3.0, 4.0]


def test_da00_multi_variable_binary_to_pivot(spark):
    """Binary multi-variable frames → decode → da00.transform pivots to
    data_<name> columns (the staging form the pack step stacks)."""
    from kafka_to_nexus_spark.modules import da00

    items = [
        {"schema": "da00", "source_name": "hist", "timestamp": 11_000 + i,
         "variables": [
             {"name": "signal", "data_type": "int32", "axes": ["x"],
              "data": [i, i + 1]},
             {"name": "errors", "data_type": "float64", "axes": ["x"],
              "data": [0.5 * i, 0.5 * i + 0.25]},
         ]}
        for i in range(3)
    ]
    env = fbs.decode_kafka_flatbuffers(_binary_kafka_df(spark, items))
    out = da00.transform(env, {"variables": [{"name": "signal"}, {"name": "errors"}]})
    rows = out["frames"].orderBy("time").collect()
    assert [r.data_signal for r in rows] == [[0.0, 1.0], [1.0, 2.0], [2.0, 3.0]]
    assert [r.data_errors for r in rows] == [[0.0, 0.25], [0.5, 0.75], [1.0, 1.25]]


def test_f144_array_fixture_round_trip():
    """Fixture-level array f144: encode_fixture routes the "values" form
    through the array encoder, and decode restores it for the envelope."""
    from kafka_to_nexus_spark import fbs
    from kafka_to_nexus_spark.fbs import ess

    buf = fbs.encode_fixture({"schema": "f144", "source_name": "pv:w",
                              "timestamp": 42, "values": [1.5, -2.5, 3.0]})
    out = ess.decode(buf)
    assert out["values"] == [1.5, -2.5, 3.0]
    assert out["source_name"] == "pv:w"
    assert "value" not in out


def test_tdct_se00_fixture_units_match_json_twin():
    """tdct timestamps and explicit se00 packet_timestamp are ALREADY ns
    (FIXTURES.md); encode_fixture must pass them raw like
    sources/fixtures.py does — only the envelope-ms fallback converts.
    A ms->ns re-multiply made the binary pipeline 10^6 off the JSON one."""
    from kafka_to_nexus_spark import fbs
    from kafka_to_nexus_spark.fbs import ess

    out = ess.decode(fbs.encode_fixture(
        {"schema": "tdct", "source_name": "c",
         "timestamps": [1_000_000_000, 2_000_000_000]}))
    assert out["timestamps"] == [1_000_000_000, 2_000_000_000]

    out = ess.decode(fbs.encode_fixture(
        {"schema": "se00", "source_name": "s",
         "packet_timestamp": 2_000_000_000, "values": [1.0]}))
    assert out["packet_timestamp"] == 2_000_000_000
    # fallback path: envelope ms converts
    out = ess.decode(fbs.encode_fixture(
        {"schema": "se00", "source_name": "s", "timestamp": 2000,
         "values": [1.0]}))
    assert out["packet_timestamp"] == 2_000 * 1_000_000


def test_ad00_1d_fixture_keeps_rank():
    """A rank-1 ad00 fixture must declare dimensions [n], not [1, n] —
    the JSON twin emits rank 1, and _pack_ad00_frames stacks on the
    declared rank, so a silent rank-2 promotion changed the packed
    dataset shape depending on the ingestion path."""
    from kafka_to_nexus_spark import fbs
    from kafka_to_nexus_spark.fbs import ess

    out = ess.decode(fbs.encode_fixture(
        {"schema": "ad00", "source_name": "a", "data": [1, 2, 3],
         "timestamp": 5}))
    assert out["dimensions"] == [3]
    out = ess.decode(fbs.encode_fixture(
        {"schema": "ad00", "source_name": "a", "data": [[1, 2], [3, 4]],
         "timestamp": 5}))
    assert out["dimensions"] == [2, 2]


def test_decode_fuzz_never_crashes_the_pipeline():
    """D2 robustness: the hand-written FlatBuffers parser must either
    decode or raise — random bytes, truncated valid buffers, and
    corrupted headers all classify as errors (null schema) instead of
    killing the mapInPandas task."""
    import random

    from kafka_to_nexus_spark import fbs as fbs_mod
    from kafka_to_nexus_spark.fbs import ess

    rng = random.Random(7)
    valid = fbs_mod.encode_fixture(
        {"schema": "f144", "source_name": "s", "timestamp": 42, "value": 1.0})
    cases = [b"", b"\x00" * 3, b"\xff" * 64]
    cases += [bytes(rng.randrange(256) for _ in range(n))
              for n in (4, 8, 12, 33, 200)]
    cases += [valid[:n] for n in (1, 4, 8, len(valid) // 2, len(valid) - 1)]
    # bit-flipped valid buffers
    for _ in range(50):
        b = bytearray(valid)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    ok, err = 0, 0
    for buf in cases:
        try:
            out = ess.decode(buf)
            assert isinstance(out, dict)
            ok += 1
        except Exception:
            err += 1  # caught by _decode_batches → D2 error row
    assert ok + err == len(cases)


def test_decode_batch_mixes_garbage_with_valid(spark):
    """A Kafka batch mixing valid buffers with garbage yields error rows
    (null schema) for the garbage and decoded rows for the rest — the
    reference keeps consuming after bad buffers."""
    from pyspark.sql import functions as F

    from kafka_to_nexus_spark import fbs as fbs_mod

    valid = fbs_mod.encode_fixture(
        {"schema": "f144", "source_name": "s", "timestamp": 42, "value": 2.5})
    rows = [("t", 0, 0, 42, bytearray(valid)),
            ("t", 0, 1, 43, bytearray(b"\xde\xad\xbe\xef")),
            ("t", 0, 2, 44, bytearray(b""))]
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, kafka_ms long, value binary"
    ).select("topic", "partition", "offset",
             F.timestamp_millis("kafka_ms").alias("timestamp"), "value")
    out = {r.offset: r for r in fbs_mod.decode_kafka_flatbuffers(df).collect()}
    assert out[0].schema == "f144" and out[0].value == 2.5
    assert out[1].schema is None and out[2].schema is None
