"""End-to-end batch-runner tests — Spark equivalent of the reference domain
tests (domain-tests/test_*.py), asserting against the staged parquet output
instead of HDF5 (h5py unavailable; sinks.hdf5 packs the same staging)."""

from __future__ import annotations

import json

import pytest

from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
from kafka_to_nexus_spark.plan import StartMessage
from kafka_to_nexus_spark.runner import run_job
from kafka_to_nexus_spark.sinks import staging
from kafka_to_nexus_spark.sources.fixtures import messages_from_file


def run(spark, tmp_path, template, data, start_ms=10_000, stop_ms=15_000):
    structure = json.loads((DOMAIN_TEMPLATES / template).read_text())
    messages = messages_from_file(spark, DOMAIN_DATA / data)
    job = StartMessage(
        job_id="test-job",
        filename="out",
        nexus_structure=structure,
        start_time_ms=start_ms,
        stop_time_ms=stop_ms,
    )
    out_dir = str(tmp_path / "staged")
    return run_job(spark, job, messages, out_dir)


def read_col(spark, out_dir, group, dataset, col, order_col=None):
    df = spark.read.parquet(str(staging.dataset_dir(out_dir, group, dataset)))
    rows = df.orderBy(order_col or col).collect()
    return [getattr(r, col) for r in rows]


@pytest.fixture(scope="module")
def writer_modules_result(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("writer_modules")
    return run(spark, tmp, "writer_modules_template.json", "writer_modules_data.json")


def test_f144_staged_golden(spark, writer_modules_result):
    out = writer_modules_result.out_dir
    g = "/entry/instrument/chopper/rotation_speed"
    assert read_col(spark, out, g, "log", "value", "time") == [10.0, 15.0]
    assert read_col(spark, out, g, "log", "time") == [10_100_000_000, 10_110_000_000]
    # T6 aggregates published as metadata values
    mv = writer_modules_result.metadata_values
    assert mv[f"{g}/minimum_value"] == 10.0
    assert mv[f"{g}/maximum_value"] == 15.0
    assert mv[f"{g}/average_value"] == 12.5


def test_ep01_al00_extra_modules_staged(spark, writer_modules_result):
    out = writer_modules_result.out_dir
    g = "/entry/instrument/chopper/rotation_speed"
    assert read_col(spark, out, g, "status", "connection_status", "connection_status_time") == [2, 2]
    assert read_col(spark, out, g, "alarms", "alarm_severity", "alarm_time") == [1, 0]


def test_ev44_staged(spark, writer_modules_result):
    out = writer_modules_result.out_dir
    g = "/entry/instrument/event_detector/events"
    zeros = read_col(spark, out, g, "pulses", "event_time_zero")
    assert all(10_000_000_000 <= z <= 15_000_000_000 for z in zeros)
    idx = read_col(spark, out, g, "pulses", "event_index", "event_time_zero")
    assert idx == sorted(idx)  # monotone cumulative index


def test_mdat_values(writer_modules_result):
    mv = writer_modules_result.metadata_values
    assert mv["/entry/start_time"] == "1970-01-01T00:00:10.000Z"
    assert mv["/entry/end_time"] == "1970-01-01T00:00:15.000Z"


def test_meta_file_structure(writer_modules_result):
    meta = staging.read_meta(writer_modules_result.out_dir)
    assert "/entry" in meta["groups"]
    assert any(d["path"] == "/entry/title" for d in meta["static_datasets"])
    assert meta["job"]["job_id"] == "test-job"
    assert "metrics" not in meta  # metrics live on the result, not the file
    assert writer_modules_result.metrics["messages_received"] > 0
    assert writer_modules_result.metrics["flatbuffer_errors"] == 0


def test_before_and_after_semantics(spark, tmp_path):
    # domain-tests/test_messages_before_and_after.py:17-37
    res = run(
        spark, tmp_path, "messages_before_and_after_template.json",
        "messages_before_and_after_data.json",
    )
    g = "/entry/instrument/chopper/delay"
    values = read_col(spark, res.out_dir, g, "log", "value", "time")
    times = read_col(spark, res.out_dir, g, "log", "time")
    # last f144 before start written (5 @ 9999ms), earlier ignored
    assert values[0] == 5.0 and times[0] == 9_999_000_000
    # after stop not written: last is 16 @ 15000ms
    assert values[-1] == 16.0 and times[-1] == 15_000_000_000
    # ev44 pre-start NOT written; post-stop dropped
    zeros = read_col(spark, res.out_dir, "/entry/instrument/event_detector/events",
                     "pulses", "event_time_zero")
    assert zeros[0] == 10_000_000_000 and zeros[-1] == 15_000_000_000


def test_buffered_semantics(spark, tmp_path):
    # domain-tests/test_buffered.py:17 — pre-start value written even when
    # nothing arrives inside the window
    res = run(spark, tmp_path, "buffered_template.json", "buffered_data.json")
    g = "/entry/instrument/chopper/delay"
    values = read_col(spark, res.out_dir, g, "log", "value", "time")
    times = read_col(spark, res.out_dir, g, "log", "time")
    assert values[0] == 3.0 and times[0] == 9_000_000_000


def test_repeated_messages_skipped(spark, tmp_path):
    # domain-tests/test_repeated_messages.py:18
    res = run(spark, tmp_path, "repeated_messages_template.json",
              "repeated_messages_data.json")
    g = "/entry/instrument/chopper/delay"
    assert read_col(spark, res.out_dir, g, "log", "value", "time") == [10.0, 12.0, 15.0]
    assert read_col(spark, res.out_dir, g, "log", "time") == [
        10_100_000_000, 10_150_000_000, 10_200_000_000]


def test_static_information(spark, tmp_path):
    # domain-tests/test_static_information.py:18-32 — statics + links land in meta
    res = run(spark, tmp_path, "static_information_template.json",
              "static_information_data.json")
    meta = staging.read_meta(res.out_dir)
    assert meta["static_datasets"], "static datasets present"
    assert meta["links"], "links present"
    for link in meta["links"]:
        assert link["path"] and link["target"]


def test_ad00_staged_golden(spark, writer_modules_result):
    # domain-tests/test_writer_modules.py:112-127 — two 2×2 frames
    out = writer_modules_result.out_dir
    g = "/entry/instrument/image_detector/data"
    df = spark.read.parquet(str(staging.dataset_dir(out, g, "frames")))
    rows = df.orderBy("time").collect()
    assert [r.time for r in rows] == [10_300_000_000, 10_310_000_000]
    assert [r.shape for r in rows] == [[2, 2], [2, 2]]
    assert [r.data for r in rows] == [
        [10.0, 11.0, 12.0, 13.0],
        [13.0, 12.0, 11.0, 10.0],
    ]


def test_da00_staged_golden(spark, writer_modules_result):
    # domain-tests/test_writer_modules.py:138-160 — signal variable frames
    out = writer_modules_result.out_dir
    g = "/entry/instrument/beam_monitor"
    df = spark.read.parquet(str(staging.dataset_dir(out, g, "frames")))
    # template declares the signal variable → multi-var pivoted staging
    rows = df.orderBy("time").collect()
    assert [r.time for r in rows] == [10_500_000_000, 10_600_000_000]
    assert [r.data_signal for r in rows] == [
        [1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0],
        [4.0, 3.0, 2.0, 1.0, 2.0, 3.0, 4.0],
    ]


def test_unknown_module_rejected_at_plan_time(spark, tmp_path):
    # reference: JobCreator throws before any writing starts → answ rejected
    structure = {
        "children": [{
            "type": "group", "name": "entry",
            "children": [{"module": "zz99", "config": {"topic": "t", "source": "s"}}],
        }]
    }
    job = StartMessage(job_id="bad", filename="f", nexus_structure=structure,
                       start_time_ms=0, stop_time_ms=1)
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json
    with pytest.raises(ValueError, match="zz99"):
        run_job(spark, job, messages_from_json(spark, []), str(tmp_path / "o"))


def test_error_taxonomy_counters(spark, tmp_path):
    """C6: one fixture per error class → per-type counters + size gauge."""
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
    msgs = [
        {"schema": "f144", "topic": "t", "source_name": "s",
         "kafka_timestamp": 11_000, "timestamp": 11_000, "value": 1.0, "offset": 0},
        {"schema": "zz99", "topic": "t", "source_name": "s",
         "kafka_timestamp": 11_001, "timestamp": 11_001, "offset": 1},
        {"schema": "f144", "topic": "t", "source_name": "",
         "kafka_timestamp": 11_002, "timestamp": 11_002, "value": 2.0, "offset": 2},
        {"schema": "f144", "topic": "t", "source_name": "s",
         "kafka_timestamp": 11_003, "timestamp": 0, "value": 3.0, "offset": 3},
    ]
    start = StartMessage(job_id="m", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    res = run_job(spark, start, messages_from_json(spark, msgs), str(tmp_path / "o"))
    assert res.metrics["messages_received"] == 4
    assert res.metrics["flatbuffer_errors"] == 3
    assert res.metrics["unknown_schema"] == 1
    assert res.metrics["not_valid_flatbuffer"] == 1
    assert res.metrics["invalid_timestamp"] == 1
    assert res.metrics["approx_file_size_mb"] >= 0


def test_grouped_same_module_sources_match_per_source_semantics(spark, tmp_path):
    """The 1000-source fast path: same-config f144 bindings run as ONE
    partitioned write + one grouped aggregate. Each source's staged log and
    job-summary aggregates must be exactly what the per-source path would
    produce (content, per-source isolation, time order, empty sources)."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    n_src = 5
    rows = []
    for m in range(20):
        src = f"pv_{m % 4}"  # pv_4 stays empty
        rows.append({
            "schema": "f144", "topic": "t", "source_name": src,
            "kafka_timestamp": 10_000 + m * 100, "offset": m,
            "value": float(m),
        })
    structure = {
        "children": [{
            "type": "group", "name": "entry",
            "children": [
                {
                    "type": "group", "name": f"pv_{i}",
                    "children": [{
                        "module": "f144",
                        "config": {"topic": "t", "source": f"pv_{i}",
                                   "dtype": "double"},
                    }],
                }
                for i in range(n_src)
            ],
        }]
    }
    start = StartMessage(job_id="grp", filename="g", nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    res = run_job(spark, start, messages_from_json(spark, rows), str(out))

    for i in range(n_src):
        df = spark.read.parquet(
            str(staging.dataset_dir(out, f"entry/pv_{i}", "log"))
        ).orderBy("time")
        got = [(r["time"], r["value"]) for r in df.collect()]
        expect = sorted(
            ((10_000 + m * 100) * 1_000_000, float(m))
            for m in range(20) if m % 4 == i
        )
        assert got == expect, f"pv_{i}"
        assert "__source" not in df.columns
    # grouped aggregates land per source, exactly as per-source aggs would
    for i in range(4):
        vals = [float(m) for m in range(20) if m % 4 == i]
        assert res.metadata_values[f"/entry/pv_{i}/minimum_value"] == min(vals)
        assert res.metadata_values[f"/entry/pv_{i}/maximum_value"] == max(vals)
        assert res.metadata_values[f"/entry/pv_{i}/average_value"] == sum(vals) / len(vals)
    # the empty source has a schema-complete empty dataset and the same
    # null-valued aggregate row the per-binding global aggregate emits
    assert res.metadata_values["/entry/pv_4/minimum_value"] is None
    assert res.metadata_values["/entry/pv_4/maximum_value"] is None
    assert res.metadata_values["/entry/pv_4/average_value"] is None


def test_duplicate_source_bindings_each_get_full_data(spark, tmp_path):
    """One PV bound into two different groups (same module, same source,
    two paths) is a legal plan: both datasets must receive the full stream.
    The grouped fast path keys renames/aggregates by source name, so
    duplicated sources must fall back to the per-binding path — a collapsed
    duplicate would leave one path's dataset silently empty."""
    from kafka_to_nexus_spark.modules import group_streams
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    rows = [
        {"schema": "f144", "topic": "t", "source_name": "pv_a",
         "kafka_timestamp": 10_000 + m * 100, "offset": m, "value": float(m)}
        for m in range(6)
    ] + [
        {"schema": "f144", "topic": "t", "source_name": "pv_b",
         "kafka_timestamp": 10_000 + m * 100, "offset": 10 + m,
         "value": float(100 + m)}
        for m in range(6)
    ]
    structure = {"children": [{
        "type": "group", "name": "entry",
        "children": [
            {"type": "group", "name": name,
             "children": [{"module": "f144",
                           "config": {"topic": "t", "source": src}}]}
            for name, src in (("first", "pv_a"), ("second", "pv_a"),
                              ("other", "pv_b"), ("other2", "pv_b"),
                              ("solo", "pv_b"))
        ],
    }]}
    start = StartMessage(job_id="dup", filename="d", nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    res = run_job(spark, start, messages_from_json(spark, rows), str(out))

    expect_a = [((10_000 + m * 100) * 1_000_000, float(m)) for m in range(6)]
    expect_b = [((10_000 + m * 100) * 1_000_000, float(100 + m)) for m in range(6)]
    for name, expect in (("first", expect_a), ("second", expect_a),
                         ("other", expect_b), ("other2", expect_b),
                         ("solo", expect_b)):
        df = spark.read.parquet(
            str(staging.dataset_dir(out, f"entry/{name}", "log"))
        ).orderBy("time")
        got = [(r["time"], r["value"]) for r in df.collect()]
        assert got == expect, name
        # every duplicated binding carries its own T6 aggregates
        assert res.metadata_values[f"/entry/{name}/minimum_value"] == expect[0][1]

    # unit check: group_streams refuses to group duplicated sources
    class B:
        def __init__(self, module, source, path):
            self.module, self.source, self.path = module, source, path
            self.config = {"topic": "t", "source": source}

    streams = [B("f144", "s1", "p1"), B("f144", "s1", "p2"),
               B("f144", "s2", "p3"), B("f144", "s3", "p4")]
    groups, singles = group_streams(streams)
    grouped = [b for v in groups.values() for b in v]
    assert {b.path for b in singles} >= {"p1", "p2"}
    assert all(b.source != "s1" for b in grouped)
    # the non-duplicated sources still group together
    assert {b.source for b in grouped} == {"s2", "s3"}


@pytest.mark.parametrize("modules_mix", [
    ["f144"], ["f144", "al00"], ["ep01", "f144", "se00"],
])
def test_grouped_path_equivalent_to_per_source(spark, tmp_path, modules_mix, monkeypatch):
    """Equivalence guard for the 1000-source fast path: for mixed
    multi-source jobs, the grouped and per-source paths must produce
    identical staged datasets (row multisets per stream) and identical
    job metadata."""
    import kafka_to_nexus_spark.modules as M
    import kafka_to_nexus_spark.runner as R
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    n_src = 3
    rows = []
    m = 0
    for mod in modules_mix:
        for k in range(12):
            src = f"{mod}_src_{k % n_src}"
            base = {
                "schema": mod, "topic": "t", "source_name": src,
                "kafka_timestamp": 10_000 + m * 37, "offset": m,
            }
            if mod == "f144":
                base["value"] = float(m)
            elif mod == "al00":
                base.update(severity=["OK", "MINOR", "MAJOR"][m % 3],
                            message=f"msg{m}" if m % 2 else "")
            elif mod == "ep01":
                base["connection_status"] = ["CONNECTED", "DISCONNECTED"][m % 2]
            elif mod == "se00":
                base.update(values=[float(m), float(m + 1)],
                            packet_timestamp=(10_000 + m * 37) * 1_000_000,
                            time_delta=1000.0)
            rows.append(base)
            m += 1
    children = [
        {
            "type": "group", "name": f"{mod}_{i}",
            "children": [{"module": mod,
                          "config": {"topic": "t", "source": f"{mod}_src_{i}"}}],
        }
        for mod in modules_mix for i in range(n_src)
    ]
    structure = {"children": [{"type": "group", "name": "entry",
                               "children": children}]}

    def run_with(path_name, force_per_source):
        if force_per_source:
            monkeypatch.setattr(M, "group_streams",
                                lambda streams: ({}, list(streams)))
            monkeypatch.setattr(R, "group_streams", M.group_streams)
        else:
            monkeypatch.undo()
        start = StartMessage(job_id=path_name, filename=path_name,
                             nexus_structure=structure,
                             start_time_ms=10_000, stop_time_ms=15_000)
        out = tmp_path / path_name
        res = run_job(spark, start, messages_from_json(spark, rows), str(out))
        staged = {}
        for mod in modules_mix:
            for i in range(n_src):
                group = f"entry/{mod}_{i}"
                ds_root = (out / "data" / staging.escape_path(group))
                for ds_dir in sorted(p for p in ds_root.iterdir() if p.is_dir()):
                    df = spark.read.parquet(str(ds_dir))
                    key = (group, ds_dir.name)
                    staged[key] = sorted(
                        tuple(r) for r in df.select(sorted(df.columns)).collect()
                    )
        return staged, dict(res.metadata_values)

    grouped_data, grouped_meta = run_with("grouped", force_per_source=False)
    plain_data, plain_meta = run_with("plain", force_per_source=True)
    assert grouped_data.keys() == plain_data.keys()
    for key in grouped_data:
        assert grouped_data[key] == plain_data[key], key
    assert grouped_meta == plain_meta


def test_meta_data_false_suppresses_summary(spark, tmp_path):
    """f144's "meta_data": false suppresses the minimum/maximum/average
    job-summary values (f144_Writer.cpp:264,282); the default (true)
    keeps them — covered across the grouped/per-binding split, since the
    differing configs land the two bindings in different shapes."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    def f144_stream(name, source, **extra):
        return {
            "name": name, "type": "group",
            "children": [{"module": "f144",
                          "config": {"topic": "t", "source": source,
                                     "dtype": "double", **extra}}],
        }

    structure = {"children": [{
        "name": "entry", "type": "group",
        "children": [
            f144_stream("quiet", "pv:quiet", meta_data=False),
            f144_stream("loud", "pv:loud"),
        ],
    }]}
    msgs = [
        {"schema": "f144", "topic": "t", "source_name": src,
         "kafka_timestamp": ts, "timestamp": ts, "value": v, "offset": i}
        for i, (src, ts, v) in enumerate([
            ("pv:quiet", 11_000, 1.0), ("pv:quiet", 12_000, 3.0),
            ("pv:loud", 11_500, 5.0), ("pv:loud", 12_500, 7.0),
        ])
    ]
    start = StartMessage(job_id="md-false", filename="f",
                         nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    result = run_job(spark, start, messages_from_json(spark, msgs),
                     str(tmp_path / "staged"))
    mv = result.metadata_values
    assert "/entry/loud/minimum_value" in mv and mv["/entry/loud/average_value"] == 6.0
    assert not any(k.startswith("/entry/quiet/") for k in mv), mv
    # data itself still staged for the suppressed stream
    assert read_col(spark, result.out_dir, "/entry/quiet", "log", "value", "time") == [1.0, 3.0]


def test_meta_data_false_streaming_finalize(spark, tmp_path):
    """The streaming finalize honors the same flag."""
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json
    from kafka_to_nexus_spark.streaming.job import StreamingJob

    structure = {"children": [{
        "name": "entry", "type": "group",
        "children": [{
            "name": "quiet", "type": "group",
            "children": [{"module": "f144",
                          "config": {"topic": "t", "source": "pv:q",
                                     "dtype": "double", "meta_data": False}}],
        }],
    }]}
    start = StartMessage(job_id="md-false-stream", filename="f",
                         nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    job = StreamingJob(spark, start, str(tmp_path / "out"))
    job.process_batch(messages_from_json(spark, [
        {"schema": "f144", "topic": "t", "source_name": "pv:q",
         "kafka_timestamp": 11_000, "timestamp": 11_000, "value": 2.0,
         "offset": 0}]), 0)
    job.finalize()
    meta = staging.read_meta(job.out_dir)
    assert not any("minimum_value" in k for k in meta["metadata_values"]), meta[
        "metadata_values"]


def test_f144_array_pv_staged_and_aggregated(spark, tmp_path):
    """Array f144 PVs (config array_size > 1, f144_Writer.h:81): each
    message's array lands as one row of the {rows, array_size} value
    dataset, and the T6 min/max/mean run over every element written
    (f144_Writer.cpp:265-276)."""
    from kafka_to_nexus_spark.sinks import hdf5, hdf5lib
    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    structure = {"children": [{
        "name": "entry", "type": "group",
        "children": [{
            "name": "wave", "type": "group",
            "children": [{"module": "f144",
                          "config": {"topic": "t", "source": "pv:wave",
                                     "dtype": "double", "array_size": 3}}],
        }],
    }]}
    msgs = [
        {"schema": "f144", "topic": "t", "source_name": "pv:wave",
         "kafka_timestamp": ts, "timestamp": ts, "values": vals, "offset": i}
        for i, (ts, vals) in enumerate([
            (11_000, [1.0, 2.0, 3.0]), (12_000, [4.0, 5.0, 9.0]),
        ])
    ]
    start = StartMessage(job_id="arr-f144", filename="f",
                         nexus_structure=structure,
                         start_time_ms=10_000, stop_time_ms=15_000)
    result = run_job(spark, start, messages_from_json(spark, msgs),
                     str(tmp_path / "staged"))
    rows = spark.read.parquet(
        str(staging.dataset_dir(result.out_dir, "/entry/wave", "log"))
    ).orderBy("time").collect()
    assert [list(r.value) for r in rows] == [[1.0, 2.0, 3.0], [4.0, 5.0, 9.0]]
    mv = result.metadata_values
    assert mv["/entry/wave/minimum_value"] == 1.0
    assert mv["/entry/wave/maximum_value"] == 9.0
    assert mv["/entry/wave/average_value"] == 4.0
    # pack stacks per-row arrays into a 2-D dataset
    hdf = tmp_path / "arr.nxs"
    hdf5.pack(result.out_dir, str(hdf))
    with hdf5lib.File(str(hdf), "r") as f:
        arr = f["/entry/wave/value"][:]
        assert arr.shape == (2, 3) and arr[1][2] == 9.0


def test_grouped_path_packs_monotone_time_across_partitions(spark, tmp_path):
    """A grouped source whose messages interleave across Kafka partitions
    must stage a per-source time-ordered log like the per-binding path
    (repartition-by-source before the sorted grouped write): without it,
    part files concatenate in task order and the packed time axis is not
    monotone."""
    import pyarrow.parquet as pq

    from kafka_to_nexus_spark.sources.fixtures import messages_from_json

    tpl = {"children": [{
        "name": "entry", "type": "group",
        "children": [
            {"name": f"g{i}", "type": "group",
             "children": [{"module": "f144",
                           "config": {"topic": "t", "source": f"s{i}",
                                      "dtype": "double",
                                      "enable_alarm_info": False,
                                      "enable_epics_con_info": False}}]}
            for i in range(2)
        ],
    }]}
    rows = []
    off = {0: 0, 1: 0}
    for ms in range(11_000, 14_000, 100):  # interleave partitions by time
        p = (ms // 100) % 2
        for i in range(2):
            rows.append({"schema": "f144", "topic": "t",
                         "source_name": f"s{i}", "timestamp": ms + i,
                         "kafka_timestamp": ms, "value": float(ms),
                         "partition": p, "offset": off[p]})
            off[p] += 1
    start = StartMessage(job_id="ord", filename="f", nexus_structure=tpl,
                         start_time_ms=10_000, stop_time_ms=15_000)
    out = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, rows), str(out))
    for i in range(2):
        from kafka_to_nexus_spark.sinks import staging as stg

        t = pq.read_table(stg.dataset_dir(out, f"/entry/g{i}", "log"))
        times = t.column("time").to_pylist()
        assert times == sorted(times) and len(times) == 30
