"""Broker-free ports of the reference's live integration tests
(integration-tests/test_filewriter.py). The Kafka legs those tests need
are covered by tests/test_kafka_arm.py (fake broker) and
tests/test_control.py (pool claim/rejoin/two-writers); these tests port
the DATA contracts:

- :146 test_data_written_to_file_is_correct — the exact ev44 + f144
  pattern (30 messages, 5 events each) lands in the file with the same
  event_time_zero/event_index/event_id/event_time_offset and motion
  value/time series the reference asserts.
- :237 test_start_and_stop_in_same_message — a start message carrying the
  stop time produces /entry/start_time and /entry/end_time ISO-8601
  scalars for the job window (mdat module).
"""

from __future__ import annotations

import json
import uuid

import numpy as np

from conftest import DOMAIN_DATA, DOMAIN_TEMPLATES
from kafka_to_nexus_spark.plan import StartMessage
from kafka_to_nexus_spark.runner import run_job
from kafka_to_nexus_spark.sinks import hdf5, hdf5lib
from kafka_to_nexus_spark.sources.fixtures import (
    messages_from_file,
    messages_from_json,
)

N_MESSAGES = 30
EVENTS_PER_MESSAGE = 5
START_MS = 1_000_000


def _detector_motion_structure() -> dict:
    return {
        "children": [
            {
                "type": "group",
                "name": "entry",
                "attributes": [{"name": "NX_class", "values": "NXentry"}],
                "children": [
                    {
                        "module": "dataset",
                        "config": {
                            "name": "title",
                            "values": "This is my title",
                            "dtype": "string",
                        },
                    },
                    {
                        "type": "group",
                        "name": "detector",
                        "attributes": [
                            {"name": "NX_class", "values": "NXevent_data"}
                        ],
                        "children": [
                            {
                                "module": "ev44",
                                "config": {
                                    "topic": "detector",
                                    "source": "det",
                                },
                            }
                        ],
                    },
                    {
                        "type": "group",
                        "name": "motion",
                        "attributes": [{"name": "NX_class", "values": "NXlog"}],
                        "children": [
                            {
                                "module": "f144",
                                "config": {
                                    "topic": "motion",
                                    "source": "mot",
                                    "dtype": "double",
                                },
                            }
                        ],
                    },
                ],
            }
        ]
    }


def _reference_pattern_messages():
    """The integration test's exact producer loop: per message m, ev44
    carries tof [i*10 + m*50] and ids [i + m*5] for i in 0..4, f144 carries
    value m; both at the same per-message timestamp."""
    rows = []
    times_ms = []
    for m in range(N_MESSAGES):
        t_ms = START_MS + m * 1000
        times_ms.append(t_ms)
        rows.append({
            "schema": "ev44", "topic": "detector", "source_name": "det",
            "kafka_timestamp": t_ms, "offset": m, "message_id": m,
            "reference_time": t_ms,
            "time_of_flight": [i * 10 + m * 50 for i in range(EVENTS_PER_MESSAGE)],
            "pixel_ids": [i + m * EVENTS_PER_MESSAGE for i in range(EVENTS_PER_MESSAGE)],
        })
        rows.append({
            "schema": "f144", "topic": "motion", "source_name": "mot",
            "kafka_timestamp": t_ms, "offset": m, "value": float(m),
        })
    return rows, times_ms


def test_data_written_to_file_is_correct(spark, tmp_path):
    rows, times_ms = _reference_pattern_messages()
    start = StartMessage(
        job_id=str(uuid.uuid4()),
        filename="data.nxs",
        nexus_structure=_detector_motion_structure(),
        start_time_ms=START_MS,
        stop_time_ms=START_MS + N_MESSAGES * 1000,
    )
    staged = tmp_path / "staged"
    run_job(spark, start, messages_from_json(spark, rows), str(staged))
    out = tmp_path / "data.nxs"
    hdf5.pack(staged, out)

    times_ns = [t * 1_000_000 for t in times_ms]
    n_events = N_MESSAGES * EVENTS_PER_MESSAGE
    with hdf5lib.File(out, "r") as f:
        det = "/entry/detector"
        assert len(f[f"{det}/event_time_zero"]) == N_MESSAGES
        assert len(f[f"{det}/event_index"]) == N_MESSAGES
        assert np.array_equal(f[f"{det}/event_time_zero"][:], times_ns)
        # cumulative: 5 events per pulse
        assert np.array_equal(
            f[f"{det}/event_index"][:],
            [m * EVENTS_PER_MESSAGE for m in range(N_MESSAGES)],
        )
        assert np.array_equal(f[f"{det}/event_id"][:], list(range(n_events)))
        assert np.array_equal(
            f[f"{det}/event_time_offset"][:], [i * 10 for i in range(n_events)]
        )
        assert f["/entry/title"].asstr()[()] == "This is my title"
        assert np.array_equal(f["/entry/motion/time"][:], times_ns)
        assert np.array_equal(
            f["/entry/motion/value"][:], [float(m) for m in range(N_MESSAGES)]
        )


def test_start_and_stop_in_same_message(spark, tmp_path):
    """The writer_modules template carries mdat {start_time, end_time}; a
    start message with both bounds produces the ISO-8601 scalars the
    reference's integration test reads back from the file."""
    structure = json.loads(
        (DOMAIN_TEMPLATES / "writer_modules_template.json").read_text()
    )
    start = StartMessage(
        job_id=str(uuid.uuid4()),
        filename="window.nxs",
        nexus_structure=structure,
        start_time_ms=10_000,
        stop_time_ms=15_000,
    )
    staged = tmp_path / "staged"
    run_job(
        spark,
        start,
        messages_from_file(spark, DOMAIN_DATA / "writer_modules_data.json"),
        str(staged),
    )
    out = tmp_path / "window.nxs"
    hdf5.pack(staged, out)
    with hdf5lib.File(out, "r") as f:
        assert f["/entry/start_time"].asstr()[()] == "1970-01-01T00:00:10.000Z"
        assert f["/entry/end_time"].asstr()[()] == "1970-01-01T00:00:15.000Z"
