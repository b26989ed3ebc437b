"""Command-plane FlatBuffers: pl72 / 6s4t / x5f2 / answ / wrdn (C2/C4/C5).

Wire-format twins of the public ESS streaming-data-types command schemas,
with the field sets the reference parses and produces:

- pl72 RunStart  — Parser.cpp:51-90 ``extractStartMessage`` (start/stop
  time ms, run_name, instrument_name, nexus_structure, job_id, broker,
  service_id, filename, metadata, control_topic);
- 6s4t RunStop   — Parser.cpp:92-109 ``extractStopMessage``;
- x5f2 Status    — heartbeat envelope (Parser.cpp:155 reads the id at
  bytes 4..8; StatusHelpers pack the status JSON);
- answ ActionResponse — FeedbackProducer.cpp:42-66 ``publishResponse``
  (service_id, job_id, action, outcome, status_code, stop_time, message,
  command_id);
- wrdn FinishedWriting — FeedbackProducer.cpp:68-86 ``publishStoppedMsg``
  (service_id, job_id, error_encountered, file_name, metadata, message).

Field slots follow the public schema ids, so buffers interoperate with
any standard FlatBuffers consumer of those schemas.
"""

from __future__ import annotations

from .runtime import Builder, file_identifier, root_table

# answ enums (public answ_action_response.fbs)
ACTION_START_JOB = 0
ACTION_SET_STOP_TIME = 1
ACTION_NAMES = {ACTION_START_JOB: "StartJob", ACTION_SET_STOP_TIME: "SetStopTime"}
OUTCOME_SUCCESS = 0
OUTCOME_FAILURE = 1
OUTCOME_NAMES = {OUTCOME_SUCCESS: "Success", OUTCOME_FAILURE: "Failure"}


# --------------------------------------------------------------------------
# pl72 RunStart
# --------------------------------------------------------------------------

def encode_pl72(
    job_id: str,
    filename: str,
    nexus_structure: str,
    start_time_ms: int = 0,
    stop_time_ms: int = 0,
    run_name: str | None = None,
    instrument_name: str | None = None,
    broker: str | None = None,
    service_id: str | None = None,
    metadata: str | None = None,
    control_topic: str | None = None,
) -> bytes:
    b = Builder()
    offs = {
        2: run_name, 3: instrument_name, 4: nexus_structure, 5: job_id,
        6: broker, 7: service_id, 8: filename, 9: metadata, 11: control_topic,
    }
    created = {
        slot: b.create_string(v) for slot, v in offs.items() if v is not None
    }
    b.start_table(12)
    b.add_scalar(0, "Q", start_time_ms)
    b.add_scalar(1, "Q", stop_time_ms)
    for slot, off in created.items():
        b.add_offset(slot, off)
    return b.finish(b.end_table(), "pl72")


def decode_pl72(buf: bytes) -> dict:
    """RunStart → StartMessage fields. Raises ``ValueError`` listing every
    missing required field (Parser.cpp:24-48
    ``checkRequiredFieldsArePresent``)."""
    t = root_table(buf)
    out = {
        "start_time": t.scalar(0, "Q"),
        "stop_time": t.scalar(1, "Q"),
        "run_name": t.string(2),
        "instrument_name": t.string(3),
        "nexus_structure": t.string(4),
        "job_id": t.string(5),
        "broker": t.string(6),
        "service_id": t.string(7),
        "filename": t.string(8),
        "metadata": t.string(9),
        "control_topic": t.string(11),
    }
    errors = []
    if not out["job_id"]:
        errors.append("Job ID missing, this field is required")
    if not out["nexus_structure"]:
        errors.append("NeXus Structure missing, this field is required")
    if not out["filename"]:
        errors.append("Filename missing, this field is required")
    if errors:
        raise ValueError(
            "Errors encountered parsing run start message:\n" + "\n".join(errors)
        )
    return out


# --------------------------------------------------------------------------
# 6s4t RunStop
# --------------------------------------------------------------------------

def encode_6s4t(
    job_id: str,
    stop_time_ms: int = 0,
    run_name: str | None = None,
    service_id: str | None = None,
    command_id: str | None = None,
) -> bytes:
    b = Builder()
    created = {
        slot: b.create_string(v)
        for slot, v in {1: run_name, 2: job_id, 3: service_id, 4: command_id}.items()
        if v is not None
    }
    b.start_table(5)
    b.add_scalar(0, "Q", stop_time_ms)
    for slot, off in created.items():
        b.add_offset(slot, off)
    return b.finish(b.end_table(), "6s4t")


def decode_6s4t(buf: bytes) -> dict:
    t = root_table(buf)
    out = {
        "stop_time": t.scalar(0, "Q"),
        "run_name": t.string(1),
        "job_id": t.string(2),
        "service_id": t.string(3),
        "command_id": t.string(4),
    }
    if not out["job_id"]:
        raise ValueError(
            "Errors encountered parsing run stop message:\n"
            "Job ID missing, this field is required"
        )
    return out


# --------------------------------------------------------------------------
# x5f2 Status heartbeat
# --------------------------------------------------------------------------

def encode_x5f2(
    software_name: str,
    software_version: str,
    service_id: str,
    host_name: str,
    process_id: int,
    update_interval_ms: int,
    status_json: str,
) -> bytes:
    b = Builder()
    created = {
        0: b.create_string(software_name),
        1: b.create_string(software_version),
        2: b.create_string(service_id),
        3: b.create_string(host_name),
        6: b.create_string(status_json),
    }
    b.start_table(7)
    b.add_scalar(4, "I", process_id)
    b.add_scalar(5, "I", update_interval_ms)
    for slot, off in created.items():
        b.add_offset(slot, off)
    return b.finish(b.end_table(), "x5f2")


def decode_x5f2(buf: bytes) -> dict:
    t = root_table(buf)
    return {
        "software_name": t.string(0),
        "software_version": t.string(1),
        "service_id": t.string(2),
        "host_name": t.string(3),
        "process_id": t.scalar(4, "I"),
        "update_interval": t.scalar(5, "I"),
        "status_json": t.string(6),
    }


# --------------------------------------------------------------------------
# answ ActionResponse
# --------------------------------------------------------------------------

def encode_answ(
    service_id: str,
    job_id: str,
    action: int,
    outcome: int,
    status_code: int = 0,
    stop_time_ms: int = 0,
    message: str = "",
    command_id: str = "",
) -> bytes:
    b = Builder()
    created = {
        0: b.create_string(service_id),
        1: b.create_string(job_id),
        6: b.create_string(message),
        7: b.create_string(command_id),
    }
    b.start_table(8)
    b.add_scalar(2, "h", action, default=None)
    b.add_scalar(3, "h", outcome, default=None)
    b.add_scalar(4, "i", status_code, default=None)
    b.add_scalar(5, "Q", stop_time_ms)
    for slot, off in created.items():
        b.add_offset(slot, off)
    return b.finish(b.end_table(), "answ")


def decode_answ(buf: bytes) -> dict:
    t = root_table(buf)
    return {
        "service_id": t.string(0),
        "job_id": t.string(1),
        "action": t.scalar(2, "h"),
        "outcome": t.scalar(3, "h"),
        "status_code": t.scalar(4, "i"),
        "stop_time": t.scalar(5, "Q"),
        "message": t.string(6),
        "command_id": t.string(7),
    }


# --------------------------------------------------------------------------
# wrdn FinishedWriting
# --------------------------------------------------------------------------

def encode_wrdn(
    service_id: str,
    job_id: str,
    error_encountered: bool,
    file_name: str,
    metadata: str = "",
    message: str = "",
) -> bytes:
    b = Builder()
    created = {
        0: b.create_string(service_id),
        1: b.create_string(job_id),
        3: b.create_string(file_name),
        4: b.create_string(metadata),
        5: b.create_string(message),
    }
    b.start_table(6)
    b.add_scalar(2, "b", 1 if error_encountered else 0)
    for slot, off in created.items():
        b.add_offset(slot, off)
    return b.finish(b.end_table(), "wrdn")


def decode_wrdn(buf: bytes) -> dict:
    t = root_table(buf)
    return {
        "service_id": t.string(0),
        "job_id": t.string(1),
        "error_encountered": bool(t.scalar(2, "b")),
        "file_name": t.string(3),
        "metadata": t.string(4),
        "message": t.string(5),
    }


# --------------------------------------------------------------------------
# dispatch (Parser.cpp:111-157 is*Command checks on the identifier)
# --------------------------------------------------------------------------

_DECODERS = {
    "pl72": decode_pl72,
    "6s4t": decode_6s4t,
    "x5f2": decode_x5f2,
    "answ": decode_answ,
    "wrdn": decode_wrdn,
}


def command_schema_id(buf: bytes) -> str:
    return file_identifier(buf)


def decode_command(buf: bytes) -> dict:
    """Identifier-dispatched decode; the result carries ``type`` = the
    schema id so the control FSM can route it."""
    sid = file_identifier(buf)
    if sid not in _DECODERS:
        raise ValueError(f"unknown command schema id {sid!r}")
    out = _DECODERS[sid](buf)
    out["type"] = sid
    return out
