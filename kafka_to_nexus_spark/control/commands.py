"""Control plane (C1–C5): command parsing/validation, job FSM, status
and completion reports.

The reference's command plane speaks FlatBuffers (pl72 RunStart, 6s4t
RunStop, answ responses, x5f2 status, wrdn finished-writing) over Kafka
topics; workers claim jobs from a pool topic by committing the offset
(C1). Here the same protocol is modeled as plain dicts (JSON-portable) +
a driver-side FSM; Kafka transport is assembly on top (kafka-python or a
Spark batch read of the command topic) and gated out where no broker
exists.

Reference: src/CommandSystem/Parser.cpp:24-155 (parse/validate),
src/CommandSystem/Handler.cpp:45-200 (state machine),
src/Master.cpp:50-160 (start/stop transitions),
src/Status/StatusReporterBase.cpp:49-85 (x5f2 heartbeat).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from enum import Enum

from ..plan.model import StartMessage, StopMessage


class CommandError(ValueError):
    """Rejected command (answ rejected, 400-class status codes)."""


def parse_start(msg: dict) -> StartMessage:
    """pl72 extraction with required-field validation
    (Parser.cpp:53-88: job_id, filename, nexus_structure required;
    start defaults to message time, stop to +inf)."""
    for required in ("job_id", "filename", "nexus_structure"):
        if not msg.get(required):
            raise CommandError(f"RunStart missing required field: {required}")
    structure = msg["nexus_structure"]
    if not isinstance(structure, dict):
        import json

        try:
            structure = json.loads(structure)
        except (TypeError, ValueError) as e:
            raise CommandError(f"nexus_structure is not valid JSON: {e}") from None
    start_ms = int(msg.get("start_time", time.time() * 1000))
    stop_raw = msg.get("stop_time")
    stop_ms = int(stop_raw) if stop_raw else None
    if stop_ms is not None and stop_ms <= start_ms:
        raise CommandError(f"stop_time {stop_ms} is not after start_time {start_ms}")
    return StartMessage(
        job_id=str(msg["job_id"]),
        filename=str(msg["filename"]),
        nexus_structure=structure,
        metadata=msg.get("metadata", ""),
        start_time_ms=start_ms,
        stop_time_ms=stop_ms,
        control_topic=msg.get("control_topic", ""),
        instrument_name=msg.get("instrument_name", ""),
        service_id=msg.get("service_id", ""),
    )


def parse_stop(msg: dict) -> StopMessage:
    """6s4t extraction (Parser.cpp:120-155)."""
    if not msg.get("job_id"):
        raise CommandError("RunStop missing required field: job_id")
    stop_raw = msg.get("stop_time")
    return StopMessage(
        job_id=str(msg["job_id"]),
        command_id=str(msg.get("command_id", "")),
        stop_time_ms=int(stop_raw) if stop_raw else None,
        service_id=msg.get("service_id", ""),
    )


class WorkerState(str, Enum):
    IDLE = "idle"
    WRITING = "writing"


@dataclass
class Response:
    """answ equivalent (Handler.cpp:107-189)."""

    command_id: str
    job_id: str
    accepted: bool
    status_code: int
    message: str = ""


@dataclass
class JobController:
    """Handler/Master FSM: idle → writing → idle, with the reference's
    validation set (job-id match, UUID check, stop-time-in-past check,
    already-writing rejection)."""

    service_id: str = "kafka-to-nexus-spark"
    state: WorkerState = WorkerState.IDLE
    current_job: StartMessage | None = None
    history: list[Response] = field(default_factory=list)

    def _respond(self, command_id: str, job_id: str, accepted: bool, code: int, message: str = "") -> Response:
        r = Response(command_id, job_id, accepted, code, message)
        self.history.append(r)
        return r

    def handle_start(self, msg: dict) -> Response:
        command_id = str(msg.get("job_id", ""))
        if self.state is not WorkerState.IDLE:
            return self._respond(
                command_id, command_id, False, 400,
                f"already writing job {self.current_job.job_id}",
            )
        try:
            start = parse_start(msg)
            uuid.UUID(start.job_id)  # job id must be a valid UUID (Handler.cpp)
        except CommandError as e:
            return self._respond(command_id, command_id, False, 400, str(e))
        except ValueError:
            return self._respond(command_id, command_id, False, 400, "job_id is not a valid UUID")
        self.current_job = start
        self.state = WorkerState.WRITING
        return self._respond(command_id, start.job_id, True, 201, "started")

    def handle_stop(self, msg: dict, now_ms: int | None = None) -> Response:
        now_ms = int(time.time() * 1000) if now_ms is None else now_ms
        try:
            stop = parse_stop(msg)
        except CommandError as e:
            return self._respond("", str(msg.get("job_id", "")), False, 400, str(e))
        if self.state is not WorkerState.WRITING or self.current_job is None:
            return self._respond(stop.command_id, stop.job_id, False, 400, "not writing")
        if stop.job_id != self.current_job.job_id:
            return self._respond(
                stop.command_id, stop.job_id, False, 400,
                f"job id mismatch (current {self.current_job.job_id})",
            )
        # retarget stop time; stop-now when absent (Commands.h:32-37)
        new_stop = stop.stop_time_ms if stop.stop_time_ms is not None else now_ms
        if new_stop < self.current_job.start_time_ms:
            return self._respond(stop.command_id, stop.job_id, False, 400, "stop before start")
        self.current_job.stop_time_ms = new_stop
        return self._respond(stop.command_id, stop.job_id, True, 200, "stop set")

    def set_idle(self) -> None:
        """Master::setToIdle after teardown (Master.cpp:139-160)."""
        self.state = WorkerState.IDLE
        self.current_job = None

    def status(self, metadata_json: str = "{}") -> dict:
        """x5f2 heartbeat payload (StatusReporterBase.cpp:49-85; 2 s default
        interval, MainOpt.h:76)."""
        job = self.current_job
        return {
            "update_interval": 2000,
            "service_id": self.service_id,
            "state": self.state.value,
            "job_id": job.job_id if job else "",
            "file_being_written": job.filename if job else "",
            "start_time": job.start_time_ms if job else 0,
            "stop_time": (job.stop_time_ms or 0) if job else 0,
            "metadata": metadata_json,
        }

    def finished_writing(self, error_message: str = "", metadata: str = "{}") -> dict:
        """wrdn completion report (Handler.cpp / FeedbackProducer)."""
        job = self.current_job
        return {
            "service_id": self.service_id,
            "job_id": job.job_id if job else "",
            "file_name": job.filename if job else "",
            "error_encountered": bool(error_message),
            "message": error_message,
            "metadata": metadata,
        }


class JobPool:
    """C1 worker-pool semantics without Kafka: offer jobs, workers claim
    atomically (the Kafka form claims by committing the pool-topic offset,
    Handler.cpp:45-53 / JobListener)."""

    def __init__(self) -> None:
        self._queue: list[dict] = []

    def offer(self, start_msg: dict) -> None:
        self._queue.append(start_msg)

    def claim(self, controller: JobController) -> Response | None:
        if controller.state is not WorkerState.IDLE or not self._queue:
            return None
        msg = self._queue[0]
        resp = controller.handle_start(msg)
        if resp.accepted:
            self._queue.pop(0)  # commit ≈ claim
        elif controller.state is WorkerState.IDLE:
            # rejected while idle = the MESSAGE is malformed (parse/UUID
            # failure) — nobody can ever claim it. Consume-and-answer like
            # the transports (transport.py), or it wedges the pool head
            # and starves every job queued behind it.
            self._queue.pop(0)
        return resp


def apply_stop_to_job(controller: JobController, job, msg: dict, now_ms: int | None = None) -> Response:
    """C3 glue: validate a 6s4t stop against the FSM and, if accepted,
    retarget the RUNNING streaming job (Master.cpp stop-time update →
    StreamController). ``job`` is a streaming.job.StreamingJob."""
    resp = controller.handle_stop(msg, now_ms=now_ms)
    if resp.accepted and controller.current_job is not None:
        job.retarget_stop(controller.current_job.stop_time_ms)
    return resp
