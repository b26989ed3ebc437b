"""C2/C4/C5 wire layer: FlatBuffers command buffers ⇄ the control FSM.

The reference's Handler consumes pl72/6s4t buffers from the command
topic, drives the FSM, and produces answ/x5f2/wrdn buffers back
(src/CommandSystem/Handler.cpp:107-189, FeedbackProducer.cpp:42-86).
This module is that boundary for the Spark engine: bytes in → Response
out, plus the encoded feedback buffer to publish. Transports (file pool,
Kafka) stay payload-agnostic.
"""

from __future__ import annotations

import json
import os
import socket

from ..fbs import commands as fbc
from .commands import JobController, Response, apply_stop_to_job

SOFTWARE_NAME = "kafka-to-nexus-spark"
SOFTWARE_VERSION = "2.0"


def _answ_for(resp: Response, action: int, service_id: str) -> bytes:
    return fbc.encode_answ(
        service_id=service_id,
        job_id=resp.job_id,
        action=action,
        outcome=fbc.OUTCOME_SUCCESS if resp.accepted else fbc.OUTCOME_FAILURE,
        status_code=resp.status_code,
        message=resp.message,
        command_id=resp.command_id,
    )


def handle_command_buffer(
    controller: JobController, buf: bytes, job=None
) -> tuple[Response | None, bytes | None]:
    """Decode one command buffer and drive the FSM.

    Returns ``(response, answ_buffer)`` for pl72/6s4t; ``(None, None)``
    for x5f2/answ/wrdn (feedback traffic on a shared topic is ignored,
    as the reference's Handler does). A stop with a live ``job`` retargets
    it (6s4t stop-time update). Undecodable buffers raise ``ValueError``
    — callers answer those with a 400 answ of their own.
    """
    msg = fbc.decode_command(buf)
    kind = msg.pop("type")
    if kind == "pl72":
        # 0 = "not set" on the wire (Parser.cpp:61-70)
        clean = {k: v for k, v in msg.items() if v not in (None, 0, "")}
        resp = controller.handle_start(clean)
        return resp, _answ_for(resp, fbc.ACTION_START_JOB, controller.service_id)
    if kind == "6s4t":
        clean = {k: v for k, v in msg.items() if v not in (None, "")}
        if job is not None:
            resp = apply_stop_to_job(controller, job, clean)
        else:
            resp = controller.handle_stop(clean)
        return resp, _answ_for(resp, fbc.ACTION_SET_STOP_TIME, controller.service_id)
    return None, None


def status_buffer(
    controller: JobController, update_interval_ms: int = 2000
) -> bytes:
    """x5f2 heartbeat with the FSM status as the status_json payload."""
    return fbc.encode_x5f2(
        software_name=SOFTWARE_NAME,
        software_version=SOFTWARE_VERSION,
        service_id=controller.service_id,
        host_name=socket.gethostname(),
        process_id=os.getpid(),
        update_interval_ms=update_interval_ms,
        status_json=json.dumps(controller.status()),
    )


def finished_writing_buffer(
    controller: JobController, error_message: str = "", metadata: str = "{}"
) -> bytes:
    """wrdn from the FSM's finished-writing record
    (FeedbackProducer.cpp:68-86: error_encountered = outcome failure)."""
    wrdn = controller.finished_writing(error_message, metadata)
    return fbc.encode_wrdn(
        service_id=controller.service_id,
        job_id=wrdn["job_id"],
        error_encountered=bool(error_message),
        file_name=wrdn.get("file_name", ""),
        metadata=metadata,
        message=error_message,
    )
