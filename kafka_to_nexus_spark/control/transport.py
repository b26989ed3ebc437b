"""C1/C4 transport: the job pool + response channels behind one interface.

The reference claims a job from the pool topic by committing its Kafka
offset — exactly-one worker wins (src/CommandSystem/Handler.cpp:45-53,
JobListener). Two implementations of the same contract:

- ``FilePoolTransport``: broker-free. The pool is a directory of job
  files; a claim is an atomic ``os.rename`` into the worker's name —
  POSIX rename semantics give the same claim-once guarantee the offset
  commit does, and make the contention path integration-testable here.
- ``KafkaPoolTransport``: the real thing, import-gated on kafka-python
  (absent in this container); same method surface.

Responses (answ), status heartbeats (x5f2) and finished-writing (wrdn)
are produced as JSON lines to the command channel — the JSON twins of the
reference's FlatBuffers payloads (Parser.cpp:24-155 field sets).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from pathlib import Path

from .commands import JobController, Response


class FilePoolTransport:
    """Directory-backed job pool with atomic claim-once semantics."""

    def __init__(self, pool_dir: str | Path, worker_id: str) -> None:
        self.pool = Path(pool_dir)
        self.pool.mkdir(parents=True, exist_ok=True)
        self.worker_id = worker_id
        self._claim_dir = self.pool / "claimed"
        self._claim_dir.mkdir(exist_ok=True)
        self._status_channel: str | None = None

    # -- alternative status channel (C5) -----------------------------------
    # A start message may carry control_topic; status then goes there until
    # the job ends (Master.cpp:74-76 useAlternativeStatusTopic; reverted at
    # setToIdle, Master.cpp:139-160 / StatusReporterBase).

    def use_alternative_status_channel(self, name: str) -> None:
        self._status_channel = name

    def revert_status_channel(self) -> None:
        self._status_channel = None

    # -- producer side ----------------------------------------------------

    def offer(self, start_msg: dict) -> str:
        """Producer: enqueue a RunStart into the pool (one file per job)."""
        job_id = str(start_msg.get("job_id", ""))
        target = self.pool / f"{int(time.time() * 1e6)}_{job_id}.json"
        tmp = target.with_suffix(".tmp")
        tmp.write_text(json.dumps(start_msg))
        os.rename(tmp, target)  # atomic publish
        return str(target)

    # -- worker side ------------------------------------------------------

    def pending(self) -> list[Path]:
        return sorted(p for p in self.pool.glob("*.json"))

    def try_claim(self) -> dict | None:
        """Claim the oldest unclaimed job. Atomic: of N contending workers
        exactly one rename succeeds (= the reference's offset commit)."""
        for candidate in self.pending():
            claimed = self._claim_dir / f"{candidate.stem}.{self.worker_id}"
            try:
                os.rename(candidate, claimed)
            except FileNotFoundError:
                continue  # another worker won this one
            return json.loads(claimed.read_text())
        return None

    def claim_into(self, controller: JobController) -> Response | None:
        """Poll + claim + drive the FSM; unclaimable commands produce a
        rejected answ and are NOT returned to the pool (Handler behavior:
        a malformed start is consumed and answered)."""
        msg = self.try_claim()
        if msg is None:
            return None
        resp = controller.handle_start(msg)
        self.send_response(resp)
        return resp

    # -- response / status channels ---------------------------------------

    def send_response(self, resp: Response) -> None:
        with open(self.pool / "responses.jsonl", "a") as f:
            f.write(json.dumps({"type": "answ", **asdict(resp)}) + "\n")

    def send_status(self, status: dict) -> None:
        name = (
            f"status_{self._status_channel}.jsonl"
            if self._status_channel
            else "status.jsonl"
        )
        with open(self.pool / name, "a") as f:
            f.write(json.dumps({"type": "x5f2", **status}) + "\n")

    def send_finished(self, wrdn: dict) -> None:
        with open(self.pool / "responses.jsonl", "a") as f:
            f.write(json.dumps({"type": "wrdn", **wrdn}) + "\n")

    def read_responses(self) -> list[dict]:
        path = self.pool / "responses.jsonl"
        if not path.exists():
            return []
        return [json.loads(line) for line in path.read_text().splitlines() if line]


class KafkaPoolTransport:
    """Kafka job-pool transport: claim = offset commit on the pool topic.

    Mirrors FilePoolTransport's surface. Import-gated: raises ImportError
    where kafka-python is unavailable (this container) — exercised against
    an in-process fake broker in tests/test_kafka_arm.py.
    """

    def __init__(self, brokers: str, pool_topic: str, worker_id: str,
                 group_id: str = "kafka-to-nexus-workers") -> None:
        from kafka import KafkaConsumer, KafkaProducer  # noqa: F401

        self._consumer = KafkaConsumer(
            pool_topic,
            bootstrap_servers=brokers,
            group_id=group_id,
            enable_auto_commit=False,  # commit == claim, manual only
            max_poll_records=1,
        )
        self._producer = KafkaProducer(bootstrap_servers=brokers)
        self.worker_id = worker_id
        self._response_topic = f"{pool_topic}_responses"

    def try_claim(self) -> dict | None:
        batch = self._consumer.poll(timeout_ms=500, max_records=1)
        for records in batch.values():
            for record in records:
                self._consumer.commit()  # the claim (Handler.cpp:45-53)
                return json.loads(record.value)
        return None

    def claim_into(self, controller: JobController) -> Response | None:
        msg = self.try_claim()
        if msg is None:
            return None
        resp = controller.handle_start(msg)
        self.send_response(resp)
        return resp

    def send_response(self, resp: Response) -> None:
        self._producer.send(
            self._response_topic,
            json.dumps({"type": "answ", **asdict(resp)}).encode(),
        )

    def send_status(self, status: dict) -> None:
        self._producer.send(
            self._response_topic, json.dumps({"type": "x5f2", **status}).encode()
        )

    def send_finished(self, wrdn: dict) -> None:
        self._producer.send(
            self._response_topic, json.dumps({"type": "wrdn", **wrdn}).encode()
        )


def make_transport(kind: str, **kwargs):
    """Factory: ``file`` (broker-free) or ``kafka`` (gated)."""
    if kind == "file":
        return FilePoolTransport(**kwargs)
    if kind == "kafka":
        return KafkaPoolTransport(**kwargs)
    raise ValueError(f"unknown transport kind {kind!r}")
