"""S3 — topic/partition discovery with exponential-backoff retry.

The reference verifies every topic in the job exists before consuming,
retrying metadata queries with exponential backoff 400 ms → 10 s
(src/Kafka/MetaDataQuery.h:33-38, src/Stream/Topic.cpp:44-107,
apps/kafka-to-nexus.cpp:46-69). Spark's Kafka source discovers
partitions itself once the query starts, so the planner-side job here is
the EXISTENCE check: fail a start command fast (and retriably) when a
topic is missing, instead of letting a streaming query sit on an empty
subscription forever.

The listing callback is injectable: a broker-backed implementation would
wrap kafka-python's AdminClient topic metadata; tests (and broker-free
deployments) supply a fake.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Sequence


def backoff_schedule_ms(
    base_ms: int = 400, cap_ms: int = 10_000
) -> "Callable[[int], int]":
    """Attempt number → backoff (exponential, capped): 400, 800, ...,
    10 000, 10 000 ms."""

    def delay(attempt: int) -> int:
        return min(cap_ms, base_ms * (2**attempt))

    return delay


def await_topics(
    required: Sequence[str],
    list_topics: Callable[[], Iterable[str]],
    max_wait_s: float = 120.0,
    base_ms: int = 400,
    cap_ms: int = 10_000,
    sleeper: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> list[str]:
    """Block until every topic in ``required`` appears in the listing.

    Returns the final topic listing. Raises ``TimeoutError`` naming the
    missing topics once ``max_wait_s`` is exhausted; transient listing
    errors are retried on the same backoff schedule.
    """
    delay = backoff_schedule_ms(base_ms, cap_ms)
    deadline = clock() + max_wait_s
    attempt = 0
    missing: list[str] = list(required)
    while True:
        try:
            available = set(list_topics())
            missing = [t for t in required if t not in available]
            if not missing:
                return sorted(available)
        except Exception:
            pass  # metadata query failed — retry on the same schedule
        if clock() >= deadline:
            raise TimeoutError(
                f"topics not found after {max_wait_s:g}s: {missing}"
            )
        sleeper(delay(attempt) / 1000.0)
        attempt += 1
