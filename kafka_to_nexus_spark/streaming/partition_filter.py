"""F6 — partition stop decision as a poll-status state machine.

Mirrors the reference's contract (src/Stream/PartitionFilter.cpp:46-68,
src/Kafka/BrokerSettings.h:30-32 ``KafkaErrorTimeout`` = 30 s):

- a MESSAGE resets the machine — never stop while data flows;
- END_OF_PARTITION marks the consumer caught-up but does not stop;
- TIMED_OUT stops only when the partition was already at EOF *and* the
  wall clock has passed stop-time + leeway (the "we are done and nothing
  more is coming" exit);
- ERROR stops only after the error state has PERSISTED for the error
  timeout (default 30 s) — a transient broker hiccup never kills a job.

In the Spark engine the micro-batch driver loop is the poll loop: a
non-empty batch is MESSAGE, an empty batch is END_OF_PARTITION then
TIMED_OUT, and a source/query exception is ERROR. The clock is
injectable so the timeout path is unit-testable without sleeping.
"""

from __future__ import annotations

import enum
import time
from typing import Callable


class PollStatus(enum.Enum):
    MESSAGE = "message"
    END_OF_PARTITION = "end_of_partition"
    TIMED_OUT = "timed_out"
    ERROR = "error"


class PartitionState(enum.Enum):
    DEFAULT = "default"
    END_OF_PARTITION = "end_of_partition"
    TIMEOUT = "timeout"
    ERROR = "error"


class PartitionFilter:
    """Stop decision for one stream/partition.

    ``stop_time_s``: job stop time as epoch seconds (None = run forever
    until errors); ``stop_leeway_s``: extra wall-clock grace after stop
    time; ``error_timeout_s``: how long an ERROR state must persist
    before the partition is declared dead.
    """

    def __init__(
        self,
        stop_time_s: float | None = None,
        stop_leeway_s: float = 5.0,
        error_timeout_s: float = 30.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.stop_time_s = stop_time_s
        self.stop_leeway_s = stop_leeway_s
        self.error_timeout_s = error_timeout_s
        self._clock = clock
        self._state = PartitionState.DEFAULT
        self._state_since: float | None = None
        self._at_end_of_partition = False

    @property
    def state(self) -> PartitionState:
        return self._state

    def _enter(self, state: PartitionState) -> None:
        """Record the transition time only on a CHANGE of state — the
        timeout measures how long the state has persisted."""
        if self._state is not state:
            self._state = state
            self._state_since = self._clock()

    def _state_age(self) -> float:
        if self._state_since is None:
            return 0.0
        return self._clock() - self._state_since

    def has_errored_out(self) -> bool:
        # NOTE: an interleaved non-ERROR status (message, EOP, timeout)
        # resets the persistence clock, so alternating error/ok never
        # trips the timeout. That is reference-exact: the C++ machine's
        # updateStatusOccurrenceTime restamps on every state CHANGE
        # (src/Stream/PartitionFilter.cpp:38-44), so only an
        # uninterrupted ERROR run counts.
        return (
            self._state is PartitionState.ERROR
            and self._state_age() > self.error_timeout_s
        )

    def should_stop_partition(self, status: PollStatus) -> bool:
        if status is PollStatus.MESSAGE:
            self._at_end_of_partition = False
            self._state = PartitionState.DEFAULT
            self._state_since = None
            return False
        if status is PollStatus.END_OF_PARTITION:
            self._at_end_of_partition = True
            self._state = PartitionState.END_OF_PARTITION
            self._state_since = None
            return False
        if status is PollStatus.TIMED_OUT:
            self._enter(PartitionState.TIMEOUT)
            if not self._at_end_of_partition:
                return False
            if self.stop_time_s is None:
                return False
            return self._clock() > self.stop_time_s + self.stop_leeway_s
        if status is PollStatus.ERROR:
            self._enter(PartitionState.ERROR)
            return self.has_errored_out()
        return False
