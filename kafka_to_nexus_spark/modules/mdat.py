"""W9 — mdat run metadata: job start/end times as ISO-8601 scalar strings.

Plan-level constants (no stream consumption); whitelist {start_time,
end_time}. Reference: src/WriterModule/mdat/mdat_Writer.cpp:19-98,
extraction src/JobCreator.cpp:111-121.
"""

from __future__ import annotations

from datetime import datetime, timezone

ACCEPTS_REPEATED_TIMESTAMPS = False
ALLOWED_ITEMS = ("start_time", "end_time")


def iso8601_ms(epoch_ms: int) -> str:
    """ISO-8601 with milliseconds, UTC — reference format
    (mdat_Writer.cpp writes e.g. 1970-01-01T00:00:10.000Z-like strings)."""
    dt = datetime.fromtimestamp(epoch_ms / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{epoch_ms % 1000:03d}Z"


def values(config: dict, start_time_ms: int, stop_time_ms: int | None) -> dict[str, str]:
    """Resolve configured items → {name: iso string}; unknown items ignored
    (whitelist semantics, mdat_Writer.h:70-72)."""
    out: dict[str, str] = {}
    for item in config.get("items", []):
        if item not in ALLOWED_ITEMS:
            continue
        if item == "start_time":
            out[item] = iso8601_ms(start_time_ms)
        elif item == "end_time" and stop_time_ms is not None:
            out[item] = iso8601_ms(stop_time_ms)
    return out
