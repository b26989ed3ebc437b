"""W2 — ev44 neutron events: NXevent_data.

Per message: append per-event arrays ``time_of_flight → event_time_offset``
and ``pixel_ids → event_id``; per-pulse ``reference_time → event_time_zero``
and ``event_index = reference_time_index + (cumulative events written before
this message)`` — the monotone index linking pulses to event rows.

Reference: src/WriterModule/ev44/ev44_Writer.cpp:92-144 (index shift :107-117),
config ev44_Writer.h:48-57 (chunk 1M, cue 1e8 events). Buffered (pre-start
as-of) messages are NOT written (ev44_Writer.cpp:94-97).

Spark form: the cumulative shift is a running sum of per-message event
counts over (partition, offset) arrival order, computed with the two-pass
``with_cumulative_before`` scheme — per-Kafka-partition windows in parallel
plus a broadcast of tiny per-partition base offsets. Exact parity with the
reference's single-writer append order, no single-reducer sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import with_cumulative_before

ACCEPTS_REPEATED_TIMESTAMPS = True
WRITES_BUFFERED = False
DEFAULTS = {"cue_interval": 100_000_000, "chunk_size": 1 << 20}


def _drop_buffered(df: DataFrame) -> DataFrame:
    if "is_buffered_message" in df.columns:
        return df.filter(~F.col("is_buffered_message"))
    return df


def cue(
    df: DataFrame,
    config: dict | None = None,
    events_base: int = 0,
    last_cue: int = -1,
) -> DataFrame:
    """K4 — event cue index (ev44_Writer.cpp:127-134): after appending a
    message, when ``EventsWritten > LastCueIndex + CueInterval`` emit
    ``(cue_index = EventsWritten - 1, cue_timestamp_zero = last
    reference_time + last time_of_flight)`` and move the threshold.

    The threshold recurrence is data-dependent (each emission's position
    feeds the next test), so it is inherently sequential in message
    order — exactly the reference's single-writer loop. The Spark form
    runs it over the per-MESSAGE summary (3 longs per message, ~10³×
    smaller than the event stream; the cumulative counts come from the
    parallel two-pass ``with_cumulative_before``), as one applyInPandas
    group. Past ~10⁸ messages per source, block the summary and carry
    (events_after, last_cue) across blocks — same recurrence, chunked.

    ``events_base``/``last_cue`` carry the writer state across micro-
    batches (streaming mode): EventsWritten before this batch and the
    LastCueIndex reached so far."""
    import pandas as pd

    interval = (config or {}).get("cue_interval") or DEFAULTS["cue_interval"]
    df = _drop_buffered(df)
    n_events = F.size("time_of_flight")
    summary = (
        with_cumulative_before(df.filter(n_events > 0), n_events, "_events_before")
        .select(
            "partition",
            "offset",
            (
                F.col("_events_before") + F.size("time_of_flight") + F.lit(events_base)
            ).alias("_events_after"),
            (
                F.element_at("reference_time", -1)
                + F.element_at("time_of_flight", -1)
            ).alias("_last_event_ts"),
        )
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["partition", "offset"])
        last = last_cue  # LastCueIndex; initial -1 (ev44_Writer.h:51)
        idx, ts = [], []
        for ea, t in zip(pdf["_events_after"], pdf["_last_event_ts"]):
            if ea > last + interval:
                idx.append(int(ea) - 1)
                ts.append(int(t))
                last = int(ea) - 1
        return pd.DataFrame({"cue_index": idx, "cue_timestamp_zero": ts})

    return (
        summary.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(emit, "cue_index long, cue_timestamp_zero long")
    )


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    df = _drop_buffered(df)
    n_events = F.size("time_of_flight")
    with_cum = with_cumulative_before(df, n_events, "_events_before")
    events = with_cum.select(
        F.posexplode(F.arrays_zip("time_of_flight", "pixel_ids")).alias("_pos", "_e"),
        "_events_before",
    ).select(
        F.col("_e.time_of_flight").alias("event_time_offset"),
        F.col("_e.pixel_ids").alias("event_id"),
        (F.col("_events_before") + F.col("_pos")).alias("_global_index"),
    )
    # Pulse data is appended only for messages that carry events
    # (ev44_Writer.cpp writeImpl guards on CurrentNumberOfEvents > 0);
    # the events-before accounting above still counts every message.
    pulses = with_cum.filter(n_events > 0).select(
        F.posexplode(F.col("reference_time")).alias("_pos", "event_time_zero"),
        F.coalesce(
            F.element_at(F.col("reference_time_index"), F.col("_pos") + 1), F.lit(0)
        ).alias("_rti"),
        "_events_before",
    ).select(
        "event_time_zero",
        (F.col("_rti") + F.col("_events_before")).alias("event_index"),
    )
    out = {"events": events, "pulses": pulses}
    if (config or {}).get("cue_interval"):
        out["cue"] = cue(df, config)
    return out


def aggregates(df: DataFrame, config: dict | None = None) -> DataFrame:
    """Event-count metadata (`events`, ev44_Writer.cpp metadata dataset)."""
    return _drop_buffered(df).agg(
        F.coalesce(F.sum(F.size("time_of_flight")), F.lit(0)).cast("long").alias("events")
    )
