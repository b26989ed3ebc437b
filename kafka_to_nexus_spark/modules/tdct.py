"""W8 — tdct chopper top-dead-center timestamps.

Append the per-message ``timestamps[]`` array; empty arrays are rejected
(reference tdct_Writer.cpp:72-76); per-chunk cue (current_size, ts[0]).
Reference: src/WriterModule/tdct/tdct_Writer.cpp:67-83.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import with_cumulative_before

ACCEPTS_REPEATED_TIMESTAMPS = False
GROUPABLE = True  # row-wise map (filter + explode) — multi-source safe


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    keep = [c for c in ("__source",) if c in df.columns]
    nonempty = df.filter(F.col("timestamps").isNotNull() & (F.size("timestamps") > 0))
    out = nonempty.select(
        *keep, "partition", "offset", F.posexplode("timestamps").alias("pos", "time")
    ).select(*keep, "partition", "offset", "pos", "time")
    return {"tdc": out.select(*keep, F.col("time").alias("time"))}


def cue(df: DataFrame) -> DataFrame:
    """Per-chunk cue via the two-pass cumulative index — no single-reducer
    window (see functions.with_cumulative_before)."""
    nonempty = df.filter(F.col("timestamps").isNotNull() & (F.size("timestamps") > 0))
    return with_cumulative_before(nonempty, F.size("timestamps"), "cue_index").select(
        "cue_index", F.element_at("timestamps", 1).alias("cue_timestamp_zero")
    )
