"""W8 — tdct chopper top-dead-center timestamps.

Append the per-message ``timestamps[]`` array; empty arrays are rejected
(reference tdct_Writer.cpp:72-76); per-chunk cue (current_size, ts[0]).
Reference: src/WriterModule/tdct/tdct_Writer.cpp:67-83.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ACCEPTS_REPEATED_TIMESTAMPS = False


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    nonempty = df.filter(F.col("timestamps").isNotNull() & (F.size("timestamps") > 0))
    out = nonempty.select(
        "partition", "offset", F.posexplode("timestamps").alias("pos", "time")
    ).select("partition", "offset", "pos", "time")
    return {"tdc": out.select(F.col("time").alias("time"))}


def cue(df: DataFrame) -> DataFrame:
    nonempty = df.filter(F.col("timestamps").isNotNull() & (F.size("timestamps") > 0))
    w = Window.orderBy("partition", "offset")
    return nonempty.select(
        F.size("timestamps").alias("_n"),
        F.element_at("timestamps", 1).alias("cue_timestamp_zero"),
        "partition",
        "offset",
    ).select(
        F.coalesce(
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).cast("long").alias("cue_index"),
        "cue_timestamp_zero",
    )
