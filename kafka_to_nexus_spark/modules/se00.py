"""W3 — se00 sample-environment arrays with timestamp synthesis.

Per message: append the value-array chunk; timestamps are the explicit
``timestamps[]`` when present, else synthesized ``t_i = packet_timestamp +
round(i * time_delta)``. Per-chunk cue pair (current_size, packet_ts).

Reference: src/WriterModule/se00/se00_Writer.cpp:82-90 (synthesis),
:135-221 (write path, 10 array dtypes).

Spark form: ``posexplode(values)`` + a `when` choosing explicit vs
synthesized timestamp — all JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import spark_type_for

ACCEPTS_REPEATED_TIMESTAMPS = False
GROUPABLE = True  # row-wise map (explode + when) — multi-source safe
# dtype default deviates from the reference (int64, se00_Writer.h:71) on
# purpose: the envelope carries values as double, and defaulting to int64
# would silently truncate fractional samples when a template omits "type".
# ESS templates set the type explicitly, where both engines agree.
DEFAULTS = {"dtype": "double", "cue_interval": None}


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    cfg = {**DEFAULTS, **(config or {})}
    keep = [c for c in ("__source",) if c in df.columns]
    exploded = df.select(
        *keep,
        "partition",
        "offset",
        "packet_timestamp",
        "time_delta",
        "timestamps",
        F.posexplode(F.col("values")).alias("pos", "raw_value"),
    )
    synthesized = (
        F.col("packet_timestamp")
        + F.round(F.col("pos") * F.col("time_delta")).cast("long")
    )
    out = exploded.select(
        *keep,
        "partition",
        "offset",
        F.when(
            F.col("timestamps").isNotNull() & (F.size("timestamps") > 0),
            F.element_at(F.col("timestamps"), F.col("pos") + 1),
        )
        .otherwise(synthesized)
        .alias("time"),
        F.col("raw_value").cast(spark_type_for(cfg["dtype"])).alias("value"),
    )
    return {"log": out.select(*keep, "time", "value")}


def cue(df: DataFrame) -> DataFrame:
    """Per-chunk cue: (elements written before this chunk, packet_ts).
    Reference: se00_Writer.cpp:205-206. Two-pass cumulative index — no
    single-reducer window (see functions.with_cumulative_before)."""
    from ..functions import with_cumulative_before

    return with_cumulative_before(df, F.size("values"), "cue_index").select(
        "cue_index", F.col("packet_timestamp").alias("cue_timestamp_zero")
    )
