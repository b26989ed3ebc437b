"""W4 — ad00 area detector: one N-D frame per message into an (n+1)-D stack.

Spark representation (SURVEY.md §1.5): one row per frame with
``(time, shape: array<long>, data: array<T>)`` — flattened row-major frame +
explicit shape. The sink reshapes on write; trailing-dim auto-extend /
zero-fill (reference ExtensibleDataset.h:412-441) happens at pack time via
the max shape recorded here.

Reference: src/WriterModule/ad00/ad00_Writer.cpp:142-242.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import spark_type_for

ACCEPTS_REPEATED_TIMESTAMPS = False
DEFAULTS = {"dtype": "double", "cue_interval": None}


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    cfg = {**DEFAULTS, **(config or {})}
    elem = spark_type_for(cfg["dtype"])
    out = df.select(
        F.col("timestamp").alias("time"),
        F.coalesce(
            F.col("dimensions"),
            F.array(F.size("data").cast("long")),
        ).alias("shape"),
        F.transform(F.col("data"), lambda x: x.cast(elem)).alias("data"),
    )
    return {"frames": out}


def max_shape(df: DataFrame) -> DataFrame:
    """Largest per-dimension extent across frames — drives the sink's
    trailing-dim auto-extend + zero-fill (ExtensibleDataset.h:470-499)."""
    frames = transform(df)["frames"]
    return frames.select(F.posexplode("shape").alias("dim", "extent")).groupBy("dim").agg(
        F.max("extent").alias("max_extent")
    )
