"""W6 — al00 alarms: (alarm_time, severity int16, message fixed-string).

Empty message → "NO ALARM MESSAGE" (reference al00_Writer.cpp:64-67).
Reference: src/WriterModule/al00/al00_Writer.cpp:57-70, datasets
src/NeXusDataset/EpicsAlarmDatasets.h.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SEVERITY_CODES

ACCEPTS_REPEATED_TIMESTAMPS = False
GROUPABLE = True  # row-wise map - multi-source safe with a passthrough key


def severity_code(col):
    mapping = F.create_map(*[F.lit(x) for kv in SEVERITY_CODES.items() for x in kv])
    return F.element_at(mapping, col).cast("short")


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    keep = [F.col(c) for c in ("__source",) if c in df.columns]
    out = df.select(
        *keep,
        F.col("timestamp").alias("alarm_time"),
        severity_code(F.col("severity")).alias("alarm_severity"),
        F.coalesce(F.nullif(F.col("message"), F.lit("")), F.lit("NO ALARM MESSAGE")).alias(
            "alarm_message"
        ),
    )
    return {"alarms": out}
