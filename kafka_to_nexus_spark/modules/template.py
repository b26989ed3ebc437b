"""W10 — template writer: structure without data (plan dry-run).

The reference registers a no-op writer claiming ev44/f144/se00/tdct ids to
build template files (src/WriterModule/template/TemplateWriter.h:1-195).
Here: a transform that returns empty DataFrames with the right schemas —
used by the runner's dry-run mode to materialize structure only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ACCEPTS_REPEATED_TIMESTAMPS = True
CLAIMED_IDS = ("ev44", "f144", "se00", "tdct")


def transform(df: DataFrame, config: dict | None = None) -> dict[str, DataFrame]:
    return {"empty": df.limit(0)}
