"""Custom stateful streaming operators via ``applyInPandasWithState``.

The batch runner computes W1/T6 running aggregates with hash aggregation;
in live streaming mode the same running min/max/mean/count per source is a
classic keyed-state operator. This is the Spark-native replacement for the
reference's writer-side accumulators (f144 min/max/mean metadata,
src/WriterModule/f144/f144_Writer.cpp:265-287; event counts,
ev44_Writer.cpp:139-143): state is one tiny tuple per (schema, source) key
held by the state store — checkpointed, partitioned, and scalable to
millions of sources, unlike driver-side dicts.

Works on any streaming DataFrame with the engine envelope columns; each
trigger emits the updated running aggregate per key ("update" output mode
semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("schema", StringType()),
        StructField("source_name", StringType()),
        StructField("minimum_value", DoubleType()),
        StructField("maximum_value", DoubleType()),
        StructField("average_value", DoubleType()),
        StructField("n_values", LongType()),
    ]
)

# state tuple: (min, max, sum, count)
_STATE_SCHEMA = "min double, max double, sum double, count long"


def _update_running_stats(
    key: tuple[str, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        mn, mx, sm, cnt = state.get
    else:
        mn, mx, sm, cnt = (None, None, 0.0, 0)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        if len(vals) == 0:
            continue
        b_min, b_max = float(vals.min()), float(vals.max())
        mn = b_min if mn is None else min(mn, b_min)
        mx = b_max if mx is None else max(mx, b_max)
        sm += float(vals.sum())
        cnt += int(len(vals))
    state.update((mn, mx, sm, cnt))
    if cnt:
        yield pd.DataFrame(
            {
                "schema": [key[0]],
                "source_name": [key[1]],
                "minimum_value": [mn],
                "maximum_value": [mx],
                "average_value": [sm / cnt],
                "n_values": [cnt],
            }
        )


def running_stats(stream: DataFrame) -> DataFrame:
    """Keyed running min/max/mean/count per (schema, source_name).

    State store keeps one 4-tuple per source; Arrow batches carry the data.
    Use with ``outputMode("update")``.
    """
    return stream.groupBy("schema", "source_name").applyInPandasWithState(
        _update_running_stats,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_equivalent(df: DataFrame) -> DataFrame:
    """The batch-mode plan of the same aggregate (for test parity)."""
    from pyspark.sql import functions as F

    return df.groupBy("schema", "source_name").agg(
        F.min("value").alias("minimum_value"),
        F.max("value").alias("maximum_value"),
        (F.sum("value") / F.count("value")).alias("average_value"),
        F.count("value").alias("n_values"),
    )
