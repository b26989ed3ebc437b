"""Shared column-level helpers (cue index, ordering, enum codes)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def arrival_order(order_cols: Sequence[str] = ("partition", "offset")) -> list[Column]:
    """Arrival order within a source = per-partition offset order, the same
    guarantee the reference provides (thread per partition, offset order)."""
    return [F.col(c) for c in order_cols]


def with_row_index(
    df: DataFrame,
    out_col: str = "row_index",
    partition_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("partition", "offset"),
) -> DataFrame:
    """0-based position of each row in arrival order (per optional key)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols) if partition_cols else Window.orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w) - 1)


def cue_flag(row_index: Column, cue_interval: int) -> Column:
    """K4 — sparse skip-index: every ``cue_interval``-th write emits a
    (cue_index → row, cue_timestamp_zero → ts) pair enabling ts→row binary
    search. Reference: f144_Writer.cpp:259-263, ev44_Writer.cpp:127-134.
    At scale parquet row-group min/max stats give the same pruning for free;
    the cue columns are still materialized for output parity.
    """
    return (row_index % F.lit(cue_interval)) == F.lit(cue_interval - 1)


def cue_table(
    df: DataFrame,
    cue_interval: int,
    row_index_col: str = "row_index",
    ts_col: str = "time",
) -> DataFrame:
    """Project the cue datasets (cue_index, cue_timestamp_zero)."""
    return (
        df.filter(cue_flag(F.col(row_index_col), cue_interval))
        .select(
            F.col(row_index_col).alias("cue_index"),
            F.col(ts_col).alias("cue_timestamp_zero"),
        )
    )
