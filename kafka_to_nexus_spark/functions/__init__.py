"""Shared column-level helpers (cue index, ordering, enum codes)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def arrival_order(order_cols: Sequence[str] = ("partition", "offset")) -> list[Column]:
    """Arrival order within a source = per-partition offset order, the same
    guarantee the reference provides (thread per partition, offset order)."""
    return [F.col(c) for c in order_cols]


def _shard_bases(df: DataFrame, weight: Column, shard_col: str) -> DataFrame:
    """One row per shard with the cumulative weight of all earlier shards.

    The only global (no-PARTITION-BY) window here runs over the *aggregated*
    per-shard totals — rows == number of Kafka partitions (≤ ~10⁴ even on a
    100 TB topic), never over the stream itself.
    """
    w = Window.orderBy(shard_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        df.groupBy(shard_col)
        .agg(F.sum(weight).alias("_shard_total"))
        .select(
            shard_col,
            F.coalesce(F.sum("_shard_total").over(w), F.lit(0))
            .cast("long")
            .alias("_shard_base"),
        )
    )


def with_cumulative_before(
    df: DataFrame,
    weight: Column,
    out_col: str,
    shard_col: str = "partition",
    order_cols: Sequence[str] = ("offset",),
) -> DataFrame:
    """``out_col`` = sum of ``weight`` over all rows strictly before this row
    in global ``(shard, *order)`` arrival order — the reference's
    single-writer append counter (ev44_Writer.cpp:107-117) — WITHOUT a
    single-reducer sort.

    Two-pass shape that survives 100×: per-shard running sums execute in
    parallel (Window PARTITION BY shard), and cross-shard bases come from a
    broadcast join against the tiny per-shard totals relation. Exactly the
    ordering guarantee the reference gives: total order within a Kafka
    partition, partition-id order across partitions.
    """
    bases = F.broadcast(_shard_bases(df, weight, shard_col))
    within = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(bases, on=shard_col)
        .withColumn(
            out_col,
            (
                F.col("_shard_base")
                + F.coalesce(F.sum(weight).over(within), F.lit(0))
            ).cast("long"),
        )
        .drop("_shard_base")
    )


def with_row_index(
    df: DataFrame,
    out_col: str = "row_index",
    partition_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("partition", "offset"),
) -> DataFrame:
    """0-based position of each row in arrival order (per optional key).

    With no ``partition_cols`` the global index is computed with the
    scalable two-pass scheme (see :func:`with_cumulative_before`): the first
    order column acts as the shard key, so no single-reducer window touches
    the stream.
    """
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
        return df.withColumn(out_col, F.row_number().over(w) - 1)
    shard, *rest = order_cols
    if rest and shard in df.columns:
        return with_cumulative_before(
            df, F.lit(1), out_col, shard_col=shard, order_cols=tuple(rest)
        )
    # Degenerate single-order-column form: only reachable on tiny inputs.
    w = Window.orderBy(*order_cols)
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
