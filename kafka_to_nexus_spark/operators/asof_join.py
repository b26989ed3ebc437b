"""As-of join: each left row gets the latest right-side value with
``right.ts <= left.ts`` (backward direction) per key.

This generalizes the reference's F3 buffering — F3 is an as-of against the
single window-start boundary (src/Stream/SourceFilter.cpp:61-66); the full
operator joins two *streams* by time. Spark has no built-in as-of join;
the classic scalable formulation is tag-union + ``last_value IGNORE
NULLS`` over a (key, time) window:

- no pairwise join: one union + ONE shuffle on the key, each partition
  processed in time order (range/sort join approaches shuffle both sides
  too, then pay an O(n log m) probe);
- skew-safe: a hot key is one window partition, AQE-splittable;
- entirely JVM-side (window function, codegen) — no UDF.

Ties (right.ts == left.ts) resolve right-before-left, i.e. a reading AT
the event's timestamp is visible to it, matching F3's ``t < start`` ∪
boundary semantics and pandas ``merge_asof(allow_exact_matches=True)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_is_left"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_values: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left rows + latest right ``right_values`` at-or-before each left ts.

    ``tolerance``: optional max lookback (same unit as ``ts``); matches
    older than ``left.ts - tolerance`` become null, like pandas
    ``merge_asof(tolerance=...)``.
    """
    val = [f"_asof_{c}" for c in right_values]
    l_tagged = left.withColumn(_TAG, F.lit(1))
    for c, a in zip(right_values, val):
        l_tagged = l_tagged.withColumn(a, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(ts),
        *[F.col(c).alias(a) for c, a in zip(right_values, val)],
    ).withColumn(_TAG, F.lit(0))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → exact matches visible
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right ROW as one struct (pandas merge_asof matches
    # rows): per-column last(ignorenulls) would skip a newer right row
    # whose value is null and validate tolerance against a row that did
    # NOT supply the value — silently returning an out-of-tolerance stale
    # reading.
    picked = F.last(
        F.when(
            F.col(_TAG) == 0,
            F.struct(F.col(ts).alias("_ref_ts"), *[F.col(a) for a in val]),
        ),
        ignorenulls=True,
    ).over(w)
    out = unioned.withColumn("_asof_row", picked)
    keep = (
        F.col("_asof_row")["_ref_ts"] >= F.col(ts) - F.lit(tolerance)
        if tolerance is not None
        else F.lit(True)
    )
    for c, a in zip(right_values, val):
        out = out.withColumn(a, F.when(keep, F.col("_asof_row")[a]))
    return (
        out.filter(F.col(_TAG) == 1)
        .drop(_TAG, "_asof_row")
        .withColumnsRenamed({a: f"asof_{c}" for c, a in zip(right_values, val)})
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    right_values: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left rows + EARLIEST right ``right_values`` at-or-after each left
    ts — the "next reading" direction (pandas ``merge_asof
    (direction='forward')``). Same tag-union + single-shuffle shape as
    backward, with the window scanning forward instead."""
    val = [f"_asof_{c}" for c in right_values]
    l_tagged = left.withColumn(_TAG, F.lit(1))
    for c, a in zip(right_values, val):
        l_tagged = l_tagged.withColumn(a, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(ts),
        *[F.col(c).alias(a) for c, a in zip(right_values, val)],
    ).withColumn(_TAG, F.lit(0))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort AFTER left rows at equal ts in a descending-ts frame
    # scan → exact matches visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(_TAG).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # matched right ROW as a struct — see asof_join_backward for why
    picked = F.first(
        F.when(
            F.col(_TAG) == 0,
            F.struct(F.col(ts).alias("_ref_ts"), *[F.col(a) for a in val]),
        ),
        ignorenulls=True,
    ).over(w)
    out = unioned.withColumn("_asof_row", picked)
    keep = (
        F.col("_asof_row")["_ref_ts"] <= F.col(ts) + F.lit(tolerance)
        if tolerance is not None
        else F.lit(True)
    )
    for c, a in zip(right_values, val):
        out = out.withColumn(a, F.when(keep, F.col("_asof_row")[a]))
    return (
        out.filter(F.col(_TAG) == 1)
        .drop(_TAG, "_asof_row")
        .withColumnsRenamed({a: f"asof_{c}" for c, a in zip(right_values, val)})
    )
