"""Range (interval) join: points joined to the intervals containing them.

Spark executes a bare ``start <= ts AND ts <= end`` join as a broadcast
nested loop — O(|points| × |intervals|), hopeless at scale. The bucketed
formulation makes it an equi-join:

- pick a bucket width W (≈ median interval length);
- each interval is exploded to every W-bucket it covers (cheap when W is
  not far below typical interval length);
- each point belongs to exactly ONE bucket, so the equi-join on bucket id
  meets every candidate exactly once — no post-join dedup;
- the exact containment predicate filters within the matched bucket.

One shuffle on the bucket id, codegen'd hash join, AQE-splittable. An
optional equi-key (e.g. user_id) composes into the join key, which also
fixes hot buckets.

Column names must be disjoint between the two sides except for ``keys``
(the joined output keeps the point side's key columns).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "_range_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with ``start <= ts <= end``
    (inclusive ends), optionally also matching on equi ``keys``."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn(_B, F.floor(F.col(ts) / bucket_width)).alias("p")
    i = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width),
                F.floor(F.col(end) / bucket_width),
            )
        ),
    ).alias("i")
    cond = (
        (F.col(f"p.{_B}") == F.col(f"i.{_B}"))
        & (F.col(f"i.{start}") <= F.col(f"p.{ts}"))
        & (F.col(f"p.{ts}") <= F.col(f"i.{end}"))
    )
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    out_cols = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in keys
    ]
    return p.join(i, cond, how).select(*out_cols)
