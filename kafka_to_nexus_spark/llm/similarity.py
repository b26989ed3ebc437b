"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the query vector, one
narrow map + one top-k (TakeOrdered, no full sort). Scale path: IVF
(inverted-file) — k-means-style centroid assignment with broadcast
centroids, then search only the probed buckets; at 100 TB the bucket
pruning turns a full scan into a fraction-of-data scan.

All dot products are JVM-side ``aggregate``/``zip_with`` fold expressions;
a vectorized Pandas-UDF variant exists for wide embeddings where Arrow
batching + numpy beats codegen fold chains.
"""

# NOTE: no `from __future__ import annotations` here — it would stringify
# the Pandas-UDF type hints, which PySpark resolves at decoration time.
import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine against a literal query vector (broadcast as a
    literal array — no join, no shuffle; TakeOrdered top-k on executors)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(_as_double(F.col(vec_col)), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def pandas_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-batched numpy variant of brute-force top-k — the fast path for
    wide embeddings (one BLAS dot per batch instead of a fold chain)."""
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    @pandas_udf(T.DoubleType())
    def cos(batch: pd.Series) -> pd.Series:
        mat = np.vstack(batch.to_numpy()).astype(np.float64)
        dots = mat @ qv
        norms = np.linalg.norm(mat, axis=1)
        return pd.Series(dots / (norms * qn))

    scored = df.select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "ce",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid. Centroids are
    broadcast (they are small by construction), so this is a map-only
    stage followed by one hash aggregate — no wide shuffle of the data."""
    joined = df.crossJoin(F.broadcast(centroids))
    score = dot(_as_double(F.col(vec_col)), _as_double(F.col(centroid_vec_col)))
    return (
        joined.groupBy(id_col)
        .agg(
            F.max_by(
                F.col(centroid_id_col), F.struct(score, -F.col(centroid_id_col))
            ).alias(centroid_id_col)
        )
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "ce",
) -> DataFrame:
    """IVF search: rank centroids against the query on the driver (tiny),
    then brute-force only the ``n_probe`` nearest buckets. At scale the
    assignment is precomputed/partitioned by centroid for partition pruning."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    ranked = (
        centroids.select(
            centroid_id_col,
            cosine(_as_double(F.col(centroid_vec_col)), q).alias("c_cos"),
        )
        .orderBy(F.desc("c_cos"))
        .limit(n_probe)
    )
    probe_ids = [r[centroid_id_col] for r in ranked.collect()]  # tiny: n_probe rows
    assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id_col, centroid_vec_col)
    candidates = df.join(
        assigned.filter(F.col(centroid_id_col).isin(probe_ids)), id_col
    )
    return brute_force_topk(candidates, query_vec, k, vec_col, id_col)
