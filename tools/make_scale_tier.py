"""Synthesize a larger scale tier from sf0.1 for SCALING measurements
(VERDICT r13 #1: "the bench scale can't certify scale" — at sf0.1 every
8-core/32-core ratio is ~1 because the suite is overhead-bound, so the
round's §2/§3 claims had plan evidence but no data-scale demonstration).

The driver's deterministic generator is not available here, so this tool
replicates the sf0.1 corpus tables FACTOR× with per-copy perturbations
chosen so the workload SHAPE stays representative:

- documents: copy i shifts doc_id by i×10^7 (clear of the parity
  certificates' +10^6 mirror offset — differences between copies are
  never 10^6) and rewrites text through a per-copy alphabet rotation
  (``translate`` — injective, length-preserving), so intra-copy
  duplicate/near-dup structure is preserved exactly while cross-copy
  shingle overlap is ~0 (no artificial 10×-dense LSH buckets).
- embeddings: vec_id shifted the same way; every element gets +i×0.01
  (copies form parallel but distinct clusters; the auto-k queries scale
  k with n so per-cluster work stays bounded, as at a real larger SF).

PERF-ONLY data: no oracle exists at this tier (the DuckDB gate keeps
running at sf0.01); nothing here is read by any declared query unless
SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python tools/make_scale_tier.py [factor] [src_dir] [dst_dir]
       (defaults: 10, /root/testdata/sf0.1, /tmp/k2n_scale/sf1)
"""

from __future__ import annotations

import string
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kafka_to_nexus_spark.session import get_spark  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/k2n_scale/sf1"
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="make_scale_tier",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase

    docs = spark.read.parquet(f"{src}/documents.parquet")
    copies = []
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        if i:
            rot = lower[i:] + lower[:i] + upper[i:] + upper[:i]
            c = c.withColumn("text", F.translate("text", lower + upper, rot))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    (out.withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(f"{dst}/documents.parquet"))

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    copies = []
    for i in range(factor):
        c = emb.withColumn("vec_id", F.col("vec_id") + i * 10_000_000)
        if i:
            c = c.withColumn(
                "embedding",
                F.transform("embedding", lambda x: x + F.lit(i * 0.01)),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )

    # events: id/user shifted per copy, timestamps untouched (the spot
    # families don't window on ts at this tier; density ×FACTOR is the
    # point). TPC-H star tables are copied VERBATIM (unscaled) only so
    # the bench harness's register_views warmup finds every table —
    # never measure the q*/w* families at this tier.
    ev = spark.read.parquet(f"{src}/events.parquet")
    copies = []
    for i in range(factor):
        c = (ev.withColumn("event_id", F.col("event_id") + i * 100_000_000)
               .withColumn("user_id", F.col("user_id") + i * 10_000_000))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        (spark.read.parquet(f"{src}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{dst}/{t}.parquet"))
    print(
        f"wrote {dst}: documents x{factor} "
        f"({spark.read.parquet(f'{dst}/documents.parquet').count()} rows), "
        f"embeddings x{factor} "
        f"({spark.read.parquet(f'{dst}/embeddings.parquet').count()} rows)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
