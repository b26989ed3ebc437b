"""Bloom admission sizing sweep: measured vs theoretical false-positive
rate across (bits_per_key, k) configurations, on the real fixture corpus.

The L73 certificate pins ONE design point per round; this sweep validates
the whole sizing curve the 100 TB operator would be tuned on — that the
Kirsch-Mitzenmaier double-hashed filter tracks (1 - e^(-k/bpk))^k closely
enough to size filters from the formula alone. Counts, not timings, so
machine load cannot skew it.

Usage: python tools/bloom_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.llm import dedup
from kafka_to_nexus_spark.session import get_spark

CONFIGS = [
    (4, 3),
    (6, 4),
    (8, 6),
    (10, 7),
    (12, 8),
    (16, 11),
    (32, 22),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    Q.register_views(spark, sf_dir, ("documents",))
    fp = spark.table("documents").select(
        "doc_id", F.md5(F.col("text")).alias("_fp")
    )
    standing = fp.filter(F.col("doc_id") % 10 != 0).cache()
    arrivals = fp.filter(F.col("doc_id") % 10 == 0).cache()
    exact = {
        r["doc_id"]
        for r in arrivals.alias("a")
        .join(
            standing.select("_fp").distinct().alias("s"),
            F.col("a._fp") == F.col("s._fp"),
            "left_semi",
        )
        .collect()
    }
    n_arr = arrivals.count()
    print("| bits/key | k | m_bits | fill | fpr theory | fpr measured | FP | FN |")
    print("|---|---|---|---|---|---|---|---|")
    for bpk, k in CONFIGS:
        params, words = dedup.bloom_build(standing, "_fp", k=k, bits_per_key=bpk)
        p = params.collect()[0]
        got = {
            r["doc_id"]: r["bloom_positive"]
            for r in dedup.bloom_membership(
                arrivals, params, words, "_fp", "doc_id", k=k
            ).collect()
        }
        fps = sum(1 for d, pos in got.items() if pos and d not in exact)
        fns = sum(1 for d, pos in got.items() if not pos and d in exact)
        novel = n_arr - len(exact)
        fill = 1 - math.exp(-k * p["n_keys"] / p["m_bits"])
        theory = fill**k
        measured = fps / novel if novel else float("nan")
        print(
            f"| {bpk} | {k} | {p['m_bits']} | {fill:.3f} | {theory:.2e} "
            f"| {measured:.2e} | {fps} | {fns} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
