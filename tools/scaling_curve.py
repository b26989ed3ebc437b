"""Scale-growth measurement: run the corpus-shaped operator family across
the sf0.001 / sf0.01 / sf0.1 directories and fit the log-log growth slope
against each query's DRIVING TABLE's actual row-count ratio (the sf dirs
do NOT scale uniformly: lineitem/events grow 10x per step but documents
is 500/500/5000 and embeddings 500/500/2000, so a nominal-10x slope would
be fiction for the LLM family).  slope ~1.0 = linear (scales), <1 = fixed
overhead still dominates at this size, >1.3 = superlinear (a scale hazard
worth a design look).  Steps where the driving table doesn't grow are
skipped.

The LLM family gets a second, truer measurement via --synth: sf0.1's
documents/embeddings replicated x1/x10/x100 under /tmp (each replica gets
a text suffix / embedding perturbation so duplicate density and near-dup
geometry stay realistic instead of every doc gaining N exact copies),
giving an honest 100x span with exactly-10x steps for the corpus ops.

Usage: python tools/scaling_curve.py [out.md]        # sf-dir mode
       python tools/scaling_curve.py --synth [out.md]  # replicated-corpus mode
Prints a markdown table; optionally writes it to the given file.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyarrow.parquet as pq

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.session import get_spark

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# The operators whose complexity class matters at 100 TB, mapped to the
# table whose row count drives their cost.  TPC-H reps q1/q9/q18 anchor
# the "known linear" baseline.
FAMILY = {
    "q1_pricing_summary": "lineitem",
    "q9_product_profit": "lineitem",
    "q18_large_orders": "lineitem",
    "dedup_exact": "documents",
    "minhash_signatures": "documents",
    "minhash_lsh_buckets": "documents",
    "ngram_jaccard_pairs": "documents",
    "simhash_fingerprints": "documents",
    "dup_span_coverage": "documents",
    "winnow_fingerprints": "documents",
    "dedup_components": "documents",
    "srp_signatures": "embeddings",
    "srp_near_dup_pairs": "embeddings",
    "semantic_dedup_prune": "embeddings",
    "ann_cosine_topk": "embeddings",
    "quantized_adc_topk": "embeddings",
    "tfidf_top_term": "documents",
    "bpe_token_count": "documents",
    "decontamination_overlap": "documents",
    "token_budget_select": "documents",
    "incremental_dedup_merge": "documents",
    "hll_distinct_sketch": "events",
    "cms_heavy_hitters": "documents",
    "kmv_distinct_sketch": "events",
    "temperature_mix_sample": "documents",
    "sequence_packing": "documents",
}

# dedup_components memoizes its CC labels per (session, sf_dir): re-running
# would measure the cache, so it stays single-shot (same rule as bench.py).
MEMOIZED = {"dedup_components"}

# Entries whose OUTPUT (pairs/edges) is quadratic in duplicate-cluster
# size are bounded to the first N synth dirs: the x100 corpus has
# 100-replica near-dup clusters, so uncapped pair/edge generation emits
# ~25M rows per stage and spills >80 GB of shuffle (measured — both the
# jaccard pair join and the CC edge build filled the disk at x100). The
# capped jaccard variant runs the full span and is the mitigation
# evidence; production runs cap buckets (lsh_candidate_pairs max_bucket)
# or scale cluster count with the corpus (SemDeDup's k).
MAX_DIRS = {
    "ngram_jaccard_pairs": 2,
    "dedup_components": 2,
    "semantic_dedup_prune": 2,
    "srp_near_dup_pairs": 2,
}


def time_query(spark, fn, sf_dir: str, name: str) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    dt = once()
    if dt > 0.5 and name not in MEMOIZED:
        spark.catalog.clearCache()
        dt = min(dt, once())
    spark.catalog.clearCache()
    return dt


SYNTH_ROOT = "/tmp/scaling_synth"
SYNTH_BASE = "/root/testdata/sf0.1"
SYNTH_MULTS = (1, 10, 100)


def build_synth(spark) -> list[str]:
    """Replicate sf0.1's documents/embeddings x1/x10/x100 under /tmp; the
    other tables are linked so register_views finds a full dir."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SYNTH_BASE}/documents.parquet")
    embs = spark.read.parquet(f"{SYNTH_BASE}/embeddings.parquet")
    dirs = []
    for mult in SYNTH_MULTS:
        d = f"{SYNTH_ROOT}/x{mult}"
        dirs.append(d)
        os.makedirs(d, exist_ok=True)
        for t in Q.TABLES:
            link = f"{d}/{t}.parquet"
            if t in ("documents", "embeddings") or os.path.lexists(link):
                continue
            os.symlink(f"{SYNTH_BASE}/{t}.parquet", link)
        if os.path.exists(f"{d}/documents.parquet"):
            continue  # built by a previous run
        reps = spark.range(mult).withColumnRenamed("id", "replica")
        (docs.crossJoin(reps)
             .select((F.col("doc_id") + F.col("replica") * 10_000_000).alias("doc_id"),
                     F.concat("text", F.lit(" r"), F.col("replica")).alias("text"),
                     "lang", "source", "n_chars")
             .repartition(max(1, mult))
             .write.mode("overwrite").parquet(f"{d}/documents.parquet"))
        (embs.crossJoin(reps)
             .select((F.col("vec_id") + F.col("replica") * 10_000_000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: x + F.col("replica") * F.lit(0.0003))
                      .cast("array<float>").alias("embedding"),
                     "label")
             .repartition(max(1, mult))
             .write.mode("overwrite").parquet(f"{d}/embeddings.parquet"))
    return dirs


def main() -> None:
    import gc

    synth = "--synth" in sys.argv
    if synth:
        sys.argv.remove("--synth")

    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    funcs = Q.queries()

    # the capped LSH pipeline: same operator family as ngram_jaccard_pairs
    # but with the boilerplate-cluster cap — its slope vs the uncapped
    # query's is the mitigation evidence for pair-output explosion
    def _capped_jaccard(spark, sf_dir):
        from kafka_to_nexus_spark.llm import dedup

        Q.register_views(spark, sf_dir, ("documents",))
        docs = spark.table("documents")
        sig = dedup.minhash_signatures(docs)
        pairs = dedup.lsh_candidate_pairs(sig, max_bucket=8)
        return dedup.ngram_jaccard(docs, pairs)

    funcs["ngram_jaccard_capped8"] = _capped_jaccard

    sf_dirs = SF_DIRS
    family = dict(FAMILY)
    if synth:
        sf_dirs = build_synth(spark)
        family = {n: t for n, t in FAMILY.items()
                  if t in ("documents", "embeddings")}
        family["ngram_jaccard_capped8"] = "documents"
    def count_rows(path: str) -> int:
        p = Path(path)
        if p.is_dir():
            return sum(pq.ParquetFile(f).metadata.num_rows
                       for f in p.glob("*.parquet"))
        return pq.ParquetFile(path).metadata.num_rows

    # actual row counts per (sf_dir, table) — the denominators of the fit
    nrows = {
        d: {t: count_rows(f"{d}/{t}.parquet") for t in set(family.values())}
        for d in sf_dirs
    }
    rows = []
    for name, table in family.items():
        fn = funcs[name]
        limit = MAX_DIRS.get(name, len(sf_dirs)) if synth else len(sf_dirs)
        ts: list[float | None] = []
        for sf_dir in sf_dirs[:limit]:
            ts.append(time_query(spark, fn, sf_dir, name))
            gc.collect()
        ts += [None] * (len(sf_dirs) - len(ts))
        slopes = []
        for a, b in ((0, 1), (1, 2)):
            if ts[a] is None or ts[b] is None:
                slopes.append(None)
                continue
            ratio = nrows[sf_dirs[b]][table] / nrows[sf_dirs[a]][table]
            slopes.append(
                math.log(ts[b] / ts[a]) / math.log(ratio) if ratio > 1 else None
            )
        rows.append((name, table, *ts, *slopes))
        shown = slopes[1] if slopes[1] is not None else slopes[0]
        print(f"{name}[{table}]: "
              + " ".join("—" if t is None else f"{t:.2f}" for t in ts)
              + f" slope {shown if shown is None else round(shown, 2)}",
              file=sys.stderr)
    spark.stop()

    def fmt(s):
        return "skip" if s is None else f"{s:+.2f}"

    def fmt_t(t):
        return "—" if t is None else f"{t:.2f}"

    labels = [Path(d).name for d in sf_dirs]
    lines = [
        f"| query | driving table | {labels[0]} s | {labels[1]} s | {labels[2]} s "
        "| slope step1 | slope step2 | verdict |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, table, t0, t1, t2, s_lo, s_hi in sorted(
        rows, key=lambda r: -(r[6] if r[6] is not None else -9)
    ):
        s = s_hi if s_hi is not None else s_lo
        verdict = ("no-growth-step" if s is None
                   else "**superlinear**" if s > 1.3
                   else "linear" if s > 0.6 else "overhead-bound")
        if name in MAX_DIRS and synth:
            verdict += " (span bounded: quadratic pair/edge output spills at x100)"
        lines.append(
            f"| {name} | {table} | {fmt_t(t0)} | {fmt_t(t1)} | {fmt_t(t2)} "
            f"| {fmt(s_lo)} | {fmt(s_hi)} | {verdict} |"
        )
    md = "\n".join(lines)
    print(md)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(md + "\n")


if __name__ == "__main__":
    main()
