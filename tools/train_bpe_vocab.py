"""Train the committed BPE vocabulary artifact (llm/bpe_vocab_1024.json).

The synthetic documents corpus is template-generated with a ~42-word
vocabulary, so classic BPE training SATURATES at ~89 merges — after
that every distinct letter-run is a single symbol and no pair exists
anywhere (the merge ceiling of any corpus is bounded by its distinct-word
structure, a Heaps'-law fact, not a trainer limit). To produce a
real-depth vocabulary the trainer is fed the corpus AUGMENTED with
deterministic pseudo-words: each doc contributes ``SALT_WORDS`` 8-char
words derived from ``md5(doc_id:k)`` with hex digits mapped to letters
g..v. The augmentation is pure arithmetic on the corpus itself —
re-running this tool reproduces the identical table bit-for-bit
(deterministic argmax tie-breaks, exact integer counts). The real
corpus's own merges win the early high-count ranks; the pseudo-vocabulary
sustains training to the requested 1024.

Usage: python tools/train_bpe_vocab.py [n_merges] [--curve] [--batched-curve]
  default n_merges=1024; writes kafka_to_nexus_spark/llm/bpe_vocab_1024.json
  --curve also measures the trainer growth curve (new checkpointed
  trainer at 8/64/256/1024 vs the un-checkpointed chain re-derivation at
  8/64/128/256) and prints a markdown table for SCALE.md.
  --batched-curve measures the past-the-floor trainers (VERDICT r9 #4):
  wall time + Spark JOB COUNT for single-merge@1024 vs batched@1024/4096
  vs hybrid@4096 (merge-list equalities asserted in-run), markdown for
  SCALE.md. Skips the artifact write.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_to_nexus_spark.llm import bpe as llm_bpe
from kafka_to_nexus_spark.session import get_spark

CORPUS = "/root/testdata/sf0.1/documents.parquet"
SALT_WORDS = 12
# ~60k-word augmented vocab: 8 state partitions ≈ 7.5k rows each (see
# bpe_train's state_partitions note — 32 empty-ish tasks/iteration
# otherwise)
STATE_PARTITIONS = 8


def augmented_corpus(spark):
    docs = spark.read.parquet(CORPUS)
    salts = F.concat_ws(
        " ",
        *[
            F.translate(
                F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                           F.lit(f":{k}"))), 1, 8),
                "0123456789abcdef",
                "ghijklmnopqrstuv",
            )
            for k in range(SALT_WORDS)
        ],
    )
    return docs.select(
        F.concat(F.col("text"), F.lit(" "), salts).alias("text")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_merges = int(args[0]) if args else 1024
    curve = "--curve" in sys.argv

    spark = get_spark(app_name="bpe-train-vocab",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    corpus = augmented_corpus(spark).persist()
    print(f"augmented corpus: {corpus.count()} docs", flush=True)

    if curve:
        rows = []
        for label, kw, tiers in (
            ("materialized (checkpoint_every=16)", {}, [8, 64, 256, 1024]),
            ("chain re-derivation (no checkpoint)",
             {"checkpoint_every": 10**9}, [8, 64, 128, 256]),
        ):
            for n in tiers:
                t0 = time.perf_counter()
                got = llm_bpe.bpe_train(
                    corpus, n_merges=n,
                    state_partitions=STATE_PARTITIONS, **kw)
                dt = time.perf_counter() - t0
                rows.append((label, n, len(got), round(dt, 2)))
                print(f"{label} n={n}: {dt:.2f} s ({len(got)} learned)",
                      flush=True)
        print("\n| trainer | n_merges | learned | seconds |")
        print("|---|---|---|---|")
        for label, n, ln, dt in rows:
            print(f"| {label} | {n} | {ln} | {dt} |")

    if "--batched-curve" in sys.argv:
        sc = spark.sparkContext

        def run(label, fn, n, **kw):
            group = f"bpe-{label}-{n}"
            sc.setJobGroup(group, label)
            t0 = time.perf_counter()
            got = fn(corpus, n_merges=n,
                     state_partitions=STATE_PARTITIONS, **kw)
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            print(f"{label} n={n}: {dt:.1f} s, {jobs} Spark jobs, "
                  f"{len(got)} learned "
                  f"({jobs / max(len(got), 1):.2f} jobs/merge)", flush=True)
            return got, dt, jobs

        single, s_dt, s_jobs = run("single-merge", llm_bpe.bpe_train, 1024)
        batched, b_dt, b_jobs = run(
            "batched(64)", llm_bpe.bpe_train_batched, 1024, max_batch=64)
        if batched != single:
            raise SystemExit(
                "batched trainer DIVERGED from single-merge at 1024")
        print("batched(1024) == single(1024): merge lists identical")
        deep, d_dt, d_jobs = run(
            "batched(64)", llm_bpe.bpe_train_batched, 4096, max_batch=64)
        hyb, h_dt, h_jobs = run(
            "hybrid", llm_bpe.bpe_train_hybrid, 4096)
        if hyb != deep:
            raise SystemExit(
                "hybrid trainer DIVERGED from batched at 4096")
        print("hybrid(4096) == batched(4096): merge lists identical")
        print("\n| trainer | n_merges | seconds | Spark jobs | jobs/merge |")
        print("|---|---|---|---|---|")
        for lbl, n, dt, j, ln in (
            ("single-merge", 1024, s_dt, s_jobs, len(single)),
            ("batched (max_batch=64)", 1024, b_dt, b_jobs, len(batched)),
            ("batched (max_batch=64)", 4096, d_dt, d_jobs, len(deep)),
            ("hybrid (local endgame)", 4096, h_dt, h_jobs, len(hyb)),
        ):
            print(f"| {lbl} | {n} | {dt:.1f} | {j} | "
                  f"{j / max(ln, 1):.2f} |")
        spark.stop()
        return

    t0 = time.perf_counter()
    merges = llm_bpe.bpe_train(corpus, n_merges=n_merges,
                               state_partitions=STATE_PARTITIONS)
    dt = time.perf_counter() - t0
    print(f"final training n={n_merges}: {dt:.1f} s, "
          f"learned {len(merges)}", flush=True)
    table = [(a, b) for _, a, b, _ in merges]
    if not llm_bpe.well_formed(table):
        raise SystemExit("trained table is not well-formed — NOT writing")

    out = Path(__file__).resolve().parents[1] / (
        "kafka_to_nexus_spark/llm/bpe_vocab_1024.json"
    )
    out.write_text(json.dumps({
        "corpus": CORPUS,
        "augmentation": f"md5(doc_id:k) k<{SALT_WORDS}, hex->g..v",
        "n_merges_requested": n_merges,
        "merges": [[r, a, b, c] for r, a, b, c in merges],
    }))
    print(f"wrote {out} ({len(merges)} merges)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
