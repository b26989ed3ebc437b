"""Streaming-admission steady-state cost at SMALL batches (VERDICT r11 #5).

Usage: python tools/admission_steady_state.py [N_BATCHES] [SF_DIR]

The L87 bench entry runs 2 LARGE micro-batches; a 100 TB ingest runs
thousands of SMALL ones, where per-batch FIXED costs dominate: each
`admit_and_fold` re-lists and re-reads every layout dir (bloom
meta/params/words twice — probe and append — plus the three near-dup
relations twice) and re-aggregates bucket occupancy from parquet. This
sweep drives the SAME arrival stream (sf0.1 documents, doc_id%10==0,
split into N_BATCHES doc_id-ordered batches) through both transaction
paths and prints per-batch wall times:

  - reread:  stateful.admit_and_fold      (layouts re-read per batch)
  - session: stateful.AdmissionSession    (layouts read once, advanced
             incrementally in memory; consolidate_every=64)

Decisions are asserted IDENTICAL at the end (the pytest parity pin,
re-checked at width). Steady state = median of batches 2..N (batch 0/1
carry JVM/code-gen warmup)."""
import json
import pathlib
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark.llm import dedup as llm_dedup
from kafka_to_nexus_spark.session import get_spark
from kafka_to_nexus_spark.streaming import stateful

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
# --standing N: synthesize an N-doc standing corpus instead of the sf
# documents table — the sf0.1 layouts are small enough that re-reading
# them per batch is cheap locally; the session's parquet-scan savings
# only SHOW when the stored relations are big (the 100 TB regime)
N_STANDING = int(sys.argv[sys.argv.index("--standing") + 1]) \
    if "--standing" in sys.argv else None

spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.conf.set("spark.sql.shuffle.partitions", "32")

if N_STANDING:
    # per-row unique LETTER word (digits would collapse shingles less),
    # 12+ words so the 5-shingle relation has real width
    base = spark.range(N_STANDING + 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 50).cast("string")).alias(
            "source"
        ),
        F.concat(
            F.lit("the corpus holds rows and the engine scans them "
                  "with a standing filter token "),
            F.translate(F.col("id").cast("string"),
                        "0123456789", "abcdefghij"),
        ).alias("text"),
    )
    standing = base.filter(F.col("doc_id") < N_STANDING)
    arrivals = base.filter(F.col("doc_id") >= N_STANDING)
else:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    standing = docs.filter(F.col("doc_id") % 10 != 0)
    arrivals = docs.filter(F.col("doc_id") % 10 == 0)
n_arr = arrivals.count()
step = n_arr // N_BATCHES + 1
ordered = arrivals.withColumn(
    "_rk", F.row_number().over(Window.orderBy("doc_id"))
)
batches = [
    ordered.filter(
        (F.col("_rk") > i * step) & (F.col("_rk") <= (i + 1) * step)
    ).drop("_rk").localCheckpoint()  # pin batch contents outside the timers
    for i in range(N_BATCHES)
]

work = tempfile.mkdtemp(prefix="admit_steady_")
result: dict = {"n_batches": N_BATCHES, "sf_dir": SF_DIR, "n_arrivals": n_arr,
                "n_standing": N_STANDING or "sf documents"}

try:
    runs: dict[str, str] = {}
    for mode in ("reread", "session"):
        root = f"{work}/{mode}"
        nd = f"{root}/neardup"
        if N_STANDING:
            llm_dedup.write_neardup_banding_layout(standing, nd)
        else:
            shutil.copytree(Q._neardup_layout(spark, SF_DIR), nd)
        bloom = f"{root}/bloom"
        llm_dedup.write_bloom_layout(
            standing.select(F.md5("text").alias("_fp")), bloom, "_fp",
            k=4, bits_per_key=6,
        )
        decisions = f"{root}/decisions"
        runs[mode] = decisions
        sess = (
            stateful.AdmissionSession(
                spark, bloom, nd, quota=Q._ADMIT_QUOTA, tau=Q._INC_ND_TAU
            )
            if mode == "session"
            else None
        )
        times = []
        for i, b in enumerate(batches):
            t0 = time.monotonic()
            if sess is not None:
                sess.admit_and_fold(b, i, decisions)
            else:
                stateful.admit_and_fold(
                    spark, b, i, bloom, nd, decisions,
                    quota=Q._ADMIT_QUOTA, tau=Q._INC_ND_TAU,
                )
            times.append(round(time.monotonic() - t0, 3))
            print(f"  {mode} batch {i}: {times[-1]}s", file=sys.stderr)
        if sess is not None:
            sess.close()
        result[mode] = {
            "per_batch_sec": times,
            "total_sec": round(sum(times), 2),
            "steady_median_sec": round(statistics.median(times[2:]), 3),
        }

    a = {(r.doc_id, r.stage)
         for r in spark.read.parquet(runs["reread"]).collect()}
    b = {(r.doc_id, r.stage)
         for r in spark.read.parquet(runs["session"]).collect()}
    assert a == b, "session decisions diverged from per-batch-reread twin"
    result["decisions_match"] = True
    result["speedup_steady"] = round(
        result["reread"]["steady_median_sec"]
        / result["session"]["steady_median_sec"], 2,
    )
    print(json.dumps(result))
finally:
    shutil.rmtree(work, ignore_errors=True)
