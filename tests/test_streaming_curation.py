"""Streaming curation twin (VERDICT r8 #5): the composed curation stages
as one continuous-ingest pipeline — narrow scrub/quality/lang maps,
watermarked exact-dedup, selection, per-source quota — checked for
multi-batch parity against the BATCH library composition on the same
fixture (r8's lesson: composition is where stateful bugs hide)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_to_nexus_spark.llm import text as llm_text
from kafka_to_nexus_spark.llm.bpe import bpe_count_expr
from kafka_to_nexus_spark.streaming import stateful

GOOD = ("the quick brown fox is one of the best examples of a pangram "
        "and the sentence is used in a lot of tests")
QUALITY_TAU, PII_CAP, QUOTA = 0.52, 1, 2

# (doc_id, text, source) — one file per BATCH below; duplicates are split
# across batches so the earlier batch deterministically wins (intra-batch
# dedup survivor is arrival-order / partition-race)
B1 = [
    (1, GOOD + " alpha", "src_a"),
    (2, GOOD + " beta", "src_a"),
    (3, "der die das und ist von zu der die das und ist von zu", "src_a"),
    (4, GOOD + " gamma", "src_b"),
]
B2 = [
    (5, GOOD + " alpha", "src_b"),        # exact dup of doc 1 → dropped
    (6, GOOD + " delta", "src_a"),        # src_a over quota → dropped
    (7, "x! y? z.", "src_b"),             # < 5 tokens → quality 0
    (8, GOOD + " mail me a@b.com or c@d.com now", "src_b"),  # 2 PII > cap
    (9, GOOD + " epsilon", "src_b"),
]


def _write_batch(path, rows, ts0):
    with open(path, "w") as f:
        for i, (doc_id, text, src) in enumerate(rows):
            f.write(json.dumps({
                "doc_id": doc_id, "text": text, "source_name": src,
                "timestamp": (ts0 + i) * 1_000_000_000,
            }) + "\n")


def _batch_expected(spark, rows, quota):
    """The batch curation_pipeline's stage composition over the union of
    all batches: fp-dedup keeping min doc_id, then selection, then a
    per-source event-time quota (the batch twin of the admission
    stream)."""
    df = spark.createDataFrame(
        [(d, t, s, (1000 + i) * 1_000_000_000)
         for i, (d, t, s) in enumerate(rows)],
        "doc_id long, text string, source_name string, timestamp long",
    )
    enriched = llm_text.lang_id(
        llm_text.quality_score(llm_text.scrub_pii(df),
                               text_col="scrubbed_text"),
        text_col="scrubbed_text",
    ).withColumn(
        "fp",
        F.md5(F.regexp_replace(F.lower(F.col("scrubbed_text")), "[^a-z ]", "")),
    )
    n_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")
             + F.col("n_url"))
    kept = enriched.withColumn(
        "_rk", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ).filter(
        (F.col("_rk") == 1)
        & (F.col("predicted_lang") == "en")
        & (F.round(F.col("quality"), 6) >= QUALITY_TAU)
        & (n_pii <= PII_CAP)
    )
    admitted = kept.withColumn(
        "quota_rank",
        F.row_number().over(
            Window.partitionBy("source_name").orderBy("timestamp", "doc_id")
        ).cast("long"),
    ).filter(F.col("quota_rank") <= quota)
    return {
        r.doc_id: (r.quality, r.n_pii, r.n_tokens, r.bpe_tokens,
                   r.source_name, r.quota_rank)
        for r in admitted.select(
            "doc_id",
            F.round("quality", 6).alias("quality"),
            n_pii.cast("long").alias("n_pii"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(bpe_count_expr("scrubbed_text")).cast("long").alias(
                "bpe_tokens"),
            "source_name", "quota_rank",
        ).collect()
    }


def test_curation_stream_multibatch_parity_with_batch_pipeline(
    spark, tmp_path
):
    fixture_dir = tmp_path / "in"
    fixture_dir.mkdir()
    _write_batch(fixture_dir / "b1.json", B1, 1000)
    _write_batch(fixture_dir / "b2.json", B2, 1000 + len(B1))

    stream = (
        spark.readStream
        .schema("doc_id long, text string, source_name string, "
                "timestamp long")
        .option("maxFilesPerTrigger", 1)
        .json(str(fixture_dir))
    )
    out = stateful.curation_stream(
        stream, quality_tau=QUALITY_TAU, pii_cap=PII_CAP,
        quota=QUOTA, watermark="10 minutes",
    )
    q = (out.writeStream.format("memory").queryName("curation_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.quality, r.n_pii, r.n_tokens, r.bpe_tokens,
                   r.source_name, r.quota_rank)
        for r in spark.table("curation_stream").collect()
    }
    expected = _batch_expected(spark, B1 + B2, QUOTA)
    assert got == expected, (got, expected)
    # non-vacuity: every stage filtered someone
    assert set(got) == {1, 2, 4, 9}
    # docs dropped for distinct reasons: 5 dedup, 3 lang, 7 quality,
    # 8 PII, 6 quota
    assert got[9][5] == 2  # second src_b admission


def test_curation_stream_without_quota_keeps_all_passing(spark, tmp_path):
    fixture_dir = tmp_path / "in"
    fixture_dir.mkdir()
    _write_batch(fixture_dir / "b1.json", B1, 1000)
    _write_batch(fixture_dir / "b2.json", B2, 1000 + len(B1))
    stream = (
        spark.readStream
        .schema("doc_id long, text string, source_name string, "
                "timestamp long")
        .option("maxFilesPerTrigger", 1)
        .json(str(fixture_dir))
    )
    out = stateful.curation_stream(
        stream, quality_tau=QUALITY_TAU, pii_cap=PII_CAP,
    )
    assert "quota_rank" not in out.columns
    q = (out.writeStream.format("memory").queryName("curation_noquota")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.table("curation_noquota").collect()}
    assert got == {1, 2, 4, 6, 9}  # doc 6 passes without the quota stage
