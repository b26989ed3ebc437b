"""The deterministic KLL-style quantile sketch (L86): pure-Python model
parity, weight conservation, repartition-invariance, merge monoid, and a
measured accuracy band against exact quantiles."""

import hashlib

import pytest

from pyspark.sql import functions as F

from kafka_to_nexus_spark.llm import quantiles as qz


# --- pure-Python model: the same rounds, the same flips ---------------------

def _parity_py(level: int, rnd: int) -> int:
    return int(hashlib.md5(f"{level}:{rnd}".encode()).hexdigest()[0], 16) % 2


def _compact_round_py(items, rnd, k, sharded):
    """items: list of (shard, level, value, tb). Mirrors
    qz._compact_round exactly (pinned by test_model_parity)."""
    from collections import defaultdict

    groups = defaultdict(list)
    for it in items:
        key = (it[0], it[1]) if sharded else (it[1],)
        groups[key].append(it)
    out = []
    for key, members in groups.items():
        level = key[-1]
        cnt = len(members)
        if cnt <= k:
            out.extend(members)
            continue
        members.sort(key=lambda it: (it[2], it[3]))
        pairs = cnt // 2 * 2
        par = _parity_py(level, rnd)
        for rn, it in enumerate(members):
            if rn >= pairs:
                out.append(it)
            elif rn % 2 == par:
                out.append((it[0], level + 1, it[2], it[3]))
    return out


def _sketch_py(values_tb, k=qz.DEFAULT_K, shards=qz.DEFAULT_SHARDS):
    items = [(tb % shards, 0, v, tb) for tb, v in values_tb]
    for rnd in range(qz.SHARD_ROUNDS):
        items = _compact_round_py(items, rnd, k, sharded=True)
    items = [(None, lvl, v, tb) for _, lvl, v, tb in items]
    for rnd in range(qz.GLOBAL_ROUNDS):
        items = _compact_round_py(items, qz.SHARD_ROUNDS + rnd, k, False)
    return sorted((lvl, v, tb) for _, lvl, v, tb in items)


def _docs(spark, sf="0.01"):
    return spark.read.parquet(
        f"/root/testdata/sf{sf}/documents.parquet"
    ).select("doc_id", "n_chars")


def test_sketch_matches_pure_python_model(spark):
    """The Spark sketch relation is BYTE-identical to an independent
    python implementation of the same rounds — the L36/L45 model-parity
    move, here over the full level structure, not just the answers."""
    docs = _docs(spark)
    got = sorted(
        (r.level, r.value, r.tb)
        for r in qz.build_sketch(docs, "n_chars", "doc_id").collect()
    )
    want = _sketch_py(
        [(r.doc_id, r.n_chars) for r in docs.collect()]
    )
    assert got == want
    # compaction actually happened at this corpus size (at 256 shards the
    # sf0.01 shard phase is identity — ~2 docs/shard — so the GLOBAL
    # rounds do the compacting: 500 level-0 items > k=32)
    assert any(lvl > 0 for lvl, _, _ in got)
    assert len(got) < docs.count()


def test_sketch_matches_model_with_shard_compaction(spark):
    """Same parity at shards=8, where sf0.01 DOES overflow the per-shard
    capacity (~62 items/shard > k=32) — keeps the SHARDED compaction leg
    exercised now that the 256-shard registry default leaves it identity
    at the small test tiers (the default only overflows shards past
    ~8k items)."""
    docs = _docs(spark)
    got = sorted(
        (r.level, r.value, r.tb)
        for r in qz.build_sketch(
            docs, "n_chars", "doc_id", shards=8
        ).collect()
    )
    pairs = [(r.doc_id, r.n_chars) for r in docs.collect()]
    assert got == _sketch_py(pairs, shards=8)
    # and the sharded rounds really compacted (shard-phase levels > 0
    # before any global round could run): re-run the model shard phase
    items = [(tb % 8, 0, v, tb) for tb, v in pairs]
    for rnd in range(qz.SHARD_ROUNDS):
        items = _compact_round_py(items, rnd, qz.DEFAULT_K, sharded=True)
    assert any(lvl > 0 for _, lvl, _, _ in items)


def test_sketch_weight_is_exactly_n(spark):
    """KLL conserves weight EXACTLY: a compaction turns a pair of
    weight-2^l items into one weight-2^(l+1) item, so Σ 2^level == n
    always (odd leftovers stay in place). total_weight is therefore the
    true count, not an estimate."""
    docs = _docs(spark)
    out = qz.quantiles_from_sketch(
        qz.build_sketch(docs, "n_chars", "doc_id")
    ).collect()
    n = docs.count()
    assert all(r.total_weight == n for r in out)
    assert {r.quantile for r in out} == {q for q, _, _ in qz.QUANTILES}


def test_sketch_deterministic_under_repartition(spark):
    """The sketch is a function of the DATA: content-keyed shards and
    md5 flips make the result identical across physical layouts."""
    docs = _docs(spark)
    a = qz.build_sketch(docs.repartition(3), "n_chars", "doc_id")
    b = qz.build_sketch(
        docs.repartition(17, "n_chars"), "n_chars", "doc_id"
    )
    rows = lambda df: sorted((r.level, r.value, r.tb) for r in df.collect())
    assert rows(a) == rows(b)


def _exact_rank(values, v):
    return sum(1 for x in values if x <= v)


def test_sketch_quantiles_within_band(spark):
    """Accuracy: for every reported quantile, the EXACT rank of the
    returned value is within eps*W of the target, eps = 0.05 (measured
    headroom ~2x over the worst observed at both sf tiers; the
    theoretical KLL(c=1) bound at k=32 is looser)."""
    for sf in ("0.001", "0.01"):
        docs = _docs(spark, sf)
        values = [r.n_chars for r in docs.collect()]
        out = qz.quantiles_from_sketch(
            qz.build_sketch(docs, "n_chars", "doc_id")
        ).collect()
        n = len(values)
        for r in out:
            rank = _exact_rank(values, r.q_value)
            assert abs(rank - r.target_rank) <= max(0.05 * n, 2), (
                sf, r.quantile, rank, r.target_rank, n,
            )


def test_sketch_merge_monoid(spark):
    """Merging two half-corpus sketches yields a valid sketch of the
    union: weight exactly n_total, quantiles inside the same band, and
    merge(a, b) == merge(b, a) (the flips depend on (level, round),
    never on operand order)."""
    docs = _docs(spark)
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    sa = qz.build_sketch(left, "n_chars", "doc_id")
    sb = qz.build_sketch(right, "n_chars", "doc_id")
    merged = qz.merge_sketches(sa, sb)
    out = qz.quantiles_from_sketch(merged).collect()
    values = [r.n_chars for r in docs.collect()]
    n = len(values)
    assert all(r.total_weight == n for r in out)
    for r in out:
        rank = _exact_rank(values, r.q_value)
        assert abs(rank - r.target_rank) <= max(0.06 * n, 2), (
            r.quantile, rank, r.target_rank,
        )
    swapped = qz.merge_sketches(sb, sa)
    rows = lambda df: sorted((r.level, r.value, r.tb) for r in df.collect())
    assert rows(merged) == rows(swapped)


def test_merge_unroll_scales_with_level(spark):
    """ADVICE r11: the merge unroll follows the union's max level. A
    standing sketch that is over capacity at MANY levels at once (the
    long-running-stream shape a fixed 8-round unroll cannot converge —
    the overflow wave climbs one level per round) must come out of ONE
    merge with every level back at/under capacity and weight conserved;
    and any rounds beyond convergence are identities (an explicit larger
    unroll returns the byte-identical relation)."""
    k = qz.DEFAULT_K
    deep = [(lvl, v * 7919 % 65537, lvl * 1000 + v)
            for lvl in range(13) for v in range(2 * k)]
    half = len(deep) // 2
    mk = lambda rows_: spark.createDataFrame(
        rows_, "level long, value long, tb long")
    a, b = mk(deep[:half]), mk(deep[half:])
    want_w = sum(2 ** lvl for lvl, _, _ in deep)
    merged = qz.merge_sketches(a, b).persist()
    by_level = {
        r.level: r["count"]
        for r in merged.groupBy("level").count().collect()
    }
    assert all(c <= k for c in by_level.values()), by_level
    w = merged.selectExpr(
        "sum(shiftleft(CAST(1 AS BIGINT), CAST(level AS INT))) AS w"
    ).first().w
    assert w == want_w
    rows = lambda df: sorted((r.level, r.value, r.tb) for r in df.collect())
    assert rows(qz.merge_sketches(a, b, rounds=30)) == rows(merged)
    merged.unpersist()


def test_sketch_plan_is_bounded_windows(spark):
    """Scale shape: every window partitions by (shard, level) or
    (level) — there is NO un-partitioned window over the raw corpus (the
    global running-sum window runs over the compacted sketch only, a
    k*levels-sized relation), and no cartesian product."""
    docs = _docs(spark)
    df = qz.quantiles_from_sketch(
        qz.build_sketch(docs, "n_chars", "doc_id", adaptive=False)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only global-sort windows come AFTER the final compaction
    # (running cum over the sketch); the corpus-sized stage is always
    # hash-partitioned by shard
    assert "hashpartitioning(shard" in plan, plan[:2000]
    # VERDICT r11 #3: the shard count is the first-stage parallelism —
    # 8 serialized the corpus onto 8 reducers; the floor is now 256
    assert qz.DEFAULT_SHARDS >= 256
    # r12: the corpus shuffles ONCE — all 16 shard rounds ride the one
    # (shard) exchange as local sorts (hashpartitioning(shard) satisfies
    # every (shard, level) window clustering), and W rides the running-
    # sum window stage instead of a second agg over the sketch subtree
    assert plan.count("hashpartitioning(shard") == 1, plan[:2000]
    # r13 adaptive: at this corpus every (shard, level) cell fits in k,
    # so the DEFAULT build drops the shard phase AND its corpus shuffle
    # entirely — the plan has no shard exchange at all
    aplan = (
        qz.build_sketch(docs, "n_chars", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(shard" not in aplan, aplan[:2000]


def test_sketch_stream_matches_sequential_merges(spark, tmp_path):
    """Streaming maintenance: per micro-batch build + merge into the
    standing generation, atomic pointer publish. The streamed final
    sketch must equal the batch-side sequential merges of the same
    splits BYTE-for-byte (merge is deterministic), and rebuilding a
    generation from its inputs (a replayed batch) reproduces it exactly
    — the exactly-once story."""
    import json
    import os

    batches = [
        [(tb, (tb * 37) % 997) for tb in range(lo, lo + 120)]
        for lo in (0, 120, 240)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for seq, rows in enumerate(batches):
        with open(in_dir / f"b{seq}.json", "w") as fh:
            for tb, v in rows:
                fh.write(json.dumps({"tb": tb, "value": v}) + "\n")
        t0 = 1_700_000_000 + seq * 10
        os.utime(in_dir / f"b{seq}.json", (t0, t0))

    root = str(tmp_path / "sketch")
    stream = (spark.readStream.schema("tb long, value long")
              .option("maxFilesPerTrigger", 1).json(str(in_dir)))
    q = qz.sketch_stream(stream, root, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cur = qz.resolve_sketch_generation(root)
    assert cur is not None and cur.endswith("gen-2")
    rows = lambda df: sorted((r.level, r.value, r.tb) for r in df.collect())
    got = rows(qz.read_sketch_layout(spark, cur))

    # batch twin: sequential merges of the same splits
    def bdf(rows_):
        return spark.createDataFrame(rows_, "tb long, value long")

    acc = qz.build_sketch(bdf(batches[0]), "value", "tb")
    for rows_ in batches[1:]:
        acc = qz.merge_sketches(acc, qz.build_sketch(bdf(rows_), "value", "tb"))
    assert got == rows(acc)

    # weight == total rows (conservation survives the streamed merges)
    out = qz.quantiles_from_sketch(
        qz.read_sketch_layout(spark, cur)).collect()
    assert all(r.total_weight == sum(len(b) for b in batches) for r in out)

    # replay: rebuild gen-2 from gen-1 + batch 2 → byte-identical
    prev = qz.read_sketch_layout(spark, os.path.join(root, "gen-1"))
    replay = qz.merge_sketches(
        prev, qz.build_sketch(bdf(batches[2]), "value", "tb"))
    assert rows(replay) == got


def test_grouped_sketch_equals_independent_group_builds(spark):
    """Per-group construction decomposes EXACTLY: building with
    group_cols=("lang",) yields, for every language, the byte-identical
    sketch of that language's subset built alone — the group columns
    only prefix the partition keys, so each group's compaction history
    is untouched by the others. Grouped quantiles therefore inherit
    every global pin (model parity, weight conservation, accuracy band)
    per group for free; this test pins the decomposition and the
    per-group weights."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("lang", "doc_id", "n_chars")
    grouped = qz.build_sketch(
        docs, "n_chars", "doc_id", group_cols=("lang",)
    )
    rows = lambda df, *c: sorted(tuple(r[x] for x in c) for r in df.collect())
    got = {}
    for r in grouped.collect():
        got.setdefault(r.lang, []).append((r.level, r.value, r.tb))
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert set(got) == set(langs)
    for lang in langs:
        solo = qz.build_sketch(
            docs.filter(F.col("lang") == lang), "n_chars", "doc_id"
        )
        assert sorted(got[lang]) == rows(solo, "level", "value", "tb"), lang

    out = qz.grouped_quantiles_from_sketch(grouped, ("lang",)).collect()
    n_by_lang = {r.lang: r["count"] for r in
                 docs.groupBy("lang").count().collect()}
    assert all(r.total_weight == n_by_lang[r.lang] for r in out)
    assert len(out) == len(langs) * len(qz.QUANTILES)


def test_adaptive_build_is_byte_identical_to_fixed(spark):
    """The adaptive round count (r13) NEVER changes the sketch: the
    rounds it skips are identities and the parity indices of the rounds
    it keeps are unchanged — pinned byte-identical to the fixed unroll
    across the regimes: shard phase skipped (cells fit k), shard phase
    compacting (shards=8), grouped, and adversarial tb concentration
    (every row of a group in ONE shard — the cell bound must be exact,
    not typical)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "n_chars", "lang")

    def rel(df):
        cols = [c for c in df.columns]
        return sorted(tuple(r) for r in df.collect())

    for kwargs in (
        {},  # 256 shards: shard phase identity -> skipped
        {"shards": 8},  # sharded rounds genuinely compact
        {"group_cols": ("lang",)},
        {"k": 4},
    ):
        fixed = qz.build_sketch(
            docs, "n_chars", "doc_id", adaptive=False, **kwargs
        )
        adapt = qz.build_sketch(docs, "n_chars", "doc_id", **kwargs)
        assert rel(fixed) == rel(adapt), kwargs

    # adversarial concentration: tb ≡ 0 (mod shards) puts the whole
    # corpus in one shard cell — cell_max = N, not N/shards
    from pyspark.sql import functions as F

    skew = docs.select(
        (F.col("doc_id") * 256).alias("doc_id"), "n_chars"
    )
    fixed = qz.build_sketch(skew, "n_chars", "doc_id", adaptive=False)
    adapt = qz.build_sketch(skew, "n_chars", "doc_id")
    assert rel(fixed) == rel(adapt)
    # and the skew build really exercised the shard phase (levels > 0
    # exist before the global rounds could make them at 500 > k items)
    assert any(r.level > 0 for r in adapt.collect())


def test_adaptive_build_empty_and_merge_paths(spark):
    docs = _docs(spark).limit(0)
    assert qz.build_sketch(docs, "n_chars", "doc_id").count() == 0
    full = _docs(spark)
    a = full.filter("doc_id % 2 = 0")
    b = full.filter("doc_id % 2 = 1")
    merged = qz.merge_sketches(
        qz.build_sketch(a, "n_chars", "doc_id"),
        qz.build_sketch(b, "n_chars", "doc_id"),
    )
    w = sum(1 << r.level for r in merged.collect())
    assert w == full.count()
