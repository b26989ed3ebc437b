"""Property-based specs for the LLM-pipeline operators: Spark must agree
with a naive Python model on arbitrary inputs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from kafka_to_nexus_spark.llm import dedup, similarity

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=10,
)


from conftest import union_find_components


def _model_components(edges: list[tuple[int, int]], vertices: list[int]) -> dict:
    # min-label union-find makes the root the min member directly
    return union_find_components(edges, vertices)


@given(edge_lists)
@PROP_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    vertices = list(range(13))
    e = [(min(a, b), max(a, b)) for a, b in edges]
    edf = (
        spark.createDataFrame(e, ["id_a", "id_b"])
        if e
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    vdf = spark.createDataFrame([(v,) for v in vertices], ["doc_id"])
    # driver_edge_threshold=0 forces the DISTRIBUTED label-propagation
    # loop — the driver union-find regime is itself a union-find, so the
    # loop is the regime this model test must pin.
    got = {
        r.doc_id: r.component_id
        for r in dedup.connected_components(
            edf, vdf, driver_edge_threshold=0
        ).collect()
    }
    assert got == _model_components(e, vertices)
    driver = {
        r.doc_id: r.component_id
        for r in dedup.connected_components(edf, vdf).collect()
    }
    assert driver == got  # tiny-regime union-find agrees with the loop


vectors = st.lists(
    st.lists(st.floats(-8, 8, allow_nan=False, width=32), min_size=8, max_size=8),
    min_size=1,
    max_size=6,
)


@given(vectors)
@PROP_SETTINGS
def test_srp_signature_matches_numpy_model(spark, vecs):
    planes = similarity.srp_planes(8, 8)
    H = np.array(planes)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.srp_sig
        for r in similarity.srp_signatures(df, bits=8, dim=8).collect()
    }
    # the signature's contract is sign(fold) under Spark's STRICT
    # left-to-right aggregate from 0.0 — numpy's pairwise @ associates
    # differently and can disagree at exact-zero boundaries (hypothesis
    # found ±2^-52 sums), so the model folds in the same order
    def fold_dot(plane, arr):
        acc = 0.0
        for x, h in zip(arr, plane):
            acc += x * h
        return acc

    for i, v in enumerate(vecs):
        arr = np.asarray(v, dtype=np.float64)
        expect = sum(int(fold_dot(H[j], arr) >= 0) << j for j in range(8))
        assert got[i] == expect


# --- sketch estimators vs pure-Python models --------------------------------
# The DuckDB oracles prove ENGINE-PORTABILITY of the sketch queries; these
# prove the ESTIMATOR ITSELF — an independent Python implementation of the
# same md5-sliced HLL / CMS must reproduce the SQL's numbers exactly (every
# float path is either exact (2^-r sums, bin-length ranks) or provably
# round-stable: min |round-boundary distance| for 64*ln(64/V) over all V is
# ~9.5e-5, far above a 1-ulp log difference).

import hashlib
import math


def _hll_model(ids: list[int], m: int = 64) -> tuple[int, int]:
    regs: dict[int, int] = {}
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        idx = int(h[:8], 16) % m
        w = int(h[8:16], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    v = m - len(regs)
    s = sum(2.0 ** -r for r in regs.values()) + v
    raw = 0.709 * m * m / s
    est = m * math.log(m / v) if raw <= 2.5 * m and v > 0 else raw
    return int(round(est)), v


@given(ids=st.lists(st.integers(0, 40), min_size=1, max_size=60))
@PROP_SETTINGS
def test_hll_sql_matches_python_model(spark, ids):
    from kafka_to_nexus_spark import queries as Q

    rows = [(int(i), "t") for i in ids]
    spark.createDataFrame(rows, "event_id long, event_type string") \
        .createOrReplaceTempView("events")
    try:
        got = spark.sql(Q.SPARK_SQL["hll_distinct_sketch"]).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert len(got) == 1
    est, v = _hll_model(sorted(set(ids)))
    assert got[0]["hll_distinct"] == est
    assert got[0]["empty_registers"] == v
    assert got[0]["exact_distinct"] == len(set(ids))


def _cms_model(texts: list[tuple[int, str]], w: int = 256) -> list[tuple[str, int, int]]:
    counts: dict[str, int] = {}
    for _, t in texts:
        for term in t.lower().split(" "):
            if term:
                counts[term] = counts.get(term, 0) + 1
    cells: list[dict[int, int]] = [{} for _ in range(4)]
    for term, c in counts.items():
        h = hashlib.md5(term.encode()).hexdigest()
        for r in range(4):
            b = int(h[8 * r: 8 * r + 8], 16) % w
            cells[r][b] = cells[r].get(b, 0) + c
    out = []
    for term, c in counts.items():
        h = hashlib.md5(term.encode()).hexdigest()
        est = min(cells[r][int(h[8 * r: 8 * r + 8], 16) % w] for r in range(4))
        out.append((term, est, c))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:20]


@given(texts=st.lists(
    st.text(alphabet="ab X", min_size=0, max_size=12), min_size=1, max_size=12))
@PROP_SETTINGS
def test_cms_sql_matches_python_model(spark, texts):
    from kafka_to_nexus_spark import queries as Q

    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        got = [(r["term"], r["cms_count"], r["exact_count"])
               for r in spark.sql(Q.SPARK_SQL["cms_heavy_hitters"]).collect()]
    finally:
        spark.catalog.dropTempView("documents")
    assert got == _cms_model(rows)


def _budget_model(texts: list[str], frac: float = 0.30) -> list[tuple[int, int, int]]:
    docs = []
    for i, t in enumerate(texts):
        words = t.split(" ")
        toks, uniq = len(words), len(set(words))
        qb = min(999, math.floor(uniq / toks * 1000))
        docs.append((i, qb, toks))
    hist: dict[int, int] = {}
    for _, qb, toks in docs:
        hist[qb] = hist.get(qb, 0) + toks
    total = sum(hist.values())
    kept, cum = set(), 0
    for qb in sorted(hist, reverse=True):
        cum += hist[qb]
        if cum <= frac * total:
            kept.add(qb)
    return sorted(d for d in docs if d[1] in kept)


@given(texts=st.lists(
    st.text(alphabet="ab X", min_size=0, max_size=12), min_size=1, max_size=14))
@PROP_SETTINGS
def test_token_budget_sql_matches_python_model(spark, texts):
    from kafka_to_nexus_spark import queries as Q

    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        got = sorted(
            (r["doc_id"], r["quality_bucket"], r["doc_tokens"])
            for r in spark.sql(Q.SPARK_SQL["token_budget_select"]).collect()
        )
    finally:
        spark.catalog.dropTempView("documents")
    expect = _budget_model(texts)
    assert got == expect
    # the selection respects the budget and is greedy-top: kept buckets
    # strictly outrank every dropped doc's bucket
    if got:
        total = sum(len(t.split(" ")) for t in texts)
        assert sum(g[2] for g in got) <= 0.30 * total
        kept_ids = {g[0] for g in got}
        min_kept = min(g[1] for g in got)
        dropped_buckets = {qb for i, qb, _ in
                           ((i, min(999, math.floor(
                               len(set(t.split(" "))) / len(t.split(" ")) * 1000)),
                             None) for i, t in enumerate(texts))
                           if i not in kept_ids}
        assert all(qb < min_kept for qb in dropped_buckets)


def _merge_model(texts: list[str]) -> list[tuple[int, str, bool]]:
    corpus = {hashlib.md5(t.encode()).hexdigest()
              for i, t in enumerate(texts) if i % 10 < 8}
    incoming = [(i, hashlib.md5(t.encode()).hexdigest())
                for i, t in enumerate(texts) if i % 10 >= 8]
    firsts: dict[str, int] = {}
    for i, h in incoming:
        firsts.setdefault(h, i)
    return sorted((i, h, h not in corpus and firsts[h] == i)
                  for i, h in incoming)


@given(texts=st.lists(
    st.text(alphabet="ab", min_size=0, max_size=4), min_size=1, max_size=24))
@PROP_SETTINGS
def test_incremental_merge_sql_matches_python_model(spark, texts):
    from kafka_to_nexus_spark import queries as Q

    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        got = sorted(
            (r["doc_id"], r["content_hash"], r["accept"])
            for r in spark.sql(Q.SPARK_SQL["incremental_dedup_merge"]).collect()
        )
    finally:
        spark.catalog.dropTempView("documents")
    assert got == _merge_model(texts)


# ---------------------------------------------------------------------------
# Star+chain bucket cap: component preservation on the raw candidate graph
# ---------------------------------------------------------------------------

bucket_assignments = st.lists(
    # (doc_id, bucket) — several docs share buckets, docs appear in
    # multiple buckets (multi-band behavior), ids non-contiguous
    st.tuples(st.integers(0, 40), st.integers(0, 5)),
    min_size=0,
    max_size=60,
)


@given(assign=bucket_assignments, cap=st.integers(1, 4))
@PROP_SETTINGS
def test_star_chain_cap_preserves_components(assign, cap):
    """The pure math of lsh_candidate_pairs/srp_candidate_pairs' cap:
    per bucket, clique over the lowest-id ``cap`` members plus star
    (canonical) and chain (rank-predecessor) edges for the rest must
    produce EXACTLY the components of the full per-bucket cliques, for
    any bucket structure."""
    from itertools import combinations

    buckets: dict[int, list[int]] = {}
    for d, b in assign:
        if d not in buckets.setdefault(b, []):
            buckets[b].append(d)

    full, capped = [], []
    for members in buckets.values():
        members = sorted(members)
        full.extend(combinations(members, 2))
        kept = members[:cap]
        capped.extend(combinations(kept, 2))
        for rank in range(cap, len(members)):
            capped.append((members[0], members[rank]))       # star
            capped.append((members[rank - 1], members[rank]))  # chain

    vertices = sorted({d for d, _ in assign})
    assert _model_components(capped, vertices) == _model_components(full, vertices)


# ---------------------------------------------------------------------------
# Container-metadata parsers: total functions over arbitrary bytes
# ---------------------------------------------------------------------------

from kafka_to_nexus_spark.llm import multimodal  # noqa: E402


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_image_parser_never_raises(payload):
    """At 100 TB some payloads WILL be garbage: the parser must return a
    well-formed tuple or None for ANY byte string, never raise (a poison
    payload would kill the executor task)."""
    out = multimodal.parse_image_dims(payload)
    assert out is None or (
        out[0] in ("png", "jpeg") and out[1] > 0 and out[2] > 0
    )


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_wav_parser_never_raises(payload):
    out = multimodal.parse_wav_meta(payload)
    assert out is None or (len(out) == 4 and all(v >= 0 for v in out))


# adversarial prefixes: valid magic bytes followed by arbitrary tails
@given(st.sampled_from([b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"RIFF"]),
       st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_parsers_survive_magic_plus_garbage(magic, tail):
    multimodal.parse_image_dims(magic + tail)
    multimodal.parse_wav_meta(magic + tail)


@given(st.integers(1, 2**31 - 1), st.integers(1, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_any_u32_dims(w, h):
    payload = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
               + w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(5))
    assert multimodal.parse_image_dims(payload) == ("png", w, h)


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_png_pixel_decoder_never_raises(payload):
    """The PIXEL decoder is total like the metadata parsers: any byte
    string yields a (w, h, rows) triple or None — inflate errors, bad
    filters, palette overruns, truncated chunks all degrade to None."""
    out = multimodal.parse_png_pixels(payload)
    if out is not None:
        w, h, rows = out
        assert len(rows) == h and all(len(r) == w for r in rows)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_png_pixel_decoder_survives_corrupted_valid_png(tail):
    """Adversarial: a VALID png prefix with arbitrary trailing bytes, and
    a valid png with bytes flipped mid-IDAT — decode or None, no raise."""
    img = [[(x * 16 + y) % 256 for x in range(4)] for y in range(4)]
    good = multimodal.encode_png(img, color_type=0)
    multimodal.parse_png_pixels(good + tail)
    if tail:
        pos = 40 + (tail[0] % max(len(good) - 48, 1))
        broken = good[:pos] + bytes([tail[0] ^ 0xFF]) + good[pos + 1 :]
        multimodal.parse_png_pixels(broken)


@given(
    st.integers(1, 9),
    st.integers(1, 9),
    st.sampled_from([0, 2, 4, 6]),
    st.sampled_from(["cycle", "none"]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_pixel_roundtrip_all_color_types_and_filters(w, h, ct, fmode, seed):
    """encode_png → parse_png_pixels is the identity on pixel content for
    every color type and both filter policies ('cycle' hits Sub, Up,
    Average, Paeth on successive scanlines — the defilter paths no
    stored-block oracle fixture can reach)."""
    rng = __import__("random").Random(seed)

    def px():
        if ct == 0:
            return rng.randrange(256)
        if ct == 2:
            return tuple(rng.randrange(256) for _ in range(3))
        if ct == 4:
            return (rng.randrange(256), rng.randrange(256))
        return tuple(rng.randrange(256) for _ in range(4))

    rows = [[px() for _ in range(w)] for _ in range(h)]
    got = multimodal.parse_png_pixels(
        multimodal.encode_png(rows, color_type=ct, filter_mode=fmode)
    )
    assert got is not None
    gw, gh, grows = got
    assert (gw, gh) == (w, h)
    for y in range(h):
        for x in range(w):
            p = rows[y][x]
            if ct == 0:
                want = (p, p, p)
            elif ct == 4:
                want = (p[0], p[0], p[0])
            else:
                want = tuple(p[:3])
            assert grows[y][x] == want


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([0, 2, 3, 4, 6]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_phash_numpy_path_matches_integer_twins(w, h, ct, seed):
    """The mapInPandas hot loop (_png_luminance + _phash64_np) must be
    bit-identical to the documented integer pipeline
    (parse_png_pixels → luminance_grid → box_downsample → ahash64/
    dhash64) for every color type, including dims that don't divide the
    8x8 grid and dims below it (the pure-Python fallback branch)."""
    import numpy as np

    rng = __import__("random").Random(seed)
    if ct == 3:
        palette = [tuple(rng.randrange(256) for _ in range(3))
                   for _ in range(rng.randrange(1, 17))]
        idx = [[rng.randrange(len(palette)) for _ in range(w)]
               for _ in range(h)]
        payload = multimodal.encode_png_palette(idx, palette)
    else:
        def px():
            if ct == 0:
                return rng.randrange(256)
            n_ch = {2: 3, 4: 2, 6: 4}[ct]
            return tuple(rng.randrange(256) for _ in range(n_ch))

        payload = multimodal.encode_png(
            [[px() for _ in range(w)] for _ in range(h)], color_type=ct
        )

    gw, gh, rows = multimodal.parse_png_pixels(payload)
    grid = multimodal.box_downsample(multimodal.luminance_grid(rows))
    want = (multimodal.ahash64(grid), multimodal.dhash64(grid))

    lum = multimodal._png_luminance(payload)
    assert lum is not None and lum.shape == (gh, gw)
    assert np.array_equal(
        lum, np.array(multimodal.luminance_grid(rows), dtype=np.int64)
    )
    assert multimodal._phash64_np(lum) == want


@given(st.integers(1, 65535), st.integers(1, 65535), st.integers(0, 3))
@settings(max_examples=50, deadline=None)
def test_jpeg_roundtrip_any_u16_dims(w, h, n_segments):
    out = b"\xff\xd8"
    for i in range(n_segments):
        seg = bytes(3 + i)  # odd/even pre-SOF segment sizes
        out += b"\xff\xe1" + (len(seg) + 2).to_bytes(2, "big") + seg
    sof = (b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + b"\x01\x01\x11\x00")
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    assert multimodal.parse_image_dims(out) == ("jpeg", w, h)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_mp4_parser_never_raises(payload):
    out = multimodal.parse_mp4_meta(payload)
    assert out is None or (out[0] > 0 and out[1] >= 0)


# ---------------------------------------------------------------------------
# BPE token counting: replace-chain compilation == classic iterative loop
# ---------------------------------------------------------------------------

from kafka_to_nexus_spark.llm import bpe as llm_bpe  # noqa: E402


def test_bpe_merge_table_well_formed():
    """The property that makes the rank-ordered replace chain equal to
    classic BPE — if someone edits MERGES into a non-well-formed state,
    the compilation silently diverges, so pin it."""
    assert llm_bpe.well_formed(llm_bpe.MERGES)
    # counterexamples the checker must reject
    assert not llm_bpe.well_formed([("a", "bc")])        # unseen constituent
    assert not llm_bpe.well_formed([("a", "b"), ("a", "b")])  # dup result
    # result consumed by an EARLIER merge: ("a","b")->"ab" after ("ab","c")
    assert not llm_bpe.well_formed([("a", "b"), ("c", "ab"), ("a", "b")])


def test_bpe_classic_examples():
    ranks = llm_bpe.merge_ranks()
    assert llm_bpe.bpe_encode("table", ranks) == ["table"]
    assert llm_bpe.bpe_encode("spark", ranks) == ["spark"]
    assert llm_bpe.bpe_encode("windowing", ranks) == [
        "w", "in", "d", "ow", "ing"
    ]
    assert llm_bpe.bpe_encode("zzz", ranks) == ["z", "z", "z"]
    assert llm_bpe.bpe_encode("a", ranks) == ["a"]


@given(st.lists(
    st.text(alphabet="abcdefghiklmnorstuvwy \t\n0123.,!'", min_size=0,
            max_size=60),
    min_size=1, max_size=8))
# r8 regressions: "thth" — adjacent occurrences of one pair share the
# boundary under single-separator encodings, so one replace pass merged
# only every other occurrence; "," — a punctuation pre-token equal to
# the wrapper delimiter must ride the plain char-count path
@example(texts=["thth", ",", "ananan the"])
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_expression_chain_matches_classic(spark, texts):
    """The compiled replace chain (what the engine and the DuckDB oracle
    run) and the Arrow path must both count exactly what the classic
    iterative algorithm counts, for arbitrary text over the supported
    alphabet (both engines' counts are also hash-compared by the driver;
    this pins the ALGORITHM, not just cross-engine agreement)."""
    ranks = llm_bpe.merge_ranks()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expected = {
        i: sum(len(llm_bpe.bpe_encode(w, ranks))
               for w in llm_bpe.pretokenize(t))
        for i, t in enumerate(texts)
    }
    got = {r.doc_id: r.bpe_tokens
           for r in llm_bpe.bpe_token_counts(df).collect()}
    assert got == expected, (texts, got, expected)
    got_arrow = {r.doc_id: r.bpe_tokens
                 for r in llm_bpe.bpe_token_counts_arrow(df).collect()}
    assert got_arrow == expected


def test_bpe_dialects_agree_on_general_text(spark):
    """ADVICE r8: the two certified-equal SQL dialects and the Arrow path
    must agree on GENERAL text, not just the tab-free corpus — tab/
    newline/CR are whitespace (zero tokens) on every path, NULL text
    counts 0 everywhere, and all-punctuation text keeps its punct tally
    (DuckDB's list_sum over an empty word list is NULL and must not
    swallow it).

    ADVICE r9: parity must also hold on the characters where the three
    regex engines' \\s classes DISAGREE — \\x0b (VT: Python+Java \\s,
    not RE2's), \\xa0 (NBSP: Python \\s only), \\x1f/\\x1c (C0: Python
    \\s only), \\x85 (NEL: Python \\s only) — which is why the zero-token
    class is the explicit [ \\x00-\\x1f] on every path. NBSP/NEL/U+2003
    are ordinary 1-token punct everywhere; VT and all C0 controls are
    zero everywhere (so no token can collide with the \\x1f stream
    separator)."""
    import duckdb

    ranks = llm_bpe.merge_ranks()
    cases = ["a b\tc", "tab\there\nand\rthere", "!!!", "", None,
             ",\t,", "  \t  ",
             # engine-divergent \s characters (ADVICE r9)
             "a\x0bb", "a\xa0b", "a\x1fb", "a\x1cb", "x\x85y",
             "p q", "a\x7fb", "\x1f\x1f", "\xa0\xa0"]
    expected = {
        i: sum(len(llm_bpe.bpe_encode(w, ranks))
               for w in llm_bpe.pretokenize(t or ""))
        for i, t in enumerate(cases)
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got_spark = {r.doc_id: r.bpe_tokens
                 for r in llm_bpe.bpe_token_counts(df).collect()}
    assert got_spark == expected
    got_arrow = {r.doc_id: r.bpe_tokens
                 for r in llm_bpe.bpe_token_counts_arrow(df).collect()}
    assert got_arrow == expected
    con = duckdb.connect()
    expr = llm_bpe.bpe_count_expr("t", dialect="duckdb")
    got_duck = {
        i: con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        for i, t in enumerate(cases)
    }
    assert got_duck == expected


def _bpe_train_model(texts, n_merges):
    """Pure-python BPE training: word-freq vocab, argmax pair by
    (count desc, pair asc), merge everywhere."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in llm_bpe.pretokenize(t):
            vocab[w] += 1
    states = {w: tuple(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for w, syms in states.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append((rank, best[0], best[1], counts[best]))
        a, b = best
        for w, syms in states.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            states[w] = tuple(out)
    return merges


@given(st.lists(st.text(alphabet="abcde ", min_size=1, max_size=30),
                min_size=1, max_size=6))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_train_matches_python_model(spark, texts):
    """The distributed trainer (vocab + per-iteration pair-count aggs +
    replace-chain state) must learn exactly what the classic per-word
    python trainer learns, for arbitrary corpora."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = llm_bpe.bpe_train(df, n_merges=4)
    assert got == _bpe_train_model(texts, 4), (texts, got)


def test_bpe_train_checkpointing_preserves_semantics(spark):
    """Materialized-state checkpoints (every k merges the pending replace
    chain is evaluated into the stored state and single-symbol words are
    dropped) must not change WHAT is learned — only how much expression
    depth each iteration carries. checkpoint_every=2 forces several
    checkpoint boundaries inside an 8-merge run."""
    texts = ["the cat sat on the mat", "the bat and the cat", "a t t h",
             "thththe the", "on and on and on"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expected = _bpe_train_model(texts, 8)
    assert llm_bpe.bpe_train(df, n_merges=8, checkpoint_every=2) == expected
    assert llm_bpe.bpe_train(df, n_merges=8, checkpoint_every=3) == expected


def test_bpe_trained_table_is_well_formed_and_usable(spark):
    """L52 ↔ L59 composition: a learned merge table is well-formed by
    construction (each pair's symbols exist at its own step), so it can
    drive the replace-chain counter directly."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = [(a, b) for _, a, b, _ in llm_bpe.bpe_train(docs, n_merges=8)]
    assert len(merges) == 8
    assert llm_bpe.well_formed(merges)
    out = llm_bpe.bpe_token_counts(docs.limit(20), merges=merges).collect()
    ranks = llm_bpe.merge_ranks(merges)
    for r in spark.createDataFrame(
        [(x.doc_id, x.bpe_tokens) for x in out], "doc_id long, n long"
    ).join(docs.limit(20), "doc_id").collect():
        expected = sum(len(llm_bpe.bpe_encode(w, ranks))
                       for w in llm_bpe.pretokenize(r.text))
        assert r.n == expected


def test_trained_vocab_artifact_well_formed_and_nonvacuous(spark):
    """The committed 1024-merge vocabulary (tools/train_bpe_vocab.py):
    full requested depth, well-formed (so the oracle's replace-chain
    replay is valid), and NON-VACUOUS on the real corpus — the early
    high-count merges come from the corpus itself, so encoding real text
    with the trained table must actually merge (tokens ≪ characters)."""
    merges = llm_bpe.trained_merges()
    assert len(merges) >= 1024
    assert llm_bpe.well_formed(merges)
    assert all(len(a + b) >= 2 for a, b in merges)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.bpe_tokens
           for r in llm_bpe.bpe_token_counts_arrow(
               docs, merges=merges).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    ranks = llm_bpe.merge_ranks(merges)
    for d, t in list(texts.items())[:50]:
        pre = llm_bpe.pretokenize(t)
        chars = sum(len(w) for w in pre)
        expected = sum(len(llm_bpe.bpe_encode(w, ranks)) for w in pre)
        assert got[d] == expected, (d, got[d], expected)
        # merges fire on real text: the trained encoding is far below the
        # character-level count (and at or below whitespace tokens would
        # be too strong — BPE sits between)
        assert got[d] < chars * 0.6, (d, got[d], chars)


def test_bpe_tokenize_arrow_matches_model_and_counts(spark):
    """bpe_tokenize_arrow emits the classic algorithm's token stream in
    pre-token order (punctuation riding as single chars), and its length
    always equals the counts path — on whitespace-pathological inputs."""
    ranks = llm_bpe.merge_ranks()
    cases = ["the table!", "a b\tc", "!!!", "", None, "thth ,"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: list(r.tokens)
           for r in llm_bpe.bpe_tokenize_arrow(df).collect()}
    for i, t in enumerate(cases):
        expected = []
        for w in llm_bpe.pretokenize(t or ""):
            expected.extend(llm_bpe.bpe_encode(w, ranks))
        assert got[i] == expected, (t, got[i], expected)
    counts = {r.doc_id: r.bpe_tokens
              for r in llm_bpe.bpe_token_counts_arrow(df).collect()}
    assert {i: len(v) for i, v in got.items()} == counts


def test_bpe_trained_tokenization_query_matches_duckdb_replay(spark):
    """End-to-end stream certificate at sf0.001: the Arrow tokenization
    (1024-merge trained table) vs the DuckDB ordered-stream replay —
    hash equality means every token, in order, in every doc."""
    import duckdb

    from kafka_to_nexus_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    sdf = (Q.queries()["bpe_trained_tokenization"](spark, sf)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = (con.execute(Q.oracle_sql()["bpe_trained_tokenization"]).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    assert (sdf["n_tokens"].values == odf["n_tokens"].values).all()
    assert (sdf["stream_md5"].values == odf["stream_md5"].values).all()


def test_bpe_trained_counts_query_matches_duckdb_replay(spark):
    """End-to-end certificate twin of the driver's check: the registry
    query (Arrow path, 1024-merge broadcast ranks) against the chunked
    32-deep CTE replace-chain replay in DuckDB, at sf0.001."""
    import duckdb

    from kafka_to_nexus_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    sdf = (Q.queries()["bpe_trained_token_counts"](spark, sf)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = (con.execute(Q.oracle_sql()["bpe_trained_token_counts"]).fetchdf()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(sdf) == len(odf)
    assert (sdf["doc_id"].values == odf["doc_id"].values).all()
    assert (sdf["bpe_tokens"].values == odf["bpe_tokens"].values).all()


def _fixture_png():
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", 40, 30, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(40) for _ in range(30))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _fixture_jpeg():
    seg = b"JFIF\x00" + bytes(11)
    sof = (b"\x08" + (30).to_bytes(2, "big") + (40).to_bytes(2, "big")
           + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    return (b"\xff\xd8\xff\xe0" + (len(seg) + 2).to_bytes(2, "big") + seg
            + b"\xff\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"\xff\xda\x00\x04\x00\x00" + bytes(16) + b"\xff\xd9")


def _fixture_wav():
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(bytes(64))
    return buf.getvalue()


def _fixture_mp4():
    mvhd = b"\x00" + bytes(3) + bytes(8) + (1000).to_bytes(4, "big") \
        + (5000).to_bytes(4, "big")
    mvhd_box = (len(mvhd) + 8).to_bytes(4, "big") + b"mvhd" + mvhd
    moov = (len(mvhd_box) + 8).to_bytes(4, "big") + b"moov" + mvhd_box
    return (16).to_bytes(4, "big") + b"ftypisom" + bytes(4) + moov


@pytest.mark.parametrize(
    "build, parser",
    [
        (_fixture_png, multimodal.parse_image_dims),
        (_fixture_jpeg, multimodal.parse_image_dims),
        (_fixture_wav, multimodal.parse_wav_meta),
        (_fixture_mp4, multimodal.parse_mp4_meta),
    ],
    ids=["png", "jpeg", "wav", "mp4"],
)
def test_truncation_at_every_offset(build, parser):
    """Structure-aware truncation fuzz (VERDICT r7 #3): cut a genuine
    fixture at EVERY byte offset — boundaries included. Each prefix must
    parse to either the full payload's answer (the cut fell after the
    metadata) or None; never a raise, never a fabricated third value."""
    payload = build()
    expected = parser(payload)
    assert expected is not None
    for cut in range(len(payload) + 1):
        out = parser(payload[:cut])
        assert out is None or out == expected, (cut, out, expected)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_mp4_parser_survives_magic_plus_garbage(tail):
    multimodal.parse_mp4_meta((16).to_bytes(4, "big") + b"ftypisom" + tail)


@given(st.lists(st.text(alphabet="abcde ", min_size=1, max_size=30),
                min_size=1, max_size=6))
# pathological regressions: adjacent repeats of one pair ("ababab"),
# runs ("aaaa"), and tie-heavy corpora where every pair has count 1 —
# the batch must degrade to exact single-argmax steps, never reorder
@example(texts=["ababab", "aaaa bbbb", "ab cd ab cd"])
@example(texts=["abc", "bcd", "cde", "dea"])
@example(texts=["ab ab ba ba"])
# self-pair creation hazard: merging (d,d) CREATES (dd,d) at the same
# count as (e,a), and 'dd' < 'e' wins the classic tie — the batch must
# stop at the self-pair's created-pair ceiling (found by hypothesis)
@example(texts=["ea", "ddd"])
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_train_batched_matches_python_model(spark, texts):
    """VERDICT r9 #4: the disjoint-batch trainer must learn EXACTLY the
    single-merge classic sequence — same pairs, same order, same counts
    — for arbitrary corpora including tie-heavy ones where batching
    must fall back to single steps."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = llm_bpe.bpe_train_batched(df, n_merges=6, max_batch=4)
    assert got == _bpe_train_model(texts, 6), (texts, got)


def test_bpe_train_batched_equals_single_merge_on_corpus(spark):
    """Batched vs single-merge trainer on the real corpus (where batches
    actually fill), across checkpoint boundaries and batch sizes."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = llm_bpe.bpe_train(docs, n_merges=24)
    assert llm_bpe.bpe_train_batched(
        docs, n_merges=24, max_batch=8, checkpoint_every=5
    ) == want
    assert llm_bpe.bpe_train_batched(
        docs, n_merges=24, max_batch=64
    ) == want


@given(st.lists(st.text(alphabet="abcde ", min_size=1, max_size=30),
                min_size=1, max_size=6))
@example(texts=["ababab", "aaaa bbbb", "ab cd ab cd"])
@example(texts=["ab ab ba ba", "aa aa aaa"])
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_train_local_matches_python_model(spark, texts):
    """The driver-local incremental trainer (lazy heap + occurrence
    index) must produce the classic sequence exactly — same pairs,
    order, counts — on arbitrary corpora."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in llm_bpe.pretokenize(t):
            vocab[w] += 1
    states = [(f, tuple(w)) for w, f in sorted(vocab.items())
              if len(w) >= 2]
    got = llm_bpe.bpe_train_local(states, 6)
    assert got == _bpe_train_model(texts, 6), (texts, got)


def test_bpe_train_hybrid_handoff_matches_classic(spark):
    """bpe_train_hybrid must learn the exact classic sequence whether it
    goes local immediately (vocab under threshold), runs fully
    distributed (threshold 0), or HANDS OFF mid-training at a checkpoint
    boundary — the collected wrapped state must resume seamlessly."""
    texts = ["the cat sat on the mat", "the bat and the cat", "a t t h",
             "thththe the", "on and on and on", "sat mat bat chat"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expected = _bpe_train_model(texts, 10)
    # immediate local (vocab ≪ threshold)
    assert llm_bpe.bpe_train_hybrid(df, n_merges=10) == expected
    # fully distributed (threshold 0 can never trigger collection)
    assert llm_bpe.bpe_train_hybrid(
        df, n_merges=10, local_threshold_rows=0, max_batch=4,
        checkpoint_every=3
    ) == expected
    # forced mid-training handoff: every merge checkpoints + re-checks,
    # and the working set shrinks below the threshold as words saturate
    got = llm_bpe.bpe_train_hybrid(
        df, n_merges=10, local_threshold_rows=6, checkpoint_every=1,
        max_batch=2
    )
    assert got == expected


# ---------------------------------------------------------------------------
# Bloom admission (L73/L78): the python position model carries the fuzz
# load (it is unit-pinned equal to the Spark expression in
# test_streaming.py::test_bloom_positions_python_twin_matches_spark, so
# properties proven here transfer to both the batch and streaming gates
# without a Spark round-trip per example).
# ---------------------------------------------------------------------------

fingerprints = st.lists(
    st.text(min_size=0, max_size=12), min_size=1, max_size=40
)


def _py_bloom(keys, k, m_bits):
    from kafka_to_nexus_spark.streaming.stateful import _bloom_positions_py

    words: dict[int, int] = {}
    for fp in keys:
        for pos in _bloom_positions_py(fp, k, m_bits):
            w, b = divmod(pos, 63)
            words[w] = words.get(w, 0) | (1 << b)
    return words


def _py_member(words, fp, k, m_bits):
    from kafka_to_nexus_spark.streaming.stateful import _bloom_positions_py

    return all(
        words.get(pos // 63, 0) & (1 << (pos % 63))
        for pos in _bloom_positions_py(fp, k, m_bits)
    )


@given(standing=fingerprints, arrivals=fingerprints,
       k=st.integers(1, 22), bpk=st.integers(2, 32))
@settings(max_examples=200, deadline=None)
def test_bloom_no_false_negatives_fuzz(standing, arrivals, k, bpk):
    """For ANY corpus, ANY arrival set, ANY (k, bits/key) sizing: an
    arrival whose fingerprint is standing can never test negative."""
    m_bits = max(63, -(-len(set(standing)) * bpk // 63) * 63)
    words = _py_bloom(standing, k, m_bits)
    stand = set(standing)
    for fp in arrivals:
        if fp in stand:
            assert _py_member(words, fp, k, m_bits), (fp, k, bpk)


@given(a=fingerprints, b=fingerprints, k=st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_bloom_union_is_bitwise_or_fuzz(a, b, k):
    """filter(A ∪ B) == filter(A) | filter(B) at any fixed sizing — the
    algebra behind append_bloom writing batch words wholesale and
    read_bloom_layout folding generations with bit_or."""
    m_bits = 63 * 11
    union = _py_bloom(a + b, k, m_bits)
    fa, fb = _py_bloom(a, k, m_bits), _py_bloom(b, k, m_bits)
    merged: dict[int, int] = dict(fa)
    for w, bits in fb.items():
        merged[w] = merged.get(w, 0) | bits
    assert merged == union


@given(st.binary(min_size=0, max_size=400), st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_jpeg_decoder_is_total_over_garbage(data, seed):
    """parse_jpeg_pixels never raises — arbitrary bytes, arbitrary bytes
    behind a valid SOI, and random mutations of a VALID stream (marker
    bytes, table bytes, entropy bytes) all return a tuple or None."""
    import random

    from kafka_to_nexus_spark.llm import multimodal

    assert multimodal.parse_jpeg_pixels(data) is None or True
    assert multimodal.parse_jpeg_pixels(b"\xff\xd8" + data) is None or True
    rng = random.Random(seed)
    enc = bytearray(multimodal.encode_jpeg(
        [[rng.randrange(256) for _ in range(8)] for _ in range(8)]
    ))
    for _ in range(6):
        enc[rng.randrange(len(enc))] = rng.randrange(256)
    out = multimodal.parse_jpeg_pixels(bytes(enc))
    # A mutation can land on the SOF dimension bytes and yield a
    # DIFFERENT but perfectly valid image (e.g. 1x8) — the totality
    # property is "never raises, and any returned tuple is structurally
    # sound", not "dims survive header corruption".
    if out is not None:
        w, h, rows = out
        assert w > 0 and h > 0
        assert len(rows) == h
        assert all(len(r) == w for r in rows)


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_jpeg_gray_roundtrip_error_bound(w, h, seed):
    """Any gray image at quant=1 round-trips within ±1 per pixel at any
    dims (edge padding included) — the float FDCT/IDCT pair plus one
    rounding step."""
    import random

    from kafka_to_nexus_spark.llm import multimodal

    rng = random.Random(seed)
    rows = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    got = multimodal.parse_jpeg_pixels(
        multimodal.encode_jpeg(rows, quant=[1] * 64)
    )
    assert got is not None
    gw, gh, px = got
    assert (gw, gh) == (w, h)
    assert all(
        abs(px[y][x][0] - rows[y][x]) <= 1 and px[y][x][0] == px[y][x][1] == px[y][x][2]
        for y in range(h) for x in range(w)
    )


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_wav_sample_decoder_never_raises(payload):
    """The SAMPLE decoder is total like the metadata parser: any byte
    string yields (channels, rate, bits, samples) or None — chunk
    overruns, bad format tags, misaligned data all degrade to None."""
    out = multimodal.parse_wav_samples(payload)
    if out is not None:
        ch, rate, bits, samples = out
        assert ch >= 1 and rate >= 1 and bits in (8, 16, 24, 32)
        assert len(samples) % ch == 0


@given(
    st.sampled_from([8, 16, 24, 32]),
    st.integers(1, 3),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_wav_sample_roundtrip_fuzz(bits, channels, data):
    """encode → decode is the identity for ANY in-range sample vector at
    every depth/channel combination (PCM has no lossy leg)."""
    lo, hi = (-128, 127) if bits == 8 else (
        -(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    n = data.draw(st.integers(0, 8)) * channels
    vals = data.draw(st.lists(
        st.integers(lo, hi), min_size=n, max_size=n))
    payload = multimodal.encode_wav(vals, channels, 44100, bits)
    assert multimodal.parse_wav_samples(payload) == (
        channels, 44100, bits, vals)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_wav_sample_decoder_survives_corrupted_valid_wav(tail):
    """Adversarial: a VALID wav with arbitrary trailing bytes, and one
    with a byte flipped mid-structure — decode or None, no raise."""
    good = multimodal.encode_wav([5, -6, 7, -8], 2, 8000, 16)
    multimodal.parse_wav_samples(good + tail)
    if tail:
        pos = tail[0] % len(good)
        broken = good[:pos] + bytes([tail[0] ^ 0xFF]) + good[pos + 1 :]
        multimodal.parse_wav_samples(broken)


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_avi_decoder_is_total_over_garbage(data):
    """parse_avi_frames / parse_avi_meta never raise — arbitrary bytes,
    arbitrary bytes behind valid RIFF/AVI magic, and arbitrary bytes
    spliced into a valid container body."""
    assert multimodal.parse_avi_frames(data) is None or True
    assert multimodal.parse_avi_meta(data) is None or True
    magic = b"RIFF" + len(data).to_bytes(4, "little") + b"AVI "
    assert multimodal.parse_avi_frames(magic + data) is None or True
    assert multimodal.parse_avi_meta(magic + data) is None or True


@given(st.binary(max_size=64), st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_avi_decoder_survives_corrupted_valid_avi(tail, seed):
    """Byte corruption inside a valid AVI decodes to None or a valid
    (w, h, frames) result — never raises, and a successful decode's
    frames always agree on dimensions."""
    import random

    rows = [[(seed + y + x) % 256 for x in range(8)] for y in range(8)]
    avi = bytearray(
        multimodal.encode_avi(
            [multimodal.encode_jpeg(rows)] * 2, 8, 8, fps=5
        )
    )
    rng = random.Random(seed)
    for _ in range(4):
        avi[rng.randrange(len(avi))] = rng.randrange(256)
    got = multimodal.parse_avi_frames(bytes(avi) + tail)
    if got is not None:
        w, h, frames = got
        assert all(len(px) == h and len(px[0]) == w for px in frames)


@given(st.integers(0, 4), st.integers(1, 3), st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_avi_roundtrip_fuzz(n_frames, scale, seed):
    """encode_avi -> parse_avi_frames round-trips any frame count and
    8x8-multiple dimension with flat blocks bit-exactly."""
    w = h = 8 * scale
    frames = []
    expect = []
    for f in range(n_frames):
        rows = [[(seed + 31 * f + 7 * (y // 8) + 13 * (x // 8)) % 256
                 for x in range(w)] for y in range(h)]
        frames.append(multimodal.encode_jpeg(rows))
        expect.append(rows)
    got = multimodal.parse_avi_frames(
        multimodal.encode_avi(frames, w, h, fps=3)
    )
    assert got is not None
    gw, gh, gframes = got
    assert (gw, gh, len(gframes)) == (w, h, n_frames)
    for px, rows in zip(gframes, expect):
        assert all(
            px[y][x] == (rows[y][x],) * 3
            for y in range(h) for x in range(w)
        )


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_decode_media_is_total(payload):
    got = multimodal.decode_media(payload, dim=8)
    assert got is None or (len(got) == 8 and abs(sum(got) - 1.0) < 1e-4)


# --- URL canonicalization: idempotence --------------------------------------
# The defining property of a canonicalizer: a second pass must be the
# identity. Hypothesis assembles URLs from the parts the rules touch
# (mixed-case scheme/host, ports incl. the defaults, tracking + real
# params in any order, trailing slashes, fragments) plus arbitrary
# non-URL text, and one Spark pass canonicalizes both generations.

_url_schemes = st.sampled_from(["http", "https", "HTTP", "HtTpS", "ftp"])
_url_hosts = st.sampled_from(
    ["Ex.COM", "www.example.com", "A.b.C.de", "EX.com:443", "ex.com:80",
     "ex.com:8080"])
_url_paths = st.sampled_from(["", "/", "/a/B", "/a/B/", "/x//", "/%7Euser"])
_url_params = st.lists(
    st.sampled_from(
        ["a=1", "b=2", "Z=9", "utm_source=x", "utm_campaign=Y",
         "gclid=123", "fbclid=z", "ref=home", "empty=", "flag"]),
    max_size=4)
_url_frags = st.sampled_from(["", "#", "#frag", "#a?b=1"])


@st.composite
def _urls(draw):
    if draw(st.booleans()):
        return draw(st.text(max_size=30).filter(lambda s: "\n" not in s))
    ps = draw(_url_params)
    q = "?" + "&".join(ps) if ps else ""
    return (draw(_url_schemes) + "://" + draw(_url_hosts)
            + draw(_url_paths) + q + draw(_url_frags))


@given(st.lists(_urls(), min_size=1, max_size=12))
@PROP_SETTINGS
def test_canonicalize_url_idempotent(spark, urls):
    from pyspark.sql import functions as F

    from kafka_to_nexus_spark.llm import text as llm_text

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string")
    once = llm_text.canonicalize_url(F.col("url"))
    rows = df.select(
        once.alias("c1"),
        llm_text.canonicalize_url(once).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, (r.c1, r.c2)


# --- HTML extraction: totality + signal bounds -------------------------------
# Arbitrary byte-soup (broken tags, stray '&', unterminated script, mixed
# entities) must never raise, and the signals must hold their contracts:
# markup_ratio in [0, 1] (stripping/decoding/collapsing never grows the
# text), n_chars_text == len(text), n_tags >= 0.

_html_soup = st.text(
    alphabet=st.sampled_from(list("<>/&;#abpc=\"' \t\nscript styleqx1")),
    max_size=80,
)


@given(st.lists(_html_soup, min_size=1, max_size=12))
@PROP_SETTINGS
def test_extract_html_text_total_and_bounded(spark, htmls):
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_to_nexus_spark.llm import text as llm_text

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id long, html string")
    rows = llm_text.extract_html_text(df).collect()
    assert len(rows) == len(htmls)
    for r in rows:
        assert 0.0 <= r.markup_ratio <= 1.0, r
        assert r.n_chars_text == len(r.text), r
        assert r.n_tags >= 0 and r.n_chars_html == len(htmls[r.doc_id]), r
