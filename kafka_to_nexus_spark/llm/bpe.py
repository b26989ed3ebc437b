"""Deterministic BPE token counting (SURVEY §2.9 L52).

Every token-denominated operator in the engine (L33 sequence packing,
L39 token-budget selection, L8 token counts) denominated in whitespace
tokens until now — the stand-in real pipelines replace with byte-pair
encoding. This module implements the public greedy BPE algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the GPT-2 tokenizer applies the same loop): pre-tokenize,
then repeatedly merge the lowest-rank adjacent symbol pair from a learned
merge table until no table pair remains.

Two execution paths, same semantics:

- **Expression path** (:func:`bpe_count_expr`): the LITERAL merge table
  compiles into a chain of ``replace()`` calls over a space-delimited
  symbol string — pure SQL expressions, whole-stage codegen, zero Python
  and zero shuffle, and DuckDB replays the identical chain for the
  correctness oracle. Valid because the table is WELL-FORMED: each
  merge's constituents are single characters or results of strictly
  earlier merges, and no merge's result is a constituent of an earlier
  merge — under that property one rank-ordered replace pass per merge is
  equivalent to the classic iterative min-rank loop (no pass can create
  an occurrence for a pair of equal or lower rank), which
  ``tests/test_llm_properties.py`` pins against
  :func:`bpe_encode`.
- **Arrow path** (:func:`bpe_token_counts_arrow`): ``mapInPandas`` running
  the classic algorithm with the merge RANKS broadcast — the path for
  real vocabularies (a 50k-merge GPT-2 table does not compile to an
  expression chain). Narrow, partition-preserving, O(word·merges) per
  row.

The SQL paths split the pre-tokenizer in two: letter/digit runs feed the
merge pipeline, and punctuation — single-symbol pre-tokens that can
never merge — is tallied as a plain character count over
``[^a-z0-9 \\x00-\\x1f]``. The zero-token class is EXPLICIT (ASCII space
plus every C0 control) rather than ``\\s`` because the three engines
disagree on ``\\s``: Python re's Unicode ``\\s`` also matches \\x0b,
\\x1c-\\x1f, \\x85, \\xa0 and U+2000+, Java's includes \\x0b, RE2's
excludes it — so 'a\\xa0b' tokenized differently per path. With the
explicit class, NBSP/\\x85/U+2000+ are ordinary punct pre-tokens (1 token)
everywhere, tab/newline/CR/VT and all other C0 controls count zero
everywhere, and — because U+001F is in the zero class — no token can ever
equal the \\x1f unit separator the L67 stream certificate joins on.
NULL text coalesces to 0 everywhere.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Rank-ordered merge table (rank = list position): common English pairs,
# built bottom-up so the well-formedness property holds (asserted by
# well_formed() and pinned in tests). Literal and versioned: changing it
# changes every BPE-denominated count downstream.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"),
    ("a", "n"), ("i", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("s", "t"),
    ("a", "r"), ("l", "e"), ("an", "d"),
    ("in", "g"), ("o", "u"), ("e", "s"),
    ("o", "w"), ("a", "s"), ("i", "s"),
    ("e", "d"), ("a", "l"), ("t", "a"),
    ("b", "le"), ("ta", "ble"),
    ("c", "h"), ("s", "h"), ("w", "h"),
    ("er", "s"), ("v", "al"),
    ("val", "u"), ("valu", "e"),
    ("s", "p"), ("sp", "ar"), ("spar", "k"),
    ("r", "ow"), ("f", "a"), ("fa", "st"),
    ("k", "e"), ("ke", "y"),
)

# Explicit zero-token class (see module docstring): ASCII space + C0
# controls. NEVER \s — the three regex engines disagree on \s.
_PRETOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \x00-\x1f]")


def well_formed(merges: Sequence[tuple[str, str]]) -> bool:
    """The property that makes one rank-ordered replace pass per merge
    equal to the classic iterative min-rank loop: every constituent is a
    single char or an EARLIER merge's result, results are unique, and no
    result is consumed by an earlier (or same-rank) merge."""
    results: list[str] = []
    for a, b in merges:
        for part in (a, b):
            if len(part) > 1 and part not in results:
                return False  # consumes a result that doesn't exist yet
        r = a + b
        if r in results:
            return False  # duplicate result: token identity ambiguous
        results.append(r)
    # no result may be a constituent of an earlier merge (else a later
    # pass could create an occurrence for an already-passed rank)
    for k, (a, b) in enumerate(merges):
        made = a + b
        for a2, b2 in merges[:k]:
            if made in (a2, b2):
                return False
    return True


def pretokenize(text: str) -> list[str]:
    """Python twin of the SQL pre-tokenizer: lowercase, then runs of
    letters, runs of digits, or single punctuation chars."""
    return _PRETOKEN_RE.findall(text.lower())


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE over one pre-token: merge the lowest-rank
    adjacent pair (all occurrences, left-to-right non-overlapping) until
    no table pair remains. The reference implementation the expression
    chain is property-tested against, and the Arrow path's inner loop."""
    symbols = list(word)
    while len(symbols) > 1:
        pairs = {
            (symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)
        }
        best = min(
            (p for p in pairs if p in ranks), key=ranks.get, default=None
        )
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and symbols[i] == a
                and symbols[i + 1] == b
            ):
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def merge_ranks(
    merges: Sequence[tuple[str, str]] = MERGES,
) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_count_expr(
    text_col: str,
    merges: Sequence[tuple[str, str]] = MERGES,
    dialect: str = "spark",
) -> str:
    """SQL expression computing the per-row BPE token count — identical
    semantics in Spark SQL and DuckDB so the same builder emits both the
    engine side and the correctness oracle. Shape: pre-tokenize →
    per-word COMMA-WRAPPED symbol string (each symbol rides as
    ``,sym,``, so adjacent tokens juxtapose to ``,,``) → one replace()
    per merge in rank order (``,a,,b,`` → ``,ab,``) → count symbols →
    sum over words. Narrow map, codegen.

    The wrapping matters: with single-separator encodings, adjacent
    occurrences of the SAME pair share the boundary character, so one
    leftmost-non-overlapping replace pass merges only every other
    occurrence (``a b a b`` → one merge where classic BPE makes two —
    found by the L59 trainer's property test). Self-contained wrappers
    make each occurrence disjoint, so one pass per merge IS the classic
    sweep; and because only [a-z0-9] runs enter the wrapped pipeline
    (merges are [a-z0-9]-only, so a punctuation pre-token — which could
    BE a comma — always counts as exactly one token and is tallied by a
    plain character count instead), a pattern match always aligns to
    whole-token boundaries."""
    if not well_formed(merges):
        raise ValueError(
            "merge table is not well-formed; the replace-chain compilation "
            "would diverge from classic BPE (see well_formed())"
        )
    for a, b in merges:
        if not re.fullmatch(r"[a-z0-9]+", a + b):
            raise ValueError(f"merge {(a, b)!r}: only [a-z0-9] supported")
    if dialect == "spark":
        seed = "regexp_replace(w, '(.)', ',$1,')"
        words = f"regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+', 0)"
        # doubled backslashes in the emitted SQL text: Spark SQL string
        # literals eat one backslash level, so the regex engine needs the
        # doubled form to see \x00-\x1F (verified empirically — DuckDB
        # literals below pass backslashes through untouched). The class is
        # explicit, never \s: the engines disagree on \s (module docstring).
        punct = (
            f"length(regexp_replace(lower({text_col}), "
            f"'[a-z0-9 \\\\x00-\\\\x1F]', ''))"
        )
        count = "size(split({chain}, ',,'))"
        total = (
            "coalesce(aggregate(transform({words}, w -> {cnt}), 0, "
            "(s, x) -> s + x) + {punct}, 0)"
        )
    elif dialect == "duckdb":
        seed = "regexp_replace(w, '(.)', ',\\1,', 'g')"
        words = f"regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+', 0)"
        punct = (
            f"length(regexp_replace(lower({text_col}), "
            f"'[a-z0-9 \\x00-\\x1f]', '', 'g'))"
        )
        count = "len(string_split({chain}, ',,'))"
        total = (
            # inner coalesce: DuckDB's list_sum over an EMPTY list is NULL
            # (all-punctuation text must still count its punct chars);
            # outer coalesce: NULL text → 0 on every path
            "coalesce(coalesce(list_sum(list_transform({words}, "
            "w -> {cnt})), 0) + {punct}, 0)"
        )
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    chain = seed
    for a, b in merges:
        chain = f"replace({chain}, ',{a},,{b},', ',{a}{b},')"
    return total.format(
        words=words, cnt=count.format(chain=chain), punct=punct
    )


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: Sequence[tuple[str, str]] = MERGES,
) -> DataFrame:
    """Expression-path BPE counts: (id, n_words, bpe_tokens). Whole-stage
    codegen, no shuffle, no Python — .explain shows one Project over the
    scan."""
    return df.select(
        id_col,
        F.expr(f"size(split({text_col}, ' '))").cast("long").alias("n_words"),
        F.expr(bpe_count_expr(text_col, merges)).cast("long").alias(
            "bpe_tokens"
        ),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 16,
    state_partitions: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn a merge table from the corpus — classic BPE TRAINING
    (Sennrich et al. 2016 §3.2): build the word-frequency vocabulary,
    then repeatedly take the adjacent symbol pair with the highest
    corpus-weighted count (ties broken on (pair) ascending — a total,
    engine-portable order) and merge it everywhere.

    Distributed shape: training runs on the DISTINCT-WORD vocabulary
    with frequencies — corpus-size-independent after the first
    pre-token count (Heaps' law: the vocab is millions of rows at 100 TB
    while the corpus is trillions of tokens). Each of the ``n_merges``
    iterations is one pair-count aggregation over the vocab (map-side
    combined, vocab-sized shuffle) + an O(1) argmax collect. The
    tokenization state is the comma-wrapped symbol string of
    :func:`bpe_count_expr` (one replace pass per merge equals the
    classic sweep because every occurrence is self-delimited, and
    learned merges are well-formed by construction at training time:
    a pair can only contain symbols that exist at its own step).

    The state column is MATERIALIZED every ``checkpoint_every`` merges
    (localCheckpoint: the accumulated replace chain is evaluated once
    and the lineage truncated), so iteration r applies at most
    ``checkpoint_every`` pending replaces instead of re-deriving an
    r-deep chain — total work is O(n_merges · vocab), not
    O(n_merges² · vocab), which is what makes a real 1k–50k-merge
    vocabulary trainable (VERDICT r8: the un-checkpointed form measured
    quadratic and its Catalyst expression tree grew with rank). Words
    merged down to a single symbol are dropped at each checkpoint —
    they can never contribute a pair again — so the working set shrinks
    as training converges. Returns [(rank, left, right, count)].

    ``state_partitions`` coalesces the checkpointed vocab state: each of
    the n_merges iterations is one full job over it, so per-iteration
    task-scheduling overhead is partitions × n_merges — a 60k-word vocab
    on 32 shuffle partitions pays 32 task launches per ~2k-row partition
    per iteration for nothing (measured ~2× on a 1024-merge run). Size it
    so partitions ≈ vocab_rows / ~50k; None keeps the input partitioning
    (the right default at cluster scale, where the vocab is millions of
    rows)."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    vocab = (
        df.select(
            F.explode(
                F.expr(
                    # letter/digit runs only: punctuation pre-tokens are
                    # single symbols with no pairs, so they can never be
                    # merged or affect pair counts — and excluding them
                    # keeps the comma-wrapped state collision-free
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z]+|[0-9]+', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("s", F.regexp_replace(F.col("w"), "(.)", ",$1,"))
        # single-char words have no pairs and can never merge: drop them
        # from the working set up front (same rule as the checkpoint cut)
        .filter(F.length("w") >= 2)
        .select("freq", "s")
    )
    if state_partitions is not None:
        vocab = vocab.coalesce(state_partitions)
    state_df = vocab.localCheckpoint()
    pending: list[tuple[str, str]] = []

    def with_pending(col: Column) -> Column:
        for a, b in pending:
            col = F.replace(col, F.lit(f",{a},,{b},"), F.lit(f",{a}{b},"))
        return col

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        state = with_pending(F.col("s"))
        # materialize the token array once per row, then zip it against
        # its own tail — measured ~3× faster than per-index element_at
        # over transform(sequence(...)) (the split/size expressions don't
        # CSE across the filter and the project otherwise)
        toks = F.split(F.btrim(state, F.lit(",")), ",,")
        pre = state_df.select("freq", toks.alias("t")).filter(
            F.size("t") >= 2
        )
        pair_rows = (
            pre.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("t", 1, F.size("t") - 1).alias("a"),
                        F.slice(F.col("t"), 2, F.size("t") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .first()
        )
        if pair_rows is None:
            break
        a, b, c = pair_rows["a"], pair_rows["b"], pair_rows["c"]
        merges.append((rank, a, b, int(c)))
        pending.append((a, b))
        if len(pending) >= checkpoint_every:
            nxt = state_df.select(
                "freq", with_pending(F.col("s")).alias("s")
            ).filter(
                F.size(F.split(F.btrim(F.col("s"), F.lit(",")), ",,")) >= 2
            )
            # eager localCheckpoint evaluates the pending chain ONCE and
            # truncates lineage; the old checkpoint RDD is freed by the
            # ContextCleaner when the reference drops
            state_df = nxt.localCheckpoint()
            pending = []
    return merges


def _select_disjoint_batch(
    rows, budget: int
) -> list[tuple[str, str, int]]:
    """Greedy disjoint-batch selection over one round's pair counts
    (sorted count desc, pair asc), provably equal to replaying classic
    single-merge selection — shared by :func:`bpe_train_batched` and
    :func:`bpe_train_hybrid`. ``rows`` holds up to ``budget + 1`` rows.

    Walk the classic order accepting symbol-disjoint pairs; stop at the
    first overlapping pair (count ``c_stop`` — everything at or below it
    is uncertain) and keep only accepted pairs with count STRICTLY above
    ``c_stop``. A SELF-pair (a, a) needs one extra guard: merging it can
    CREATE pairs bounded by its OWN count — in a run ``aaa`` the merge
    makes ``(aa, a)`` whose count can reach floor(count(a,a) / 2), and
    no overlapping row in the walk ever witnesses that bound (the only
    old pair the creation consumes IS the accepted pair). A later batch
    member at or below that ceiling could lose its classic turn to such
    a created pair (ties break pair-ascending, and concatenation does
    not preserve lexicographic order), so the walk stops there exactly
    like an overlap stop. Found by hypothesis: corpus ['ea', 'ddd'] —
    classic merges (d,d) then (dd,d) then (e,a); the unguarded batch
    took (e,a) in round one.

    Falls back to the single classic argmax step (always exact) when
    nothing survives, so every round makes progress."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    c_stop = 0
    self_bound = 0  # created-pair ceiling from accepted self-pairs
    for r in rows[:budget]:
        c = int(r["c"])
        if r["a"] in used or r["b"] in used or c <= self_bound:
            c_stop = c
            break
        batch.append((r["a"], r["b"], c))
        used.add(r["a"])
        used.add(r["b"])
        if r["a"] == r["b"]:
            self_bound = max(self_bound, c // 2)
    else:
        if len(rows) > budget:
            c_stop = int(rows[budget]["c"])
    batch = [t for t in batch if t[2] > c_stop]
    if not batch:
        r0 = rows[0]
        batch = [(r0["a"], r0["b"], int(r0["c"]))]
    return batch


def bpe_train_batched(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 16,
    state_partitions: int | None = None,
    max_batch: int = 64,
) -> list[tuple[int, str, str, int]]:
    """:func:`bpe_train` with DISJOINT-BATCH argmax rounds — identical
    output, a fraction of the Spark jobs (VERDICT r9 #4: the
    single-merge trainer is linear but floor-bound at ~1 job/merge, so a
    50k-merge vocabulary extrapolates to hours of argmax round trips).

    Per round, ONE pair-count aggregation feeds a driver-side greedy
    batch selection that is PROVABLY equal to replaying classic
    single-merge selection:

    - walk the pair list in the classic order (count desc, pair asc),
      accepting pairs whose symbols are disjoint from every previously
      accepted pair, and STOP at the first overlapping pair (count
      ``c_stop``; everything below it is uncertain) — or at the first
      pair whose count falls to or below an accepted SELF-pair's
      created-pair ceiling (see :func:`_select_disjoint_batch`);
    - keep only accepted pairs with count STRICTLY above ``c_stop``.

    Why this replays classic exactly: merging a batch pair only changes
    counts of pairs sharing one of its symbols (occurrences of disjoint
    pairs are neither consumed nor created), so each accepted pair's own
    count is what classic would see at its turn; every pair a merge can
    create or grow is bounded by an OLD overlapping pair's count —
    ``count(x, ab) <= count(x, a)`` since each new occurrence was an
    occurrence of the old pair — and every overlapping pair sits at or
    below the stop point, so all competitors (new, decreased, or
    unselected) stay <= c_stop < every kept pair's count. Strictness
    kills the tie hazard: a new pair can tie c_stop and win a
    pair-ascending tie-break against an equal-count batch member (the
    (a1b1, y) vs (b1, y) case — concatenation does not preserve
    lexicographic order on the left element), so equal-count tails are
    dropped. When the batch empties (the top two pairs overlap), the
    round degrades to the classic single argmax step — guaranteed
    progress, still exact. Property-tested equal to :func:`bpe_train`
    and the pure-python classic model on pathological inputs
    (tests/test_llm_properties.py).

    Batch merges are symbol-disjoint, so their replace passes commute;
    they join the same pending/localCheckpoint machinery as the
    single-merge trainer. Jobs per round: one aggregation + one
    ``take(max_batch + 1)`` instead of one per merge — measured >=6x
    fewer Spark jobs per 1k merges on the training corpus
    (SCALE.md r10)."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    vocab = (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z]+|[0-9]+', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("s", F.regexp_replace(F.col("w"), "(.)", ",$1,"))
        .filter(F.length("w") >= 2)
        .select("freq", "s")
    )
    if state_partitions is not None:
        vocab = vocab.coalesce(state_partitions)
    state_df = vocab.localCheckpoint()
    pending: list[tuple[str, str]] = []

    def with_pending(col: Column) -> Column:
        for a, b in pending:
            col = F.replace(col, F.lit(f",{a},,{b},"), F.lit(f",{a}{b},"))
        return col

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        state = with_pending(F.col("s"))
        toks = F.split(F.btrim(state, F.lit(",")), ",,")
        pre = state_df.select("freq", toks.alias("t")).filter(
            F.size("t") >= 2
        )
        budget = min(max_batch, n_merges - len(merges))
        rows = (
            pre.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("t", 1, F.size("t") - 1).alias("a"),
                        F.slice(F.col("t"), 2, F.size("t") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .take(budget + 1)
        )
        if not rows:
            break
        batch = _select_disjoint_batch(rows, budget)
        for a, b, c in batch:
            merges.append((len(merges), a, b, c))
            pending.append((a, b))
        if len(pending) >= checkpoint_every:
            nxt = state_df.select(
                "freq", with_pending(F.col("s")).alias("s")
            ).filter(
                F.size(F.split(F.btrim(F.col("s"), F.lit(",")), ",,")) >= 2
            )
            state_df = nxt.localCheckpoint()
            pending = []
    return merges


def _merge_pass(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """One classic leftmost-non-overlapping merge-everywhere pass —
    the inner loop of :func:`bpe_encode`, shared by the local trainer."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_local(
    states: list[tuple[int, tuple[str, ...]]],
    n_merges: int,
    start_rank: int = 0,
) -> list[tuple[int, str, str, int]]:
    """Classic BPE training over an in-memory (freq, symbols) working set
    — the DRIVER-LOCAL ENDGAME of :func:`bpe_train_hybrid` (VERDICT r9
    #4's alternative to batching: once fully-merged words have shrunk the
    distributed working set below a threshold, every remaining argmax
    round trip is pure overhead). Incremental, the shape real tokenizer
    trainers use: a pair→count table, a pair→words occurrence index, and
    a lazy max-heap keyed (count desc, pair asc) — each merge touches
    only the words containing its pair (per-word pair-multiset delta),
    so total work follows symbol shrinkage, not merges × vocab. Exactly
    the classic sequence: argmax ties break pair-ascending, a stale heap
    entry (count changed since push) is skipped on pop, and a
    merge-everywhere pass leaves zero occurrences of its own pair."""
    import heapq
    from collections import Counter, defaultdict

    counts: Counter = Counter()
    occ: defaultdict = defaultdict(set)
    work = list(states)
    for wi, (f, syms) in enumerate(work):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] += f
            occ[p].add(wi)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if counts.get(p, 0) == -negc and negc < 0:
                best = (p, -negc)
                break
        if best is None:
            break
        (a, b), c = best
        merges.append((start_rank + len(merges), a, b, int(c)))
        touched: set = set()
        for wi in list(occ[(a, b)]):
            f, syms = work[wi]
            for i in range(len(syms) - 1):
                q = (syms[i], syms[i + 1])
                counts[q] -= f
                occ[q].discard(wi)
                touched.add(q)
            new = _merge_pass(syms, a, b)
            work[wi] = (f, new)
            for i in range(len(new) - 1):
                q = (new[i], new[i + 1])
                counts[q] += f
                occ[q].add(wi)
                touched.add(q)
        for q in touched:
            c2 = counts.get(q, 0)
            if c2 > 0:
                heapq.heappush(heap, (-c2, q))
            else:
                counts.pop(q, None)
                occ.pop(q, None)
    return merges


def bpe_train_hybrid(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 16,
    state_partitions: int | None = None,
    max_batch: int = 64,
    local_threshold_rows: int = 500_000,
) -> list[tuple[int, str, str, int]]:
    """Distributed-until-small BPE training: the disjoint-batch
    distributed trainer (:func:`bpe_train_batched`) runs while the
    working set is cluster-sized, and the moment the still-mergeable
    vocabulary fits under ``local_threshold_rows`` the state COLLECTS to
    the driver and :func:`bpe_train_local` finishes the table with ZERO
    Spark jobs per merge (VERDICT r9 #4: at 0.9 jobs/merge a 50k-merge
    vocabulary is ~6 h of argmax round trips; the endgame is where
    almost all of those rounds live, over a working set that no longer
    needs a cluster — 500k words × ~40 B of symbol state ≈ 20 MB, the
    same order as a broadcast build side). Identical output to
    :func:`bpe_train` by construction (classic-local == classic given
    the same state; property-tested, incl. mid-training handoffs).

    The threshold check rides the existing checkpoint materialization
    (one cheap count per ``checkpoint_every`` merges on the checkpointed
    RDD); a corpus whose vocab starts under the threshold trains locally
    after the ONE vocab-building job — measured 4096 merges in ~17 s
    against ~29 min extrapolated for the single-merge distributed form
    on the same corpus (SCALE.md r10)."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    vocab = (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z]+|[0-9]+', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("w") >= 2)
        .select("freq", F.col("w").alias("s"))
    )
    if state_partitions is not None:
        vocab = vocab.coalesce(state_partitions)
    # state rides as the plain word first; the comma-wrapped encoding is
    # only needed by the distributed replace chain, so it is applied
    # lazily if (and only if) the distributed phase actually runs
    state_df = vocab.localCheckpoint()

    def collect_states(frame: DataFrame, wrapped: bool):
        rows = frame.collect()
        if wrapped:
            return [
                (int(r["freq"]), tuple(r["s"].strip(",").split(",,")))
                for r in rows
            ]
        return [(int(r["freq"]), tuple(r["s"])) for r in rows]

    if state_df.count() <= local_threshold_rows:
        return bpe_train_local(collect_states(state_df, False), n_merges)

    # distributed phase: the batched trainer's loop over the wrapped
    # state, with the threshold re-checked at every checkpoint cut
    state_df = state_df.select(
        "freq", F.regexp_replace(F.col("s"), "(.)", ",$1,").alias("s")
    ).localCheckpoint()
    pending: list[tuple[str, str]] = []

    def with_pending(col: Column) -> Column:
        for a, b in pending:
            col = F.replace(col, F.lit(f",{a},,{b},"), F.lit(f",{a}{b},"))
        return col

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        state = with_pending(F.col("s"))
        toks = F.split(F.btrim(state, F.lit(",")), ",,")
        pre = state_df.select("freq", toks.alias("t")).filter(
            F.size("t") >= 2
        )
        budget = min(max_batch, n_merges - len(merges))
        rows = (
            pre.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("t", 1, F.size("t") - 1).alias("a"),
                        F.slice(F.col("t"), 2, F.size("t") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .take(budget + 1)
        )
        if not rows:
            break
        batch = _select_disjoint_batch(rows, budget)
        for a, b, c in batch:
            merges.append((len(merges), a, b, c))
            pending.append((a, b))
        if len(pending) >= checkpoint_every and len(merges) < n_merges:
            nxt = state_df.select(
                "freq", with_pending(F.col("s")).alias("s")
            ).filter(
                F.size(F.split(F.btrim(F.col("s"), F.lit(",")), ",,")) >= 2
            )
            state_df = nxt.localCheckpoint()
            pending = []
            if state_df.count() <= local_threshold_rows:
                return merges + bpe_train_local(
                    collect_states(state_df, True),
                    n_merges - len(merges),
                    start_rank=len(merges),
                )
    return merges


def trained_merges() -> list[tuple[str, str]]:
    """The committed 1024-merge vocabulary (``bpe_vocab_1024.json``),
    trained from the sf0.1 documents corpus by :func:`bpe_train` — a
    REAL vocabulary for the Arrow encode path, reproducible by re-running
    the trainer on the same corpus (deterministic: argmax ties break on
    (pair) ascending). Vocabularies are amortized artifacts — a 100 TB
    pipeline trains once and ships the table with the job, exactly as
    GPT-2 ships its merges file (Sennrich et al. 2016; the file format
    mirrors the merge list, rank-ordered)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "bpe_vocab_1024.json")
    with open(path) as f:
        data = json.load(f)
    return [(a, b) for _, a, b, _ in data["merges"]]


BPE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bpe_tokens", T.LongType()),
    ]
)


def bpe_token_counts_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: Sequence[tuple[str, str]] = MERGES,
) -> DataFrame:
    """Arrow-path BPE counts for real vocabularies: classic algorithm per
    word, merge ranks BROADCAST once per executor (a 50k-merge table is
    ~1 MB — broadcast, never a join side), mapInPandas over the pruned
    (id, text) projection. Property-tested equal to the expression path
    on the literal table."""
    import pandas as pd

    ranks_bc = df.sparkSession.sparkContext.broadcast(merge_ranks(merges))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        cache: dict[str, int] = {}

        def count(text: str) -> int:
            total = 0
            for w in pretokenize(text or ""):
                n = cache.get(w)
                if n is None:
                    n = cache[w] = len(bpe_encode(w, ranks))
                total += n
            return total

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "bpe_tokens": [count(t) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, BPE_COUNT_SCHEMA)


BPE_TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
    ]
)


def bpe_tokenize_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: Sequence[tuple[str, str]] = MERGES,
) -> DataFrame:
    """Arrow-path BPE TOKENIZATION: the actual token stream a training
    pipeline ships (counts are an aggregate of this) — per doc, the full
    pre-token order with merges applied to letter/digit runs and
    punctuation riding as single-char tokens. Same shape as
    :func:`bpe_token_counts_arrow` (broadcast ranks, per-distinct-word
    cache, mapInPandas over pruned columns); returns
    ``(doc_id, tokens array<string>)``."""
    import pandas as pd

    ranks_bc = df.sparkSession.sparkContext.broadcast(merge_ranks(merges))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        cache: dict[str, tuple[str, ...]] = {}

        def encode(text: str) -> list[str]:
            out: list[str] = []
            for w in pretokenize(text or ""):
                t = cache.get(w)
                if t is None:
                    t = cache[w] = tuple(bpe_encode(w, ranks))
                out.extend(t)
            return out

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "tokens": [encode(t) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, BPE_TOKENS_SCHEMA)
