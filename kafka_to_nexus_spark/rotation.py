"""Self-applying verification-window rotation.

The driver hash-checks the FIRST ``WINDOW`` entries of ``queries()``
against DuckDB each round and records the result in the repo root as
``CORRECTNESS_r{N}.json``; the registry is larger than the window, so
the dict ordering IS the verification budget. The standing policy
(VERDICT r3/r4, made self-applying in r7):

1. queries NEVER driver-checked get slots the round they land;
2. queries whose behavior changed this round (:data:`CHANGED` — bug-fix
   proofs, reworked constants) get slots next;
3. everything else rotates oldest-green first, so no formerly-green
   query's last green row ages past two rounds.

Rounds 5 and 6 maintained this ordering as a hand-pasted static tuple,
which is only correct MID-round: the moment the driver writes a new
correctness file the tuple is stale, so the mechanical policy tripwire
(tests/test_window_policy.py) was structurally red at every judge
checkpoint. :func:`rotation_order` derives the ordering from the
recorded history AT CALL TIME instead — the window rotates itself the
moment a new ``CORRECTNESS_r*.json`` appears, and there is no
hand-maintained boundary comment left to undercount.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Iterable, Mapping

WINDOW = 50

# Queries whose BEHAVIOR changed (rule 2), mapped to the round the change
# landed in: they keep a window slot until a green row AT OR AFTER that
# round certifies the new code, then stop bumping automatically (no
# manual clearing — stale entries are harmless no-ops). r7: the corpus
# constants behind bm25/unigram moved from a driver-side DuckDB scan to
# a distributed Spark aggregate — values are bit-identical by
# construction, but the derivation is new code and its certificate
# should be, too.
CHANGED: dict[str, int] = {
    "bm25_topk": 7,
    # (unigram_logprob_score's r7 constant-derivation entry self-cleared
    # at its r7 green row; superseded by the r9 entry below)
    # r8: the composed pipeline's bucket cap now orders its chain by a
    # full-text fingerprint (lsh_candidate_pairs chain_col) — candidate
    # set changed, oracle updated to match
    "dedup_pipeline": 8,
    # r9: unigram emits the exact DECIMAL nll_total + n_tokens instead of
    # a rounded mean (the bigram tie-proof shape, VERDICT r8 #1); output
    # schema and values changed, oracle updated to match
    "unigram_logprob_score": 9,
    # r12: DEFAULT_SHARDS 8 → 256 (VERDICT r11 #3 — the 8-shard floor
    # serialized the corpus-sized first compaction stage onto 8
    # reducers); the sketch is a function of the shard key, so all
    # three kll outputs changed, oracles regenerate from the constant
    "kll_quantiles": 12,
    "kll_error_certificate": 12,
    "kll_quantiles_by_lang": 12,
}

_REPO_ROOT = Path(__file__).resolve().parents[1]

# Cross-check twins / parity certificates that exist only to certify a
# production query and never run in production themselves, mapped to
# that production sibling. Tiered round-close sweeps (ADVICE r12 /
# VERDICT r12 #6 — the full sweep grows linearly with the registry) may
# skip these on odd rounds via :func:`sweep_names`, but ONLY when their
# previous-round green row exists and neither the twin nor its sibling
# has an uncertified :data:`CHANGED` entry — so a frozen twin is never
# more than 2 rounds stale and a behavior change always forces a
# re-sweep.
FROZEN_TWINS: dict[str, tuple[str, ...]] = {
    "bloom_engine_parity": ("bloom_admission_filter",),
    "dedup_pipeline_engine_parity": ("dedup_pipeline",),
    "dsir_engine_parity": ("dsir_importance_weights",),
    "minhash_engine_parity": ("minhash_signatures",),
    "image_phash_near_dup_uncapped": ("image_phash_near_dup",),
    "ngram_jaccard_uncapped": ("ngram_jaccard_pairs",),
    "srp_near_dup_uncapped": ("srp_near_dup_pairs",),
    "semantic_dedup_fixed_k": ("semantic_dedup_prune",),
    "kll_error_certificate": ("kll_quantiles",),
}

# (root, driver_only) → (mtime signature, parsed rounds): queries() is
# called by every bench/oracle/test entry point, often in a loop —
# re-parse the history only when a correctness file appears or changes.
# Keyed per variant (ADVICE r12): rotation_order calls BOTH load_rounds
# flavors per invocation, and a single-slot clear-then-insert cache made
# them evict each other on every call.
_ROUNDS_CACHE: dict[tuple[str, bool], tuple[tuple, dict]] = {}


def load_rounds(
    root: Path | str | None = None, driver_only: bool = False
) -> dict[int, frozenset[str]]:
    """Per-round sets of green query names from ``CORRECTNESS_r*.json``
    AND ``CORRECTNESS_sweep_r*.json``.

    The driver writes the former (the 50-slot window); the builder's
    round-close FULL-registry oracle sweep (``tools/check_oracle.py
    --write rN``) writes the latter in the identical row format. Both
    certify greenness — the sweep is what keeps the 2-round staleness
    target achievable now that the registry is >2× the driver window
    (VERDICT r11 #1). Files for the same round union.
    ``driver_only=True`` reads just the driver files — what
    :func:`rotation_order` uses to decide which queries the DRIVER has
    never checked (a round-close sweep certifies staleness but must not
    pre-empt a new query's first driver-window slot).

    A query counts as green only if the row records no error AND every
    recorded axis matched (rows/schema/hash — absent axes count as
    matched, covering the rows-only rows the driver records for
    oracle-less queries). The err guard matters: a row recording ONLY
    an error ({"err": ...}, no match axes) must not certify the query
    green and rotate it out of the verification window."""
    root = Path(root) if root is not None else _REPO_ROOT
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    if not driver_only:
        files += sorted(root.glob("CORRECTNESS_sweep_r*.json"))
    sig = tuple((str(f), f.stat().st_mtime_ns) for f in files)
    key = (str(root), driver_only)
    cached = _ROUNDS_CACHE.get(key)
    if cached is not None and cached[0] == sig:
        return dict(cached[1])
    rounds: dict[int, frozenset[str]] = {}
    for f in files:
        n = int(re.search(r"r(\d+)", f.name).group(1))
        data = json.loads(f.read_text())
        green = frozenset(
            k
            for k, v in data.items()
            if not isinstance(v, dict)
            or (
                v.get("err") is None
                and all(
                    v.get(a, True)
                    for a in ("rows_match", "schema_match", "hash_match")
                )
            )
        )
        rounds[n] = rounds.get(n, frozenset()) | green
    _ROUNDS_CACHE[key] = (sig, dict(rounds))
    return rounds


def last_green(
    names: Iterable[str], rounds: Mapping[int, frozenset[str]]
) -> dict[str, int | None]:
    """Most recent round each query was recorded green, None if never."""
    return {
        q: max((n for n, ks in rounds.items() if q in ks), default=None)
        for q in names
    }


def rotation_order(
    names: Iterable[str],
    rounds: Mapping[int, frozenset[str]] | None = None,
    changed: Mapping[str, int] | None = None,
) -> list[str] | None:
    """Full registry ordering under the rotation policy, or None when no
    history exists (round 1 — any order satisfies the policy).

    never-checked first (alphabetical), then still-uncertified ``changed``
    entries (their last green row predates the round the change landed
    in), then everything else oldest-green first with an alphabetical
    tie-break. The list covers EVERY name, so it is a total ordering for
    ``queries()``, not just the window prefix.

    "Never checked" means never checked BY THE DRIVER: the builder's
    round-close sweep certifies staleness for the standing registry,
    but a freshly registered query that only the sweep has ever seen
    still claims a first-round driver-window slot (VERDICT r11 #7 —
    otherwise writing the sweep artifact would quietly rotate every new
    query out of its own debut window)."""
    names = list(names)
    driver_rounds = None
    if rounds is None:
        rounds = load_rounds()
        driver_rounds = load_rounds(driver_only=True)
    if changed is None:
        changed = CHANGED
    if not rounds:
        return None
    green = last_green(names, rounds)
    driver_green = (
        last_green(names, driver_rounds)
        if driver_rounds is not None
        else green
    )
    never = sorted(q for q in names if driver_green[q] is None)
    never_set = set(never)
    bumped = [
        q
        for q, rnd in changed.items()
        if q not in never_set
        and green.get(q) is not None
        and green[q] < rnd
    ]
    rest = sorted(
        (
            q
            for q in names
            if q not in never_set
            and green[q] is not None
            and q not in set(bumped)
        ),
        key=lambda q: (green[q], q),
    )
    return never + bumped + rest


def sweep_names(
    names: Iterable[str],
    round_no: int,
    rounds: Mapping[int, frozenset[str]] | None = None,
    changed: Mapping[str, int] | None = None,
) -> list[str]:
    """Tiered round-close sweep membership (VERDICT r12 #6): the full
    registry on EVEN rounds; on odd rounds, :data:`FROZEN_TWINS` whose
    previous round certified them green — and whose behavior (or their
    production sibling's) has not changed since that row — sit out.
    Everything else always sweeps. The skipped twin simply has no row in
    that round's artifact, so :func:`load_rounds`/:func:`check_window`
    account its staleness honestly (≤ 2 rounds by construction — the
    policy never relies on a fabricated green)."""
    names = list(names)
    if round_no % 2 == 0:
        return names
    if rounds is None:
        rounds = load_rounds()
    if changed is None:
        changed = CHANGED
    green = last_green(names, rounds)
    out = []
    for q in names:
        sibs = FROZEN_TWINS.get(q)
        if sibs is None:
            out.append(q)
            continue
        g = green.get(q)
        fresh = g is not None and g >= round_no - 1
        touched = any(
            changed.get(x, -1) > (g if g is not None else -1)
            for x in (q, *sibs)
        )
        if not fresh or touched:
            out.append(q)
    return out


def max_achievable_staleness(n_names: int, window: int = WINDOW) -> int:
    """The tightest staleness bound the DRIVER WINDOW ALONE can guarantee.

    Round-robining ``n_names`` queries through a ``window``-slot check
    each round re-certifies every query once per ``ceil(n/window)``
    rounds, so the stalest not-in-next-window query sits at
    ``ceil(n/window) - 1`` rounds. The 2-round target (VERDICT r3/r4)
    stays the floor: while the registry fit in 3 windows the two bounds
    coincided, and the round-close full oracle sweep
    (``CORRECTNESS_sweep_r*.json``, counted by :func:`load_rounds`)
    keeps EFFECTIVE staleness at ≤1 round whenever it lands — the
    driver-window bound below is the mechanical worst case with no
    sweep, per VERDICT r11 #1's fallback option."""
    return max(2, -(-n_names // window) - 1)


def check_window(
    names: Iterable[str],
    rounds: Mapping[int, frozenset[str]] | None = None,
    window: int = WINDOW,
    max_staleness: int | None = None,
) -> list[str]:
    """Mechanical policy check; returns human-readable violations (empty =
    compliant). ``names`` must be in registry (``queries()``) order —
    the first ``window`` entries are what the driver will check next
    round. Assuming those go green, no query may end up with a last-green
    row older than ``max_staleness`` rounds (default: the achievable
    driver-window bound, see :func:`max_achievable_staleness`), and
    every never-checked query must hold a slot.

    ADVICE r12: the default bound auto-relaxes past 2 as the registry
    outgrows the window — that relaxation is only sound alongside the
    round-close sweeps that keep EFFECTIVE staleness low, so whenever
    the computed bound exceeds 2 (and the history came from the real
    repo root), a sweep artifact no older than the latest recorded
    round minus one must exist; its absence is itself a violation that
    names the effective bound."""
    names = list(names)
    from_repo = rounds is None
    if rounds is None:
        rounds = load_rounds()
    if not rounds:
        return []
    if max_staleness is None:
        max_staleness = max_achievable_staleness(len(names), window)
        if max_staleness > 2 and from_repo:
            sweeps = [
                int(re.search(r"r(\d+)", f.name).group(1))
                for f in _REPO_ROOT.glob("CORRECTNESS_sweep_r*.json")
            ]
            if not sweeps or max(sweeps) < max(rounds) - 1:
                return [
                    f"effective staleness bound is {max_staleness} "
                    f"(registry {len(names)} > {3 * window} "
                    "certifiable by the driver window alone) but no "
                    f"round-close sweep artifact covers r{max(rounds) - 1}"
                    " or later — the relaxed bound is unbacked"
                ]
    latest = max(rounds)
    green = last_green(names, rounds)
    in_window = set(names[:window])
    violations = []
    for q in names:
        if q in in_window:
            continue  # checked next round by assumption
        if green[q] is None:
            violations.append(
                f"{q}: never driver-checked and outside the "
                f"{window}-slot window"
            )
        elif (latest + 1) - green[q] > max_staleness:
            violations.append(
                f"{q}: last green r{green[q]}, would be "
                f"{(latest + 1) - green[q]} rounds stale after next round "
                f"(max {max_staleness})"
            )
    return violations
