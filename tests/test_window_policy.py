"""Mechanical enforcement of the verification-window rotation policy.

The driver records correctness rows for the FIRST 50 entries of
``queries()`` each round; the registry is larger than the window, so the
ordering IS the verification budget. The standing policy (VERDICT r3/r4):

- every query that has NEVER been driver-checked must hold a slot in the
  current window (new queries enter the window the round they land);
- assuming the current window goes green next round, no formerly-green
  query's last green row may become older than the achievable bound
  (``rotation.max_achievable_staleness``: floor 2, else
  ceil(N/window)-1 — at 151 queries the original 2-round bound is
  driver-window-unsatisfiable, VERDICT r11 #1), with the round-close
  FULL oracle sweep (``CORRECTNESS_sweep_r*.json``) as the compensating
  control that resets EVERY query's staleness whenever it lands.

Round 4 enforced this by hand; rounds 5/6 as a static tuple (which was
stale — and red — at every judge checkpoint, because a tuple can only be
correct mid-round). Since round 7 ``queries()`` orders itself from the
recorded CORRECTNESS history at call time (kafka_to_nexus_spark/
rotation.py), so these tests must hold at ANY point in the round,
including immediately after the driver writes a new correctness file —
simulated below.
"""

from __future__ import annotations

from kafka_to_nexus_spark import queries as Q
from kafka_to_nexus_spark import rotation


def test_rotation_policy_holds():
    violations = rotation.check_window(Q.queries())
    assert not violations, "\n".join(violations)


def test_rotation_policy_survives_future_correctness_files():
    """Self-application: fabricate the NEXT rounds' correctness files
    (the current window goes green each time) and check that the
    re-derived ordering keeps satisfying the policy — the exact
    round-boundary situation where the static tuple went red in r5/r6."""
    names = list(Q.queries())
    rounds = {k: set(v) for k, v in rotation.load_rounds().items()}
    assert rounds, "driver correctness history expected in the repo root"
    for _ in range(3):  # three simulated future rounds
        order = rotation.rotation_order(names, rounds)
        violations = rotation.check_window(order, rounds)
        assert not violations, "\n".join(violations)
        rounds[max(rounds) + 1] = set(order[: rotation.WINDOW])
    # after enough simulated rounds every query has been checked
    last = rotation.last_green(names, rounds)
    assert all(g is not None for g in last.values())


def test_error_rows_never_count_as_green(tmp_path):
    """ADVICE r7: a driver row recording ONLY an error ({"err": ...}, no
    match axes) must not certify the query green — absent axes default to
    matched, so without the err guard the row would rotate a failing
    query out of the verification window."""
    import json

    (tmp_path / "CORRECTNESS_r1.json").write_text(json.dumps({
        "ok_full": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        "ok_rows_only": {"rows_match": True},
        "err_only": {"err": "Py4JJavaError: ..."},
        "err_with_axes": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": "timeout"},
        "red": {"rows_match": True, "schema_match": True,
                "hash_match": False, "err": None},
    }))
    rounds = rotation.load_rounds(tmp_path)
    assert rounds[1] == frozenset({"ok_full", "ok_rows_only"})


def test_rotation_order_rules():
    """never-checked lead, still-uncertified CHANGED entries follow, then
    oldest-green first; the order is total (covers the whole registry),
    and a CHANGED bump self-clears once a green row postdates the
    change's round."""
    names = ["b_new", "a_new", "old_r1", "old_r2", "changed_q"]
    rounds = {
        1: frozenset({"old_r1", "changed_q"}),
        2: frozenset({"old_r2", "changed_q"}),
    }
    order = rotation.rotation_order(names, rounds, changed={"changed_q": 3})
    assert order == ["a_new", "b_new", "changed_q", "old_r1", "old_r2"]
    # once r3 records changed_q green, the bump stops applying and the
    # entry is ordered by staleness like everything else
    rounds[3] = frozenset({"changed_q"})
    order = rotation.rotation_order(names, rounds, changed={"changed_q": 3})
    assert order == ["a_new", "b_new", "old_r1", "old_r2", "changed_q"]
    # no history → None (any order is fine in round 1)
    assert rotation.rotation_order(names, {}) is None


def test_max_achievable_staleness_bound():
    """Floor of 2 while the registry fits in 3 windows, then exactly the
    round-robin re-certification period minus one."""
    f = rotation.max_achievable_staleness
    assert f(50) == 2
    assert f(150) == 2
    assert f(151) == 3  # the r11 registry size that broke the fixed bound
    assert f(200) == 3
    assert f(201) == 4


def test_sweep_files_count_as_green_rounds(tmp_path):
    """A round-close full-sweep artifact (CORRECTNESS_sweep_rN.json) must
    certify greenness exactly like a driver file, and same-round files
    must union — the VERDICT r11 #1 preferred fix."""
    import json

    (tmp_path / "CORRECTNESS_r5.json").write_text(json.dumps({
        "in_window": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_sweep_r5.json").write_text(json.dumps({
        "in_window": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        "sweep_only": {"rows_match": True, "schema_match": True,
                       "hash_match": True, "err": None},
        "sweep_red": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
    }))
    rounds = rotation.load_rounds(tmp_path)
    assert rounds[5] == frozenset({"in_window", "sweep_only"})


def test_new_queries_enter_the_window_their_first_round():
    """VERDICT r11 #7: the driver checks the FIRST 50 of queries() — a
    freshly registered query (no green row anywhere in history) must be
    ordered into that prefix immediately, ahead of every already-green
    query, no matter how large the registry grows."""
    names = list(Q.queries()) + ["zzz_brand_new_query"]
    order = rotation.rotation_order(names)
    assert order is not None
    assert "zzz_brand_new_query" in order[: rotation.WINDOW]
    # "never checked" means never checked BY THE DRIVER: a round-close
    # sweep pre-certifying a fresh query must not rotate it out of its
    # own debut window (found live in r12 — writing the sweep artifact
    # pushed five brand-new queries past slot 50)
    driver_rounds = rotation.load_rounds(driver_only=True)
    fresh = sorted(
        q for q in order
        if rotation.last_green([q], driver_rounds)[q] is None
    )
    assert order[: len(fresh)] == fresh
    # and that stays true while fewer than WINDOW never-checked queries
    # exist, which the policy check itself enforces (a never-checked
    # query outside the window is a violation regardless of staleness)
    assert len(fresh) <= rotation.WINDOW, (
        "more driver-never queries than window slots — the debut "
        "guarantee itself is unsatisfiable this round"
    )


def test_every_registry_query_has_an_oracle_or_is_documented():
    """Every queries() entry should carry a DuckDB oracle — the driver
    records a weaker rows-only check otherwise. Keep the exception list
    explicit and empty unless a genuinely non-SQL-expressible op lands."""
    allowed_no_oracle: set[str] = set()
    missing = set(Q.queries()) - set(Q.oracle_sql()) - allowed_no_oracle
    assert not missing, sorted(missing)


def test_rounds_cache_keeps_both_variants():
    """ADVICE r12: load_rounds() and load_rounds(driver_only=True) must
    not evict each other — rotation_order calls both per invocation, so
    a single-slot cache re-parsed every CORRECTNESS file on every call."""
    rotation._ROUNDS_CACHE.clear()
    rotation.load_rounds()
    rotation.load_rounds(driver_only=True)
    assert len(rotation._ROUNDS_CACHE) == 2
    # both hit on the second call (no reparse: signatures unchanged)
    before = {k: id(v) for k, v in rotation._ROUNDS_CACHE.items()}
    rotation.load_rounds()
    rotation.load_rounds(driver_only=True)
    assert {k: id(v) for k, v in rotation._ROUNDS_CACHE.items()} == before


def test_sweep_tiering_policy():
    """VERDICT r12 #6: even rounds sweep everything; odd rounds drop a
    frozen twin ONLY when its previous round certified it green and
    neither it nor its production sibling changed since."""
    names = ["prod_a", "twin_a", "prod_b", "twin_b", "other"]
    twins = {"twin_a": ("prod_a",), "twin_b": ("prod_b",)}
    orig = rotation.FROZEN_TWINS
    rotation.FROZEN_TWINS = twins
    try:
        rounds = {
            12: frozenset(names),  # everything green at r12
            11: frozenset({"twin_b"}),
        }
        # even round: full sweep regardless
        assert rotation.sweep_names(names, 14, rounds, {}) == names
        # odd round 13: both twins fresh (green r12 >= 13-1) -> skipped
        assert rotation.sweep_names(names, 13, rounds, {}) == [
            "prod_a", "prod_b", "other",
        ]
        # a CHANGED entry on the twin itself forces it back in
        assert "twin_a" in rotation.sweep_names(
            names, 13, rounds, {"twin_a": 13}
        )
        # ... and on the production sibling too
        assert "twin_b" in rotation.sweep_names(
            names, 13, rounds, {"prod_b": 13}
        )
        # a twin whose green row is 2+ rounds old must sweep
        stale = {12: frozenset({"prod_a", "prod_b", "other", "twin_a"}),
                 10: frozenset({"twin_b"})}
        assert "twin_b" in rotation.sweep_names(names, 13, stale, {})
        # a never-green twin always sweeps
        assert "twin_a" in rotation.sweep_names(
            names, 13, {12: frozenset({"prod_a"})}, {}
        )
    finally:
        rotation.FROZEN_TWINS = orig


def test_frozen_twins_are_registry_queries():
    """The tier table must not drift from the registry: every frozen
    twin and every named production sibling is a real queries() entry."""
    names = set(Q.queries())
    for twin, sibs in rotation.FROZEN_TWINS.items():
        assert twin in names, twin
        for s in sibs:
            assert s in names, (twin, s)


def test_skipped_twin_staleness_stays_within_bound():
    """End-to-end soundness of tiering: simulate alternating tiered
    sweeps + driver windows over the real registry — no query's
    staleness ever exceeds the mechanical bound check_window enforces."""
    names = list(Q.queries())
    rounds = {k: set(v) for k, v in rotation.load_rounds().items()}
    for step in range(4):
        rnd = max(rounds) + 1
        order = rotation.rotation_order(names, rounds)
        violations = rotation.check_window(order, rounds)
        assert not violations, "\n".join(violations)
        # driver window goes green, then the round-close tiered sweep
        swept = rotation.sweep_names(names, rnd, rounds)
        rounds[rnd] = set(order[: rotation.WINDOW]) | set(swept)
    # frozen twins were certified at most 2 rounds back at every point
    last = rotation.last_green(names, rounds)
    latest = max(rounds)
    for twin in rotation.FROZEN_TWINS:
        assert last[twin] is not None and latest - last[twin] <= 2, (
            twin, last[twin], latest,
        )


def test_relaxed_bound_requires_sweep_backing(tmp_path, monkeypatch):
    """ADVICE r12: when the computed staleness bound exceeds 2, a repo
    with NO recent round-close sweep artifact must trip check_window —
    the silent auto-relaxation is the thing being guarded."""
    import json

    names = [f"q{i:03d}" for i in range(151)]  # bound = 3
    rows = {q: {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None} for q in names}
    (tmp_path / "CORRECTNESS_r8.json").write_text(json.dumps(rows))
    monkeypatch.setattr(rotation, "_REPO_ROOT", tmp_path)
    rotation._ROUNDS_CACHE.clear()
    violations = rotation.check_window(names)
    assert violations and "unbacked" in violations[0], violations
    # a sweep artifact for the latest-1 round (or later) clears it
    (tmp_path / "CORRECTNESS_sweep_r8.json").write_text(json.dumps(rows))
    rotation._ROUNDS_CACHE.clear()
    assert rotation.check_window(names) == []
    rotation._ROUNDS_CACHE.clear()
