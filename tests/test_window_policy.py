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
