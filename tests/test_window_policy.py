"""Mechanical enforcement of the verification-window rotation policy.

The driver records correctness rows for the FIRST 50 entries of
``queries()`` each round; the registry is larger than the window, so the
ordering IS the verification budget. The standing policy (VERDICT r3/r4):

- every query that has NEVER been driver-checked must hold a slot in the
  current window (new queries enter the window the round they land);
- assuming the current window goes green next round, no formerly-green
  query's last green row may become older than two rounds.

Round 4 enforced this by hand; this test makes it mechanical so a
registry addition or a careless rotation fails CI instead of silently
aging a query out of verification.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import window_rotation


def test_rotation_policy_holds():
    violations = window_rotation.check_window(window=50, max_staleness=2)
    assert not violations, "\n".join(violations)


def test_every_registry_query_has_an_oracle_or_is_documented():
    """Every queries() entry should carry a DuckDB oracle — the driver
    records a weaker rows-only check otherwise. Keep the exception list
    explicit and empty unless a genuinely non-SQL-expressible op lands."""
    from kafka_to_nexus_spark import queries as Q

    allowed_no_oracle: set[str] = set()
    missing = set(Q.queries()) - set(Q.oracle_sql()) - allowed_no_oracle
    assert not missing, sorted(missing)
