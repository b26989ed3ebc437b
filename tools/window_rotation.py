"""Verification-window staleness report + suggested rotation.

The driver checks the FIRST 50 entries of ``queries()`` against DuckDB each
round (CORRECTNESS_r{N}.json). This tool reads every correctness artifact in
the repo root plus the current registry and prints:

- queries NEVER driver-checked (must get a slot — standing rule #1);
- per-query last-green round and staleness in rounds;
- a suggested next _PRIORITY ordering: never-checked first, then
  oldest-green first, canaries/representatives last.

Usage: python tools/window_rotation.py [window_size]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

def _window_arg() -> int:
    if __name__ == "__main__" and len(sys.argv) > 1:
        return int(sys.argv[1])
    return 50


WINDOW = _window_arg()


def load_rounds(root: Path | None = None) -> dict[int, set[str]]:
    """Per-round sets of green query names from CORRECTNESS_r*.json."""
    root = root or Path(__file__).resolve().parents[1]
    rounds: dict[int, set[str]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        data = json.loads(f.read_text())
        # a query counts as green only if every recorded axis matched
        rounds[n] = {
            k for k, v in data.items()
            if not isinstance(v, dict)
            or all(v.get(a, True) for a in ("rows_match", "schema_match", "hash_match"))
        }
    return rounds


def check_window(window: int = 50, max_staleness: int = 2) -> list[str]:
    """Mechanical rotation-policy check; returns human-readable violations
    (empty = compliant). Assuming the CURRENT first-``window`` registry
    entries all go green next round, no registry query may end up with a
    last-green row older than ``max_staleness`` rounds, and every
    never-checked query must hold a slot in the current window."""
    from kafka_to_nexus_spark import queries as Q

    rounds = load_rounds()
    if not rounds:
        return []  # nothing recorded yet (round 1): any window is fine
    latest = max(rounds)
    registry = list(Q.queries())
    in_window = set(registry[:window])
    violations = []
    for q in registry:
        green = max((n for n, ks in rounds.items() if q in ks), default=None)
        if q in in_window:
            continue  # checked next round by assumption
        if green is None:
            violations.append(
                f"{q}: never driver-checked and outside the {window}-slot window"
            )
        elif (latest + 1) - green > max_staleness:
            violations.append(
                f"{q}: last green r{green}, would be {(latest + 1) - green} "
                f"rounds stale after next round (max {max_staleness})"
            )
    return violations


def main() -> int:
    from kafka_to_nexus_spark import queries as Q

    rounds = load_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    latest = max(rounds)
    registry = list(Q.queries())
    last_green = {
        q: max((n for n, ks in rounds.items() if q in ks), default=None)
        for q in registry
    }

    never = [q for q in registry if last_green[q] is None]
    aged = sorted(
        (q for q in registry if last_green[q] is not None),
        key=lambda q: (last_green[q], q),
    )
    print(f"rounds seen: {sorted(rounds)} (latest r{latest}); "
          f"registry: {len(registry)}; window: {WINDOW}")
    print(f"\nNEVER checked ({len(never)}):")
    for q in never:
        print(f"  {q}")
    print("\nstalest green (last-green round, staleness):")
    for q in aged[:20]:
        print(f"  {q}: r{last_green[q]} (+{latest - last_green[q]})")

    suggestion = (never + aged)[:WINDOW]
    print(f"\nsuggested next window ({len(suggestion)} slots, paste into _PRIORITY):")
    for q in suggestion:
        print(f'    "{q}",')
    outside = [q for q in registry if q not in set(suggestion)]
    worst = min(
        (last_green[q] for q in outside if last_green[q] is not None),
        default=None,
    )
    if worst is not None:
        print(f"\noldest green row left OUTSIDE the window: r{worst} "
              f"({latest + 1 - worst} rounds stale after next round)")
    bad = check_window(WINDOW)
    if bad:
        print("\nPOLICY VIOLATIONS (current _PRIORITY):")
        for v in bad:
            print(f"  {v}")
        return 2
    print("\ncurrent _PRIORITY satisfies the rotation policy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
