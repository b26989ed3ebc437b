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

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def main() -> int:
    from kafka_to_nexus_spark import queries as Q

    root = Path(__file__).resolve().parents[1]
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
