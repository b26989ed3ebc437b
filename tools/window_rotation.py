"""Verification-window staleness report.

Since round 7 the rotation is SELF-APPLYING: ``queries()`` orders itself
from the recorded ``CORRECTNESS_r*.json`` history at call time
(kafka_to_nexus_spark/rotation.py holds the policy logic; this tool is
the human-readable report over the same functions). It prints:

- queries NEVER driver-checked (they hold leading slots automatically);
- per-query last-green round and staleness;
- the window the driver will check next round (= the first 50 entries
  of the CURRENT ``queries()`` — no paste step remains);
- any policy violations (should be impossible unless rotation.CHANGED
  outgrew the window).

Usage: python tools/window_rotation.py [window_size]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kafka_to_nexus_spark import rotation

# Back-compat aliases: tests and prior-round notes referenced these here.
load_rounds = rotation.load_rounds


def check_window(window: int = rotation.WINDOW, max_staleness: int = 2) -> list[str]:
    from kafka_to_nexus_spark import queries as Q

    return rotation.check_window(
        Q.queries(), window=window, max_staleness=max_staleness
    )


def main() -> int:
    from kafka_to_nexus_spark import queries as Q

    window = int(sys.argv[1]) if len(sys.argv) > 1 else rotation.WINDOW
    rounds = rotation.load_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    latest = max(rounds)
    registry = list(Q.queries())
    green = rotation.last_green(registry, rounds)

    never = [q for q in registry if green[q] is None]
    aged = sorted(
        (q for q in registry if green[q] is not None),
        key=lambda q: (green[q], q),
    )
    print(
        f"rounds seen: {sorted(rounds)} (latest r{latest}); "
        f"registry: {len(registry)}; window: {window}"
    )
    print(f"\nNEVER checked ({len(never)}):")
    for q in never:
        print(f"  {q}")
    if rotation.CHANGED:
        print(f"\nbehavior-changed this round (rotation.CHANGED): "
              f"{list(rotation.CHANGED)}")
    print("\nstalest green (last-green round, staleness):")
    for q in aged[:20]:
        print(f"  {q}: r{green[q]} (+{latest - green[q]})")

    print(f"\nwindow the driver checks next round (first {window} of queries()):")
    for q in registry[:window]:
        print(f"    {q}")
    outside = registry[window:]
    worst = min(
        (green[q] for q in outside if green[q] is not None), default=None
    )
    if worst is not None:
        print(f"\noldest green row left OUTSIDE the window: r{worst} "
              f"({latest + 1 - worst} rounds stale after next round)")
    bad = check_window(window)
    if bad:
        print("\nPOLICY VIOLATIONS:")
        for v in bad:
            print(f"  {v}")
        return 2
    print("\nregistry ordering satisfies the rotation policy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
