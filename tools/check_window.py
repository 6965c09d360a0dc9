"""Driver-coverage window checker.

The driver verifies the FIRST 50 entries of ``__spark_entry__.queries()``
each round.  Since round 8 the ordering contract is:

- the reviewed FRONT list (fixes + new entries + flagship picks) comes
  first and is the ONLY place human judgment reorders anything;
- everything else is pure STALEST-FIRST: never-driver-checked entries
  (no verdict in any CORRECTNESS_r*.json) before checked ones, then
  ascending last-verdict round, registry order breaking ties.

This tool FAILS (exit 1) when:

- a front-listed name no longer exists in the registry; or
- the non-front ordering violates stalest-first — i.e. some entry was
  displaced by a younger one (the round-7 back-pinning bug class).

tests/test_window.py runs the same check in pytest so a violation
cannot ship.  Run after any registry or front-list change:

    python tools/check_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def verdict_ages(repo: str) -> dict[str, int]:
    ages: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                names = json.load(f)
        except (OSError, ValueError):
            continue
        for n in names:
            ages[n] = max(ages.get(n, 0), rnd)
    return ages


def check() -> tuple[list[str], dict[str, object]]:
    """Returns (violations, info).  Empty violations == pass."""
    import __spark_entry__ as entry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    q = list(entry.queries())
    ages = verdict_ages(repo)
    front = [n for n in entry.FRONT]

    violations: list[str] = []
    dead_front = [n for n in front if n not in q]
    if dead_front:
        violations.append(f"front-listed names missing from registry: "
                          f"{dead_front}")

    # stalest-first over the non-front tail: ages must be non-decreasing
    tail = [n for n in q if n not in front]
    tail_ages = [ages.get(n, 0) for n in tail]
    for i in range(1, len(tail_ages)):
        if tail_ages[i] < tail_ages[i - 1]:
            violations.append(
                f"stalest-first violated: {tail[i]} (r{tail_ages[i]}) "
                f"ordered after {tail[i-1]} (r{tail_ages[i-1]})")
            break

    w = q[:WINDOW]
    never = [n for n in q if n not in ages]
    info = {
        "entries": len(q),
        "front": len([n for n in front if n in q]),
        "never_checked": len(never),
        "never_checked_in_window": len([n for n in w if n not in ages]),
        "window_ages": sorted({f"r{ages.get(n, 0)}" for n in w}),
        "drain_rounds_left": -(-len(never) // WINDOW),
    }
    return violations, info


def main() -> None:
    violations, info = check()
    print(f"registry entries: {info['entries']}   window: {WINDOW}   "
          f"front: {info['front']}")
    print(f"never-checked: {info['never_checked']} total, "
          f"{info['never_checked_in_window']} in this window "
          f"(~{info['drain_rounds_left']} windows to drain)")
    print(f"verdict rounds present in window: {info['window_ages']}")
    for v in violations:
        print(f"!! {v}")
    if not violations:
        print("ok: front list valid, non-front ordering is stalest-first")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
