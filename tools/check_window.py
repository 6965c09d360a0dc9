"""Driver-coverage window checker.

The driver verifies the FIRST 50 entries of ``__spark_entry__.queries()``
each round. This tool prints the window and flags two mistakes that are
easy to make when adding entries late in a round:

- a stale entry (oldest verdict) displaced out of the window by newer
  additions (never-checked entries sort at age 0, AHEAD of stale ones);
- front-listed names that no longer exist in the registry.

Run after any registry or front-list change:

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


def main() -> None:
    import __spark_entry__ as entry

    q = list(entry.queries())
    ages: dict[str, int] = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            names = json.load(open(path, encoding="utf-8"))
        except (OSError, ValueError):
            continue
        for n in names:
            ages[n] = max(ages.get(n, 0), rnd)

    w = q[:WINDOW]
    oldest = min(ages.values()) if ages else 0
    stale = [n for n, a in ages.items() if a == oldest and n in q]
    missing_stale = [n for n in stale if n not in w]
    dead_front = [n for n in entry._R7_FIXED_OR_NEW if n not in q]
    never = [n for n in w if n not in ages]

    print(f"registry entries: {len(q)}   window: {WINDOW}")
    print(f"oldest verdict round: r{oldest}  ({len(stale)} entries)")
    print(f"never-checked in window: {len(never)}")
    status = 0
    if missing_stale:
        print(f"!! stale r{oldest} entries DISPLACED from the window: "
              f"{missing_stale}")
        status = 1
    else:
        print(f"ok: every r{oldest} entry fits the window")
    if dead_front:
        print(f"!! front-listed names missing from the registry: {dead_front}")
        status = 1
    sys.exit(status)


if __name__ == "__main__":
    main()
