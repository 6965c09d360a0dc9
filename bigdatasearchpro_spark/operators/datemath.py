"""ES date math (``now-7d/d``, ``2020-01-01||+1M/d``) — the range-query
time anchor syntax the delegated `?q=` surface accepts in range clauses
(public ES date-math grammar: an anchor — ``now`` or ``<date>||`` —
followed by ``±N<unit>`` offsets and at most one trailing ``/<unit>``
rounding, units ``y M w d h H m s``).

Evaluation happens ONCE on the driver to a concrete timestamp literal
that then participates in a pushed scan predicate — date math never
touches per-row compute, so the plan is identical to a literal range
filter (the only sane shape at 100 TB; a per-row ``now`` would also be
non-deterministic across executors).  ``now`` must be passed explicitly
by the caller: an implicit wall clock would make query results
irreproducible and any oracle unreplayable.
"""

from __future__ import annotations

import datetime as dt
import re

_TOKEN = re.compile(r"([+-]\d+[yMwdhHms])|(/[yMwdhHms])")

_ROUND_FLOORS = {
    "y": lambda t: t.replace(month=1, day=1, hour=0, minute=0, second=0,
                             microsecond=0),
    "M": lambda t: t.replace(day=1, hour=0, minute=0, second=0,
                             microsecond=0),
    "w": lambda t: (t - dt.timedelta(days=t.weekday())).replace(
        hour=0, minute=0, second=0, microsecond=0),
    "d": lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0),
    "h": lambda t: t.replace(minute=0, second=0, microsecond=0),
    "H": lambda t: t.replace(minute=0, second=0, microsecond=0),
    "m": lambda t: t.replace(second=0, microsecond=0),
    "s": lambda t: t.replace(microsecond=0),
}


def _add_months(t: dt.datetime, n: int) -> dt.datetime:
    month0 = t.month - 1 + n
    year = t.year + month0 // 12
    month = month0 % 12 + 1
    # ES clamps to the last valid day of the target month
    last = [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
            else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1]
    return t.replace(year=year, month=month, day=min(t.day, last))


def parse_date_math(expr: str, *, now: "dt.datetime | None" = None) -> dt.datetime:
    """Evaluate an ES date-math expression to a datetime.

    ``now``-anchored expressions REQUIRE the ``now`` argument (see the
    module docstring — reproducibility is the point).  Absolute anchors
    use the ``<iso>||`` form; a bare ISO date/datetime (no ``||``) is
    also accepted, like ES's lenient range bounds.  Rounding (``/d``)
    floors to the unit start and must be the final token."""
    rest = ""
    if expr.startswith("now"):
        if now is None:
            raise ValueError("now-anchored date math requires now=")
        anchor, rest = now, expr[3:]
    elif "||" in expr:
        head, _, rest = expr.partition("||")
        anchor = dt.datetime.fromisoformat(head)
    else:
        return dt.datetime.fromisoformat(expr)

    pos = 0
    rounded = False
    t = anchor
    for m in _TOKEN.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date math at {rest[pos:]!r} in {expr!r}")
        pos = m.end()
        if rounded:
            raise ValueError(f"rounding must be last in {expr!r}")
        tok = m.group(0)
        if tok.startswith("/"):
            t = _ROUND_FLOORS[tok[1]](t)
            rounded = True
            continue
        n, unit = int(tok[:-1]), tok[-1]
        if unit == "y":
            t = _add_months(t, 12 * n)
        elif unit == "M":
            t = _add_months(t, n)
        else:
            secs = {"w": 604800, "d": 86400, "h": 3600, "H": 3600,
                    "m": 60, "s": 1}[unit]
            t = t + dt.timedelta(seconds=n * secs)
    if pos != len(rest):
        raise ValueError(f"bad date math at {rest[pos:]!r} in {expr!r}")
    return t
