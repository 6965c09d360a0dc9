"""IP ring: the ES ``ip`` field type surface — dotted-quad parse /
format, CIDR term queries, and the ``ip_range`` aggregation.

ES 6.x (the endpoint the reference delegates to,
indexView.html:13-19) types address columns as ``ip`` and serves
``term`` queries in CIDR notation plus ``ip_range`` aggregations.
The engine-native representation is the unsigned-32 integer form in a
BIGINT: every predicate/bucket below is pure integer column math that
stays inside the scan's codegen span and replays exactly in any SQL
engine (``//``/``%`` on non-negative integers — no string ops in the
hot path, no UDFs).

The fixture tables carry no addresses, so entries synthesize one
deterministically from a key (the geo/url derivation pattern):
``10.0.0.0 + (key * 2654435761) % 2^20`` — a Knuth-hash spread over
the 10.0.0.0/12 block, identical in both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_ip(text: str) -> int:
    """Dotted-quad string -> unsigned-32 integer (driver-side: CIDR
    literals and range bounds resolve ONCE, like date math)."""
    parts = text.split(".")
    if len(parts) != 4 or not all(p.isdigit() and int(p) <= 255 for p in parts):
        raise ValueError(f"not an IPv4 address: {text!r}")
    a, b, c, d = (int(p) for p in parts)
    return (a << 24) | (b << 16) | (c << 8) | d


def format_ip(n: int) -> str:
    return f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"


def ip_to_long_col(col: "Column | str") -> Column:
    """Dotted-quad string column -> BIGINT (octet split + exact
    integer products; ANSI-safe, values < 2^32)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        parts[0].cast("bigint") * F.lit(16777216)
        + parts[1].cast("bigint") * F.lit(65536)
        + parts[2].cast("bigint") * F.lit(256)
        + parts[3].cast("bigint")
    )


def long_to_ip_col(col: "Column | str") -> Column:
    """BIGINT -> dotted-quad string (integer div/mod chain — the same
    ``(x // k) % 256`` the oracle runs)."""
    c = F.col(col) if isinstance(col, str) else col
    octets = [
        (c / F.lit(16777216)).cast("bigint") % F.lit(256),
        (c / F.lit(65536)).cast("bigint") % F.lit(256),
        (c / F.lit(256)).cast("bigint") % F.lit(256),
        c % F.lit(256),
    ]
    return F.concat_ws(".", *[o.cast("string") for o in octets])


def parse_cidr(cidr: str) -> tuple[int, int]:
    """``"10.4.0.0/14"`` -> (network base long, half-open end long).
    Resolved driver-side so the per-row predicate is a pure integer
    range check that pushes into the scan."""
    addr, _, plen = cidr.partition("/")
    prefix = int(plen) if plen else 32
    if not 0 <= prefix <= 32:
        raise ValueError(f"bad CIDR prefix: {cidr!r}")
    block = 1 << (32 - prefix)
    base = (parse_ip(addr) // block) * block
    return base, base + block


def cidr_pred(ip_long: "Column | str", cidr: str) -> Column:
    """ES ``term`` query on an ``ip`` field in CIDR notation: one
    closed-open integer range predicate (scan-pushable)."""
    lo, hi = parse_cidr(cidr)
    c = F.col(ip_long) if isinstance(ip_long, str) else ip_long
    return (c >= F.lit(lo)) & (c < F.lit(hi))


def ip_range_agg(
    df: DataFrame,
    ip_long: str,
    ranges: Sequence[tuple[str, "str | None", "str | None"]],
) -> DataFrame:
    """ES ``ip_range`` aggregation: half-open ``[from, to)`` buckets
    given as dotted-quad bounds (``None`` = unbounded), every
    requested bucket present even when empty (ES contract).  Bounds
    resolve driver-side to integers; the buckets then reduce to ONE
    pass of parallel conditional counts (``aggs.range_agg``) — a
    single scalar aggregate row unpivoted, no shuffle by bucket."""
    from bigdatasearchpro_spark.operators.aggs import range_agg

    resolved = [
        (
            key,
            None if lo is None else float(parse_ip(lo)),
            None if hi is None else float(parse_ip(hi)),
        )
        for key, lo, hi in ranges
    ]
    return range_agg(df, ip_long, resolved)
