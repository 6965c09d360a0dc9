"""Row->document projection operators (SURVEY.md P1-P3).

The reference's only transform is the row->HashMap stringify loop
(reference ``BulkProcessImpl.java:112-117``: every column read with
``rs.getString``), keyed by ``S_GUID`` (``:124, :136``) with lowercase
identifier normalization (``:64``). All three are pure narrow
projections here — no shuffle, fully codegen'd, columns prune through
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stringify_all(df: DataFrame) -> DataFrame:
    """Cast every column to string, preserving nulls and column order.

    Spark-native equivalent of the reference's per-row, per-column
    ``rs.getString`` loop (``BulkProcessImpl.java:113-117``) — expressed
    as one declarative projection so it runs inside whole-stage codegen
    instead of a row-at-a-time interpreter.
    """
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def key_by(df: DataFrame, key_col: str, *, out: str = "S_GUID", auto_id: bool = True) -> Column | DataFrame:
    """Attach the document-id column (``BulkProcessImpl.java:124``).

    ``auto_id=True`` reproduces the ES behavior for a null id: the sink
    auto-generates one (``IndexRequest`` with null id), expressed as
    ``coalesce(key, uuid())``.
    """
    key = F.col(key_col).cast("string")
    if auto_id:
        key = F.coalesce(key, F.expr("uuid()"))
    return df.withColumn(out, key)


def composite_key(df: DataFrame, *cols: str, out: str = "S_GUID", sep: str = "-") -> DataFrame:
    """Build a synthetic GUID from component columns (used to derive the
    reference-shaped ``src_wide`` fixture from lineitem, FIXTURES.md §A)."""
    return df.withColumn(out, F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]))


def lowercase_names(df: DataFrame) -> DataFrame:
    """Normalize identifiers to lowercase — the reference lowercases every
    index name because ES requires it (``BulkProcessImpl.java:64``)."""
    return df.select([F.col(c).alias(c.lower()) for c in df.columns])


_IDENT_RE = __import__("re").compile(r"^[a-z0-9_]+$")


def normalize_index_name(name: str) -> str:
    """Identifier normalization for catalog objects (P3): strip +
    lowercase (reference BulkProcessImpl.java:64), then VALIDATE —
    normalized names are interpolated into SQL DDL, so anything outside
    ``[a-z0-9_]`` (backticks, parens, semicolons, dots) is rejected
    instead of reaching the parser. ``_all`` is reserved (mirrors ES's
    reserved multi-index name): an index literally named ``_all`` would
    re-enter the scatter-gather branch of ``api.query_data`` forever."""
    n = name.strip().lower()
    if not _IDENT_RE.match(n):
        raise ValueError(
            f"invalid index/table name {name!r}: normalized form must match [a-z0-9_]+"
        )
    if n == "_all":
        raise ValueError("'_all' is a reserved index name (ES multi-index alias)")
    return n


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """CDC apply / upsert-merge: produce the next snapshot of ``base``
    from a change batch with an ``op`` column ('I' insert, 'U' update,
    'D' delete) — the MERGE INTO the reference's last-write-wins bulk
    load is a degenerate form of (its ES index op is upsert-only,
    reference BulkProcessImpl.java:124,136).

    One change row per key per batch (collapse upstream with
    dedup_last_write_wins if the feed has more). Plan: ONE anti-join
    of the snapshot against the (usually tiny -> broadcast) change-key
    set, plus a union of the I/U payloads — the snapshot is never
    shuffled when the change batch broadcasts; at 100 TB this is the
    standard big-snapshot/small-delta merge shape.
    """
    ops = changes.select(F.col(op_col)).distinct().collect()
    bad = {r[0] for r in ops} - {"I", "U", "D"}
    if bad:
        raise ValueError(f"unknown change ops: {sorted(bad)} (use I/U/D)")
    survivors = base.join(changes.select(key), key, "left_anti")
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
    return survivors.unionByName(upserts)


def quarantine_ingest(df, casts, *, reason_col: str = "quarantine_reason"):
    """Dead-letter ingest: split dirty input into (clean, quarantined).

    ``casts`` maps column -> target type. A row is CLEAN when every
    listed column either try_casts successfully or was null to begin
    with (null in, null out is not an error); otherwise it lands in the
    quarantine with a comma-joined reason naming the failing columns —
    the production pattern the reference's per-row Java loop
    approximates with a log line (BulkProcessImpl.java:110-131): never
    fail the batch for a bad row, never silently drop it either.

    Both outputs come from ONE narrow projection over the same scan
    (the split is two filters on a shared plan — Spark evaluates each
    sink's branch; no shuffle, no UDF). The clean side carries the
    CAST columns; the quarantine keeps the ORIGINAL values plus the
    reason, so the dead-letter queue is replayable after a parser fix.

    Returns ``(clean, quarantined)``.
    """
    from pyspark.sql import functions as F

    if not casts:
        raise ValueError("quarantine_ingest needs at least one cast")
    fail_flags = [
        (c, F.col(c).isNotNull() & F.col(c).try_cast(t).isNull())
        for c, t in casts.items()
    ]
    reason = F.concat_ws(
        ",",
        *[F.when(flag, F.lit(c)) for c, flag in fail_flags],
    )
    bad_pred = None
    for _, flag in fail_flags:
        bad_pred = flag if bad_pred is None else (bad_pred | flag)
    clean = df.filter(~bad_pred).select(
        *[
            F.col(c).try_cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
    )
    quarantined = df.filter(bad_pred).withColumn(reason_col, reason)
    return clean, quarantined


def url_parts(url):
    """Decompose a URL column into the parts web-corpus curation keys
    on: host, registered domain (last two host labels — the eTLD+1
    approximation a public-suffix-list-free pipeline uses), path, and
    path depth. Pure JVM expressions (``parse_url`` + array ops), no
    UDF; at 100 TB this is the map-side prelude to the per-domain
    quota/blocklist joins.

    Returns a struct column ``(host, domain, path, depth)``."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(u, F.lit("HOST"))
    labels = F.split(host, r"\.")
    domain = F.array_join(
        F.slice(labels, F.greatest(F.size(labels) - 1, F.lit(1)), 2), "."
    )
    path = F.parse_url(u, F.lit("PATH"))
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return F.struct(
        host.alias("host"),
        domain.alias("domain"),
        path.alias("path"),
        depth.alias("depth"),
    )


def canonical_url(url):
    """URL canonicalization for web-corpus dedup: lowercase the host,
    drop the port (``parse_url('HOST')`` is port-less, so ANY port is
    canonicalization-transparent), strip the query string, fragment,
    and any trailing slash — the normalization step URL-level dedup
    keys on BEFORE content hashing (the same page crawled as
    ``...?utm_source=x`` and ``.../`` must collapse to one key).

    Pure JVM expressions (``parse_url`` + one regexp_replace), no UDF —
    a map-side projection at any scale; the oracle replays it with
    regexp extraction plus an explicit port strip (DuckDB has no
    parse_url)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), "/$", "")
    return F.concat(host, path)
