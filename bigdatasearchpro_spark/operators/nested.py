"""ES ``nested`` surface: queries and aggregations over array-of-struct
("nested object") columns.

The reference bulk-loads flat MySQL rows into ES and delegates every
query to it (BulkProcessImpl.java:96-137, indexView.html:13-19); ES
users with one-to-many data model it as ``nested`` mappings — an array
of sub-documents inside the parent — and query it with the ``nested``
query and ``nested`` / ``reverse_nested`` aggregations.  The defining
semantic (and the reason the mapping type exists at all): a ``nested``
query's inner conjunction must hold WITHIN A SINGLE sub-object.  A
flat/dotted ("object"-mapped) document flattens the arrays per field,
so ``a:x AND b:y`` can match with ``a:x`` from one sub-object and
``b:y`` from another — the classic cross-object false positive.

Spark re-homing:

- the nested document itself is ``array<struct<...>>`` — built once
  with ``collect_list(struct(...))`` (one hash shuffle on the parent
  key, exactly the co-routing ES does at index time);
- the ``nested`` query is ``F.exists``/``F.filter`` over that array —
  a NARROW per-row expression inside the scan's codegen span: no
  explode, no shuffle, no join.  At 100 TB the predicate cost is the
  array walk per document, the same doc-values walk ES does;
- the ``nested`` aggregation is one explode + hash aggregate — the
  explode of ``array<struct>`` is exactly a scan of the child table
  it was built from, so the agg costs what aggregating the flat child
  relation costs: one shuffle on the group key with map-side combine.
  ``reverse_nested`` re-counts PARENTS inside each nested bucket —
  here a ``count(DISTINCT parent_id)`` in the same aggregate, not a
  second pass.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_nested_docs(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_cols: Sequence[str],
    *,
    path: str = "children",
    order_by: "Sequence[str] | None" = None,
) -> DataFrame:
    """Materialize the ES nested-mapping shape: each parent row gains
    ``path`` = ``array<struct<child_cols>>`` of its children.

    One hash aggregate on the child key + one key join to the parents
    — the index-time cost of the nested mapping (ES pays it at index
    time too: nested sub-documents are co-located Lucene docs).  The
    array is sorted by ``order_by`` (default: ``child_cols`` order) so
    the constructed column is deterministic under any shuffle order.
    Parents with no children get an EMPTY array (like an ES parent
    with zero nested objects), not NULL.
    """
    order = list(order_by) if order_by is not None else list(child_cols)
    # array_sort on the struct sorts by field order — put the sort
    # columns first in the struct, then rebuild the declared layout.
    sort_struct = F.struct(
        *[F.col(c) for c in order],
        *[F.col(c) for c in child_cols if c not in order],
    )
    nested = children.groupBy(F.col(child_key).alias(parent_key)).agg(
        F.array_sort(F.collect_list(sort_struct)).alias("__sorted")
    )
    rebuilt = F.transform(
        "__sorted",
        lambda o: F.struct(*[o.getField(c).alias(c) for c in child_cols]),
    ).alias(path)
    nested = nested.select(parent_key, rebuilt)
    out = parents.join(nested, on=parent_key, how="left")
    return out.withColumn(
        path,
        F.coalesce(
            F.col(path),
            F.array().cast(out.schema[path].dataType),
        ),
    )


def nested_query(
    docs: DataFrame,
    path: str,
    predicate: Callable[[Column], Column],
    *,
    min_children: int = 1,
) -> DataFrame:
    """ES ``nested`` query: keep parents where at least
    ``min_children`` sub-objects under ``path`` satisfy ``predicate``
    — the conjunction evaluated WITHIN one sub-object.

    Adds ``n_nested_hits`` (how many sub-objects matched — what ES
    exposes via nested ``inner_hits`` total).  Pure array expressions
    (``F.filter`` + ``size``) inside the scan: no explode, no shuffle;
    a selective nested predicate therefore costs one narrow projection
    at any corpus size.
    """
    hits = F.size(F.filter(F.col(path), predicate))
    return docs.withColumn("n_nested_hits", hits).filter(
        F.col("n_nested_hits") >= F.lit(min_children)
    )


def cross_object_match(
    docs: DataFrame,
    path: str,
    predicates: Sequence[Callable[[Column], Column]],
) -> Column:
    """The contrast semantics: the flat/"object"-mapped match, where
    each conjunct may be satisfied by a DIFFERENT sub-object (this is
    what a dotted-path query against a non-nested mapping does, and
    the false-positive class the nested type exists to remove)."""
    out = F.lit(True)
    for p in predicates:
        out = out & F.exists(F.col(path), p)
    return out


def nested_terms_agg(
    docs: DataFrame,
    path: str,
    field: str,
    *,
    parent_id: str = "doc_id",
    where: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """ES ``nested`` aggregation + ``terms`` over a nested field, with
    the ``reverse_nested`` parent re-count inside each bucket.

    Returns one row per nested ``field`` value: ``doc_count`` counts
    NESTED OBJECTS (the nested-context doc count ES reports) and
    ``parent_count`` counts distinct PARENTS (the ``reverse_nested``
    bucket).  One explode + one hash aggregate — the explode IS a scan
    of the underlying child relation, so this costs the same as
    aggregating the flat child table; both counts come out of the one
    aggregate (no second pass for reverse_nested).
    """
    arr = F.filter(F.col(path), where) if where is not None else F.col(path)
    obj = docs.select(F.col(parent_id), F.explode(arr).alias("__o"))
    return (
        obj.groupBy(F.col(f"__o.{field}").alias(field))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct(parent_id).alias("parent_count"),
        )
    )
