"""Parent-child queries: the ES ``join`` field surface
(``has_child`` / ``has_parent``), re-homed as relational joins.

The reference's documents are flat MySQL rows bulk-indexed 1:1
(BulkProcessImpl.java:110-117), but the ES 6.x endpoint its UI
delegates to (indexView.html:13-19) serves ``has_child`` /
``has_parent`` for indices that declare a ``join`` field — the
standard way ES models the parent/child relations a relational source
like the reference's MySQL schema natively has (orders → lineitems).

Spark-first shape — ES executes these with a doc-values join inside
one shard (parents and children are co-routed); the engine equivalent:

- ``has_child``: filter the CHILD table (predicate pushes to its
  scan), ONE hash aggregate per parent key (count + the score
  combine, partial/map-side combinable), then join the parent table
  on its key.  With ``score_mode="none"`` the aggregate collapses to
  a LeftSemi join — no agg at all.  The aggregate side has at most
  one row per matched parent, so AQE broadcasts it when the child
  predicate is selective; at 100 TB both sides shuffle on the SAME
  key, the co-partitioning ES forces by routing.
- ``has_parent``: filter the PARENT table, project ``(key [,score])``,
  join into the child table — LeftSemi when ``score=False``, inner
  propagation otherwise.  A selective parent predicate makes the
  projected side broadcast-sized regardless of corpus size (dims
  broadcast; the child fact never re-shuffles).

Score arithmetic stays exact (sums/min/max of exact doubles; ``avg``
is one final division) so the DuckDB oracle replays scores
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "sum", "min", "max", "avg")


def has_child(
    parents: DataFrame,
    children: DataFrame,
    on: str,
    child_pred: Column,
    *,
    child_on: str | None = None,
    score_col: str | None = None,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """ES ``has_child``: parent documents having between
    ``min_children`` and ``max_children`` children matching
    ``child_pred``; ``score_mode`` combines the children's
    ``score_col`` into a parent ``score`` (ES modes; ``none`` returns
    the bare parents via a LeftSemi join and adds no columns).

    Non-``none`` modes return the parents plus ``n_children`` and
    ``score``.
    """
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if score_mode != "none" and score_col is None:
        raise ValueError("score_col is required when score_mode != 'none'")
    key = child_on or on
    matched = children.filter(child_pred)

    if score_mode == "none" and min_children <= 1 and max_children is None:
        # pure existence — no aggregate, one LeftSemi join
        return parents.join(matched, parents[on] == matched[key], "left_semi")

    aggs = [F.count(F.lit(1)).alias("n_children")]
    if score_mode == "sum":
        aggs.append(F.sum(score_col).alias("score"))
    elif score_mode == "min":
        aggs.append(F.min(score_col).alias("score"))
    elif score_mode == "max":
        aggs.append(F.max(score_col).alias("score"))
    elif score_mode == "avg":
        # exact sum, ONE final division (bit-stable in any IEEE engine)
        aggs.append(
            (F.sum(score_col) / F.count(F.lit(1))).alias("score")
        )
    per_parent = matched.groupBy(F.col(key).alias("__ck")).agg(*aggs)
    per_parent = per_parent.filter(F.col("n_children") >= F.lit(min_children))
    if max_children is not None:
        per_parent = per_parent.filter(
            F.col("n_children") <= F.lit(max_children)
        )
    if score_mode == "none":
        return parents.join(
            per_parent, parents[on] == per_parent["__ck"], "left_semi"
        )
    joined = parents.join(per_parent, parents[on] == per_parent["__ck"])
    return joined.drop("__ck")


def has_parent(
    children: DataFrame,
    parents: DataFrame,
    on: str,
    parent_pred: Column,
    *,
    parent_on: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """ES ``has_parent``: child documents whose parent matches
    ``parent_pred``.  With ``score_col`` the parent's value is
    propagated to every child as ``score`` (the ES ``score: true``
    form — each child inherits its single parent's score verbatim, so
    no float combining happens at all); without it the join is a
    LeftSemi and adds no columns.
    """
    key = parent_on or on
    matched = parents.filter(parent_pred)
    if score_col is None:
        return children.join(
            matched, children[on] == matched[key], "left_semi"
        )
    side = matched.select(
        F.col(key).alias("__pk"), F.col(score_col).alias("score")
    )
    return children.join(side, children[on] == side["__pk"]).drop("__pk")


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    on: str,
    bucket_col: str,
    aggs: "list[Column]",
    *,
    child_on: str | None = None,
) -> DataFrame:
    """ES ``children`` aggregation (the `join`-field agg family):
    bucket the PARENTS (a terms agg on ``bucket_col``) and aggregate
    each bucket's CHILDREN.  One key join carrying only (key, bucket)
    from the parent side — broadcast-sized for dimension-like parents
    — then ONE hash aggregate on the bucket (map-side combinable).
    The ES `parent` agg is the same plan with the roles swapped."""
    key = child_on or on
    side = parents.select(F.col(on), F.col(bucket_col))
    joined = side.join(children, side[on] == children[key])
    return joined.groupBy(bucket_col).agg(*aggs)
