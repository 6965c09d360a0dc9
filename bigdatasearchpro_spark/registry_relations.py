"""Registry part 8 (round-7 fourth pass): relational ES surfaces —
parent-child (``join`` field) queries, the scripting DSL
(``script_score`` / runtime fields / ``scripted_metric``), the IP
ring (CIDR term query + ``ip_range`` agg), ``date_range`` with date
math, ``significant_text``, the ``wrapper`` query, and C4-style
duplicate-span removal for the LLM-curation ring.

The reference bulk-loads MySQL rows into ES and delegates every query
to it (BulkProcessImpl.java:96-137, indexView.html:13-19); these are
the remaining ES 6.x+ DSL families a user of that delegated surface
can reach, re-homed as native DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import parentchild, search
from bigdatasearchpro_spark.registry import register
from bigdatasearchpro_spark.sources.files import load_table


# ---------------------------------------------------------------------------
# Parent-child: the ES `join` field (has_child / has_parent)
# ---------------------------------------------------------------------------

@register(
    "l3_has_child",
    """
    SELECT o.o_orderkey, o.o_orderpriority, c.n_children, c.score
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             COUNT(*)::BIGINT AS n_children,
             SUM(l_quantity) AS score
      FROM lineitem
      WHERE l_quantity >= 48 AND l_returnflag = 'R'
      GROUP BY l_orderkey
      HAVING COUNT(*) >= 2
    ) c ON o.o_orderkey = c.l_orderkey
    ORDER BY o.o_orderkey
    """,
)
def l3_has_child(spark, sf_dir):
    """L3 [ES parity]: ``has_child`` query over the ES ``join`` field —
    parent orders having >= 2 lineitem children matching
    (quantity >= 48 AND returnflag 'R'), ``score_mode: sum`` over the
    children's quantity.  ONE hash aggregate on the child key (child
    predicate pushed to the child scan, partial combine map-side) then
    a key join to the parents — the relational re-homing of ES's
    shard-local doc-values join (parents/children are co-routed in ES;
    here both sides hash on the SAME key).  Quantities are integral
    doubles, so the sum is exact under any combine order
    (operators/parentchild.py has_child)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = parentchild.has_child(
        orders,
        li,
        "o_orderkey",
        (F.col("l_quantity") >= 48) & (F.col("l_returnflag") == "R"),
        child_on="l_orderkey",
        score_col="l_quantity",
        score_mode="sum",
        min_children=2,
    )
    return out.select(
        "o_orderkey", "o_orderpriority", "n_children", "score"
    ).orderBy("o_orderkey")


@register(
    "l3_has_parent",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice AS score
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def l3_has_parent(spark, sf_dir):
    """L3 [ES parity]: ``has_parent`` query — lineitem children whose
    parent order matches (priority '1-URGENT' AND totalprice >
    250000), with the parent's totalprice propagated as each child's
    ``score`` (the ES ``score: true`` form: one parent value copied
    verbatim, no float combining).  The filtered parent side projects
    to (key, score) — selective predicate => broadcast-sized dim; the
    child fact never re-shuffles (operators/parentchild.py
    has_parent)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = parentchild.has_parent(
        li,
        orders,
        "l_orderkey",
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 250000),
        parent_on="o_orderkey",
        score_col="o_totalprice",
    )
    return out.select("l_orderkey", "l_linenumber", "score").orderBy(
        "l_orderkey", "l_linenumber"
    )
