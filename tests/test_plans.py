"""Plan-shape gates: the physical plan properties that make the
registry queries scale (SURVEY.md §4 — what Catalyst must be doing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.plans import (
    has_broadcast_join,
    has_take_ordered,
    pushed_filters,
    read_schema,
    shuffle_count,
)
from bigdatasearchpro_spark.registry import QUERIES
from bigdatasearchpro_spark.sources.files import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["p4_filter_predicates"](spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderstatus" in pushed and "o_totalprice" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = QUERIES["p5_column_pruning"](spark, sf_dir)
    schemas = read_schema(df)
    assert schemas and all("p_name" not in s for s in schemas)
    assert any("p_partkey" in s and "p_brand" in s for s in schemas)


def test_agg_prunes_unused_lineitem_columns(spark, sf_dir):
    df = QUERIES["a3_pricing_summary"](spark, sf_dir)
    schemas = " ".join(read_schema(df))
    assert "l_comment" not in schemas and "l_partkey" not in schemas


def test_small_dims_broadcast(spark, sf_dir):
    assert has_broadcast_join(QUERIES["j1_join_revenue_by_nation"](spark, sf_dir))
    assert has_broadcast_join(QUERIES["j4_broadcast_join"](spark, sf_dir))
    assert has_broadcast_join(QUERIES["j3_range_join"](spark, sf_dir))


def test_topk_avoids_global_sort(spark, sf_dir):
    assert has_take_ordered(QUERIES["t1_topk_orders"](spark, sf_dir))
    # cosine top-k: one narrow scan + TakeOrdered, zero shuffles
    df = QUERIES["l4_cosine_topk"](spark, sf_dir)
    assert has_take_ordered(df)
    assert shuffle_count(df) == 0


def test_stringify_is_shuffle_free(spark, sf_dir):
    assert shuffle_count(QUERIES["p1_stringify_all"](spark, sf_dir)) == 0


def test_grouped_agg_single_shuffle(spark, sf_dir):
    """Partial (map-side) agg + one exchange + final agg — not two."""
    assert shuffle_count(QUERIES["a3_pricing_summary"](spark, sf_dir)) == 1


def test_broadcast_join_fact_side_never_shuffles_for_join(spark, sf_dir):
    """j4: the only exchange allowed is the final groupBy('p_brand');
    the lineitem->part join itself must be exchange-free."""
    assert shuffle_count(QUERIES["j4_broadcast_join"](spark, sf_dir)) == 1
