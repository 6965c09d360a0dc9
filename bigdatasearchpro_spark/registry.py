"""Query registry: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame program (``QUERIES[name]``, callable
``(spark, sf_dir) -> DataFrame``) with a DuckDB-runnable ANSI-SQL oracle
(``ORACLES[name]``) over the same parquet fixtures. Names appearing in
``QUERIES`` but not ``ORACLES`` are non-SQL-expressible and get
rows-only checks (LSH, streaming, sinks).

Conventions (driver contract, ``__spark_entry__.py``):
- every computed column aliased identically on both sides;
- scores/float aggregates rounded so cross-engine double math is stable;
- every ORDER BY carries a deterministic tie-break (compare is
  order-insensitive but LIMIT is not).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatasearchpro_spark.operators import dedup, search, transform
from bigdatasearchpro_spark.sources.files import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.1/§2.2 — core ETL ring [REF]: scan, stringify, key-by, dedup/LWW, counts
# ---------------------------------------------------------------------------

@register("s1_full_scan", "SELECT * FROM lineitem")
def s1_full_scan(spark, sf_dir):
    """S1: full-table scan (`SELECT * FROM t`), ref BulkProcessImpl.java:96."""
    return load_table(spark, sf_dir, "lineitem")


_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]

@register(
    "p1_stringify_all",
    "SELECT "
    + ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in _LINEITEM_COLS)
    + " FROM lineitem",
)
def p1_stringify_all(spark, sf_dir):
    """P1: row->document projection — every column cast to string,
    ref BulkProcessImpl.java:112-117 (`rs.getString`)."""
    return transform.stringify_all(load_table(spark, sf_dir, "lineitem"))


@register(
    "p2_key_by_guid",
    """
    SELECT concat(l_orderkey, '-', l_linenumber) AS s_guid,
           l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    """,
)
def p2_key_by_guid(spark, sf_dir):
    """P2: document-id selection (ref BulkProcessImpl.java:124); synthetic
    composite GUID per FIXTURES.md §A."""
    li = load_table(spark, sf_dir, "lineitem")
    return transform.composite_key(li, "l_orderkey", "l_linenumber", out="s_guid").select(
        "s_guid", "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "p3_lowercase_names",
    "SELECT lower(n_name) AS name_lc, n_nationkey FROM nation",
)
def p3_lowercase_names(spark, sf_dir):
    """P3: identifier lowercasing (ref BulkProcessImpl.java:64)."""
    return load_table(spark, sf_dir, "nation").select(
        F.lower("n_name").alias("name_lc"), "n_nationkey"
    )


@register(
    "l1_dedup_last_write_wins",
    """
    WITH base AS (
      SELECT concat(l_orderkey, '-', l_linenumber) AS s_guid,
             l_orderkey, l_linenumber, l_quantity
      FROM lineitem
    ),
    u AS (
      SELECT * FROM base
      UNION ALL
      SELECT s_guid, l_orderkey, l_linenumber, l_quantity + 1000 AS l_quantity
      FROM base WHERE l_linenumber = 1
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY s_guid ORDER BY l_quantity DESC) AS rn
      FROM u
    )
    SELECT s_guid, l_orderkey, l_linenumber, l_quantity FROM r WHERE rn = 1
    """,
)
def l1_dedup_last_write_wins(spark, sf_dir):
    """L1 + sink LWW semantics (ref BulkProcessImpl.java:124: repeated
    `_id` -> last write wins). Duplicates synthesized deterministically,
    winner = highest l_quantity (the 'later' write)."""
    base = transform.composite_key(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", "l_linenumber", out="s_guid"
    ).select("s_guid", "l_orderkey", "l_linenumber", "l_quantity")
    dups = base.filter(F.col("l_linenumber") == 1).withColumn(
        "l_quantity", F.col("l_quantity") + 1000
    )
    return dedup.dedup_last_write_wins(
        base.unionByName(dups), "s_guid", ["l_quantity"], keep="last"
    )


@register(
    "l1_dedup_lww_nulls",
    """
    WITH base AS (
      SELECT concat(l_orderkey, '-', l_linenumber) AS s_guid, l_quantity
      FROM lineitem
    ),
    u AS (
      SELECT s_guid, l_quantity AS o1, CAST(NULL AS DOUBLE) AS o2,
             'x' AS payload
      FROM base
      UNION ALL
      SELECT s_guid, CAST(NULL AS DOUBLE) AS o1, l_quantity AS o2,
             'x' AS payload
      FROM base
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY s_guid
        ORDER BY o1 DESC NULLS LAST, o2 DESC NULLS LAST
      ) AS rn FROM u
    )
    SELECT s_guid, o1, o2, payload FROM r WHERE rn = 1
    """,
)
def l1_dedup_lww_nulls(spark, sf_dir):
    """L1 regression fixture: per key, two rows that differ ONLY in which
    order column is null — the exact null-shift class that collided under
    a null-skipping fingerprint (xxhash64 skips null inputs), making LWW
    recover an arbitrary survivor. Nulls-lose semantics require the row
    with non-null o1 to win every key."""
    base = transform.composite_key(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", "l_linenumber", out="s_guid"
    ).select("s_guid", "l_quantity")
    null_d = F.lit(None).cast("double")
    r1 = base.select(
        "s_guid",
        F.col("l_quantity").alias("o1"),
        null_d.alias("o2"),
        F.lit("x").alias("payload"),
    )
    r2 = base.select(
        "s_guid",
        null_d.alias("o1"),
        F.col("l_quantity").alias("o2"),
        F.lit("x").alias("payload"),
    )
    return dedup.dedup_last_write_wins(
        r1.unionByName(r2), "s_guid", ["o1", "o2"], keep="last"
    )


@register(
    "l1_dedup_content_hash",
    """
    WITH h AS (SELECT doc_id, sha256(text) AS h FROM documents),
         w AS (SELECT h, min(doc_id) AS doc_id FROM h GROUP BY h)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN w ON d.doc_id = w.doc_id
    """,
)
def l1_dedup_content_hash(spark, sf_dir):
    """L1: exact content dedup by sha256(text), keep smallest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact_by_hash(docs, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register("a1_row_count", "SELECT count(*) AS n_rows FROM lineitem")
def a1_row_count(spark, sf_dir):
    """A1: load reconciliation count (ref BulkProcessImpl.java:139,
    README.md:804)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "a2_table_doc_counts",
    """
    SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'documents', count(*) FROM documents
    """,
)
def a2_table_doc_counts(spark, sf_dir):
    """A2: per-index doc count (declared-but-null in the reference,
    ElasticServiceImpl.java:133-136) — implemented for real here."""
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"), F.count("*").alias("n")
        )
        for t in ("lineitem", "orders", "customer", "documents")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# §2.2/§2.4 — filters, projection, aggregates [EXT]
# ---------------------------------------------------------------------------

@register(
    "p4_filter_predicates",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND o_orderstatus = 'O'
      AND o_totalprice > 50000.0
    """,
)
def p4_filter_predicates(spark, sf_dir):
    """P4: predicate filters (equality, range, conjunction) — pushed to
    the parquet scan by Catalyst."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
            & (F.col("o_orderstatus") == "O")
            & (F.col("o_totalprice") > 50000.0)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "p5_column_pruning",
    "SELECT p_partkey, p_brand FROM part",
)
def p5_column_pruning(spark, sf_dir):
    """P5: projection/column pruning (anti-evidence in ref: always
    SELECT *, BulkProcessImpl.java:96)."""
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")


@register(
    "a3_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(avg(l_quantity), 2)                                    AS avg_qty,
           round(avg(l_extendedprice), 2)                               AS avg_price,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a3_pricing_summary(spark, sf_dir):
    """A3: grouped aggregates — TPC-H Q1-shaped pricing summary (hash agg
    with map-side partial aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a4_count_distinct",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def a4_count_distinct(spark, sf_dir):
    """A4: exact distinct aggregation (approx variant is rows-only,
    see a4_approx_distinct)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register("a4_approx_distinct")  # rows-only: HLL++ estimate is engine-specific
def a4_approx_distinct(spark, sf_dir):
    """A4b: approx_count_distinct (HLL++) — estimate, so no SQL oracle;
    tests assert relative error vs exact."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


@register(
    "a5_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_rollup(spark, sf_dir):
    """A5: hierarchical rollup (subtotals + grand total)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "a5_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a5_cube(spark, sf_dir):
    """A5: full cube over two dimensions."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.3 — joins [EXT]
# ---------------------------------------------------------------------------

@register(
    "j1_join_revenue_by_nation",
    """
    SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue, count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_join_revenue_by_nation(spark, sf_dir):
    """J1: multi-way equi join (fact->dim->dim) + grouped agg. nation is
    tiny -> Catalyst broadcasts it; customer join is shuffle/broadcast
    per AQE stats."""
    orders, customer, nation = (
        load_table(spark, sf_dir, t) for t in ("orders", "customer", "nation")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "j2_semi_anti_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def j2_semi_anti_join(spark, sf_dir):
    """J2: anti join — customers with no high-value order (NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j3_range_join",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 100000.0),
             ('mid', 100000.0, 250000.0),
             ('high', 250000.0, 1000000000.0)
    )
    SELECT b.band, count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS sum_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def j3_range_join(spark, sf_dir):
    """J3: theta/range join against a tiny band dimension — broadcast
    nested-loop on purpose (dim is 3 rows; at scale the dim stays small
    so BNLJ-with-broadcast remains the right plan)."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 250000.0), ("high", 250000.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "j4_broadcast_join",
    """
    SELECT p.p_brand, count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j4_broadcast_join(spark, sf_dir):
    """J4: explicit broadcast of the small dim side — fact table never
    shuffles for the join (only for the final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# §2.5/§2.6 — windows, sort, top-k
# ---------------------------------------------------------------------------

@register(
    "w1_rank_topn_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w1_rank_topn_per_group(spark, sf_dir):
    """§2.5: ranking window — top-3 orders per customer, deterministic
    tie-break on orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_lag_lead",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_orderkey
    FROM orders
    """,
)
def w2_lag_lead(spark, sf_dir):
    """§2.5: analytic lag/lead over event order."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "w3_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def w3_running_sum(spark, sf_dir):
    """§2.5: aggregate-over-frame — per-customer running spend."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "t1_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def t1_topk_orders(spark, sf_dir):
    """T1: global top-k (Spark plans TakeOrderedAndProject — no full
    sort, per-partition heaps + driver merge)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "t2_global_sort",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    """,
)
def t2_global_sort(spark, sf_dir):
    """T2: global sort (range-partitioned exchange + per-partition sort)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------

@register(
    "set2_multiset_ops",
    """
    WITH a AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate < TIMESTAMP '1996-01-01'),
         b AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'intersect_all' AS bucket, o_custkey
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all', o_custkey
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
)
def set2_multiset_ops(spark, sf_dir):
    """§2.7: the MULTISET (bag) set-op variants — intersectAll keeps
    min(count_a, count_b) copies per key, exceptAll keeps
    count_a - count_b; the duplicate-preserving forms SQL's ALL
    keyword specifies (set1 covers the distinct forms)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    b = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return (
        a.intersectAll(b).select(F.lit("intersect_all").alias("bucket"), "o_custkey")
        .unionByName(
            a.exceptAll(b).select(F.lit("except_all").alias("bucket"), "o_custkey")
        )
    )


@register(
    "f6_null_handling_funcs",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_orderpriority IS NULL OR o_orderpriority = ''
                THEN 'none' ELSE 'some' END AS priority_flag,
           greatest(round(o_totalprice, 2), 100000.0) AS floor_price,
           least(round(o_totalprice, 2), 200000.0) AS capped_price,
           (o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL) AS complete_row
    FROM orders
    """,
)
def f6_null_handling_funcs(spark, sf_dir):
    """§2.8: null-handling scalar family — coalesce / nullif /
    greatest / least / null predicates (the dirty-data guards every
    stringified-document pipeline leans on; all codegen'd)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(
            F.col("o_orderpriority").isNull() | (F.col("o_orderpriority") == ""),
            "none",
        ).otherwise("some").alias("priority_flag"),
        F.greatest(F.round("o_totalprice", 2), F.lit(100000.0)).alias("floor_price"),
        F.least(F.round("o_totalprice", 2), F.lit(200000.0)).alias("capped_price"),
        (F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()).alias(
            "complete_row"
        ),
    )


@register(
    "set1_union_intersect_except",
    """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate < TIMESTAMP '1996-01-01'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'only_1995', o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    """,
)
def set1_union_intersect_except(spark, sf_dir):
    """§2.7: intersect + except + union in one deterministic result."""
    orders = load_table(spark, sf_dir, "orders")
    a = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
        )
        .select("o_custkey")
        .distinct()
    )
    b = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_custkey")
        .distinct()
    )
    both = a.intersect(b).select(F.lit("both").alias("bucket"), "o_custkey")
    only = a.exceptAll(b).select(F.lit("only_1995").alias("bucket"), "o_custkey")
    return both.unionByName(only)


# Part 2 (search ring, scalar functions, LLM-pipeline ops, streaming
# batch-equivalents) registers itself on import.
from bigdatasearchpro_spark import registry_text  # noqa: E402,F401
