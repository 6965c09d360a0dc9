"""Registry part 4: the ES aggregations surface (``operators/aggs.py``),
search_after keyset pagination, and correlated-subquery relational
shapes (TPC-H Q4/Q17/Q22 forms). Imported by ``registry_ext`` so it
joins the same ``QUERIES``/``ORACLES`` maps.

Every entry mirrors the public ES 6.x search request shape the
reference delegates to (``indexView.html:13-19`` posts to ``_search``;
``README.md:803-806`` reconciles its counts in Kibana, i.e. through
exactly these aggregations): a query/filter context narrows the index,
an ``aggs`` block summarizes the matched set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import aggs, search, suggest
from bigdatasearchpro_spark.registry import register
from bigdatasearchpro_spark.sources.files import load_table

# Query context shared by the document-side agg entries: the matched
# set of the single-term query `spark` (ES filter context).
_MATCHED_CTE = """
m AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id IN (
    SELECT doc_id FROM (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      FROM documents
    ) WHERE term = 'spark'
  )
)
"""


def _matched_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return search.keyword_match(docs, "spark", mode="any")


@register(
    "l3_agg_terms",
    f"""
    WITH {_MATCHED_CTE}
    SELECT lang AS key, count(*) AS doc_count,
           round(avg(n_chars), 4) AS avg_chars,
           max(n_chars) AS max_chars
    FROM m GROUP BY lang
    ORDER BY doc_count DESC, key ASC
    LIMIT 3
    """,
)
def l3_agg_terms(spark, sf_dir):
    """L3 [ES parity]: ``terms`` aggregation with sub-metrics — the
    query `spark` narrows the index, buckets are the top-3 ``lang``
    values by doc_count (ES ``_count`` desc, ``_key`` asc tie-break),
    each carrying avg/max sub-aggregations from the SAME single pass.
    One hash-agg shuffle on the bucket key + a TakeOrdered of size."""
    m = _matched_docs(spark, sf_dir)
    return aggs.terms_agg(
        m,
        "lang",
        size=3,
        metrics={
            "avg_chars": F.round(F.avg("n_chars"), 4),
            "max_chars": F.max("n_chars"),
        },
    )


@register(
    "l3_agg_date_histogram",
    """
    WITH m AS (SELECT * FROM events WHERE event_type = 'click'),
    g AS (
      SELECT date_trunc('hour', ts) AS key, count(*) AS doc_count,
             round(sum(value), 2) AS sum_value
      FROM m GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(key) FROM g),
                                    (SELECT max(key) FROM g),
                                    INTERVAL 1 HOUR)) AS key
    )
    SELECT grid.key, coalesce(g.doc_count, 0) AS doc_count, g.sum_value
    FROM grid LEFT JOIN g ON grid.key = g.key
    """,
)
def l3_agg_date_histogram(spark, sf_dir):
    """L3 [ES parity]: ``date_histogram`` with the ES-default
    ``min_doc_count: 0`` — hourly buckets of `click` events between the
    first and last populated hour, EMPTY HOURS INCLUDED (doc_count 0,
    null metrics). The dense grid is ``sequence()`` over the aggregated
    bounds — built from bucket rows, never the corpus, never on the
    driver. Filter context pushes to the scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return aggs.date_histogram_agg(
        ev, "ts", "hour",
        metrics={"sum_value": F.round(F.sum("value"), 2)},
        min_doc_count=0,
    )


@register(
    "l3_agg_histogram",
    f"""
    WITH {_MATCHED_CTE},
    g AS (
      SELECT CAST(floor(n_chars / 50.0) * 50 AS BIGINT) AS key,
             count(*) AS doc_count
      FROM m GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(key) FROM g),
                                    (SELECT max(key) FROM g), 50)) AS key
    )
    SELECT grid.key, coalesce(g.doc_count, 0) AS doc_count
    FROM grid LEFT JOIN g ON grid.key = g.key
    """,
)
def l3_agg_histogram(spark, sf_dir):
    """L3 [ES parity]: numeric ``histogram`` over the matched set —
    interval-50 buckets of ``n_chars``, densified between the first and
    last populated bucket (ES ``min_doc_count: 0`` default)."""
    return aggs.histogram_agg(_matched_docs(spark, sf_dir), "n_chars", 50)


@register(
    "l3_agg_range_filters",
    f"""
    WITH {_MATCHED_CTE}
    SELECT 'short' AS key, count(*) FILTER (WHERE n_chars < 150) AS doc_count FROM m
    UNION ALL
    SELECT 'medium', count(*) FILTER (WHERE n_chars >= 150 AND n_chars < 300) FROM m
    UNION ALL
    SELECT 'long', count(*) FILTER (WHERE n_chars >= 300) FROM m
    UNION ALL
    SELECT 'f_en', count(*) FILTER (WHERE lang = 'en') FROM m
    UNION ALL
    SELECT 'f_src1x', count(*) FILTER (WHERE source LIKE 'src1%') FROM m
    """,
)
def l3_agg_range_filters(spark, sf_dir):
    """L3 [ES parity]: ``range`` + ``filters`` aggregations — explicit
    ``[from, to)`` buckets over ``n_chars`` and two named predicate
    buckets, all in ONE pass: each bucket is a parallel conditional
    count in a single aggregate, the one result row unpivots to
    ``(key, doc_count)``. Buckets may overlap (why this is not a
    group-by) and empty buckets still appear — both ES contracts."""
    m = _matched_docs(spark, sf_dir)
    ranged = aggs.range_agg(
        m, "n_chars",
        [("short", None, 150), ("medium", 150, 300), ("long", 300, None)],
    )
    filtered = aggs.filters_agg(
        m,
        {
            "f_en": F.col("lang") == "en",
            "f_src1x": F.col("source").startswith("src1"),
        },
    )
    return ranged.unionByName(filtered)


@register(
    "l3_agg_extended_stats",
    f"""
    WITH {_MATCHED_CTE}
    SELECT count(n_chars) AS count_v,
           round(min(n_chars)::DOUBLE, 4) AS min_v,
           round(max(n_chars)::DOUBLE, 4) AS max_v,
           round(avg(n_chars::DOUBLE), 4) AS avg_v,
           round(sum(n_chars::DOUBLE), 4) AS sum_v,
           round(var_pop(n_chars::DOUBLE), 4) AS variance_v,
           round(stddev_pop(n_chars::DOUBLE), 4) AS std_dev_v
    FROM m
    """,
)
def l3_agg_extended_stats(spark, sf_dir):
    """L3 [ES parity]: ``extended_stats`` — count/min/max/avg/sum plus
    POPULATION variance and stddev (the forms ES reports), one row,
    one pass, map-side partial aggregation."""
    return aggs.extended_stats_agg(_matched_docs(spark, sf_dir), "n_chars")


@register(
    "l3_agg_percentiles",
    f"""
    WITH {_MATCHED_CTE},
    q AS (
      SELECT round(quantile_cont(n_chars::DOUBLE, 0.25), 4) AS p25,
             round(quantile_cont(n_chars::DOUBLE, 0.50), 4) AS p50,
             round(quantile_cont(n_chars::DOUBLE, 0.75), 4) AS p75,
             round(quantile_cont(n_chars::DOUBLE, 0.95), 4) AS p95,
             round(quantile_cont(n_chars::DOUBLE, 0.99), 4) AS p99
      FROM m
    )
    SELECT 25.0::DOUBLE AS percent, p25 AS value FROM q
    UNION ALL SELECT 50.0::DOUBLE, p50 FROM q
    UNION ALL SELECT 75.0::DOUBLE, p75 FROM q
    UNION ALL SELECT 95.0::DOUBLE, p95 FROM q
    UNION ALL SELECT 99.0::DOUBLE, p99 FROM q
    """,
)
def l3_agg_percentiles(spark, sf_dir):
    """L3 [ES parity]: ``percentiles`` aggregation shape — one
    ``(percent, value)`` row per requested percent over the matched
    set. Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``), computed for ALL percents in one
    aggregate; ES itself answers this with t-digest, and this engine's
    approximate 100 TB path is the mergeable-sketch ring
    (``a9_kll_quantiles``)."""
    return aggs.percentiles_agg(_matched_docs(spark, sf_dir), "n_chars")


@register(
    "l3_agg_top_hits",
    f"""
    WITH {_MATCHED_CTE},
    r AS (
      SELECT lang AS key, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id ASC) AS hit_rank
      FROM m
    )
    SELECT key, hit_rank, doc_id, n_chars FROM r WHERE hit_rank <= 2
    """,
)
def l3_agg_top_hits(spark, sf_dir):
    """L3 [ES parity]: ``terms`` + ``top_hits`` sub-aggregation — each
    ``lang`` bucket carries its top-2 documents by ``n_chars`` desc
    (doc_id asc tie-break). Ranked with a window PARTITIONED by the
    bucket key: every bucket sorts only its own rows; no global sort,
    output is hits-per-bucket-sized."""
    m = _matched_docs(spark, sf_dir)
    return aggs.terms_top_hits(
        m, "lang", hits=2,
        sort=[F.desc("n_chars")],
        select=["doc_id", "n_chars"],
    ).select("key", "hit_rank", "doc_id", "n_chars")


def _bm25_page2_oracle() -> str:
    """Hits 11-20 of the flagship BM25 ranking: the search_after page
    is definitionally the next LIMIT page of the same total order, so
    the oracle is the flagship oracle with an OFFSET."""
    from bigdatasearchpro_spark.registry import ORACLES

    return ORACLES["l3_search_bm25_topk"].replace("LIMIT 10", "LIMIT 10 OFFSET 10")


@register("l3_search_after", _bm25_page2_oracle())
def l3_search_after(spark, sf_dir):
    """L3 [ES parity]: ``search_after`` keyset pagination — page 1 of
    the flagship BM25 query yields a cursor (last hit's
    ``(score, doc_id)``), and the second request returns the next 10
    hits strictly after it. Unlike ``from+size`` offset paging (which
    ES caps at 10k for exactly this reason), the heap stays k-sized at
    ANY depth: the keyset predicate drops earlier hits map-side on the
    scored projection, so page 1000 costs what page 1 costs. The oracle
    is the flagship BM25 oracle at OFFSET 10 — the keyset math must
    reproduce the offset page exactly, score ties included."""
    from bigdatasearchpro_spark.registry_text import SEARCH_QUERY

    docs = load_table(spark, sf_dir, "documents")
    page1 = search.search_topk(docs, SEARCH_QUERY, 10, scoring="bm25")
    cursor = page1.orderBy(F.desc("score"), F.asc("doc_id")).collect()[-1]
    return search.search_topk(
        docs, SEARCH_QUERY, 10, scoring="bm25",
        after=(cursor["score"], cursor["doc_id"]),
    )


# ---------------------------------------------------------------------------
# Correlated subqueries (TPC-H Q4/Q17/Q22 shapes) — declared in SQL so
# Catalyst's subquery decorrelation does the planning: EXISTS -> left
# semi join, NOT EXISTS -> left anti join, the correlated scalar ->
# aggregate-then-join. The fixture schema is trimmed TPC-H, so each
# query keeps the reference shape with the available columns.
# ---------------------------------------------------------------------------


def _views(spark, sf_dir, *tables) -> dict[str, str]:
    """Per-call unique temp views (safe under concurrent sessions)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    names = {}
    for t in tables:
        names[t] = f"sq_{t}_{sfx}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(names[t])
    return names


def _run_sql(spark, names: dict[str, str], sql: str):
    try:
        out = spark.sql(sql.format(**names))
        rows, schema = out.collect(), out.schema
    finally:
        for v in names.values():
            spark.catalog.dropTempView(v)
    return spark.createDataFrame(rows, schema)


@register(
    "q4_exists_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= '1996-07-01' AND o.o_orderdate < '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_exists_order_priority(spark, sf_dir):
    """Relational: correlated EXISTS (TPC-H Q4 shape) — orders in a
    quarter having at least one returned lineitem, counted by priority.
    Declared as SQL EXISTS; Catalyst decorrelates to ONE left-semi
    join on l_orderkey (the probe side aggregates after the semi join,
    so each order crosses the shuffle once no matter how many
    lineitems match). Date filter pushes to the orders scan."""
    v = _views(spark, sf_dir, "orders", "lineitem")
    return _run_sql(spark, v, """
        SELECT o_orderpriority, count(*) AS order_count
        FROM {orders} o
        WHERE o.o_orderdate >= '1996-07-01' AND o.o_orderdate < '1996-10-01'
          AND EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@register(
    "q17_scalar_correlated",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_scalar_correlated(spark, sf_dir):
    """Relational: correlated SCALAR subquery (TPC-H Q17 shape) —
    small-quantity order revenue for one brand against each part's own
    average quantity. Catalyst decorrelates the per-part avg into one
    hash aggregate over lineitem joined back by partkey — the
    subquery runs ONCE as an aggregation, not per row. The brand
    filter broadcasts part."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return _run_sql(spark, v, """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM {lineitem} l2 WHERE l2.l_partkey = p.p_partkey)
    """)


@register(
    "q22_anti_global_scalar",
    """
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= '1995-01-01'
                      AND o.o_orderdate < '1996-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_anti_global_scalar(spark, sf_dir):
    """Relational: NOT EXISTS + uncorrelated scalar subquery (TPC-H
    Q22 shape) — well-funded customers with no 1995 order, by nation
    (the fixture has no order-less customers, so the anti join
    correlates on key AND a pushed date predicate).
    The global average computes once (scalar subquery -> one-row
    broadcast into the filter); the NOT EXISTS decorrelates to a left
    ANTI join on o_custkey. Customers cross the shuffle once; orders
    contribute only their distinct custkeys."""
    v = _views(spark, sf_dir, "customer", "orders")
    return _run_sql(spark, v, """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM {customer} c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM {customer} c2
                             WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM {orders} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= '1995-01-01'
                            AND o.o_orderdate < '1996-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """)


@register(
    "l3_agg_significant_terms",
    f"""
    WITH {_MATCHED_CTE},
    fg AS (
      SELECT term AS key, count(*) AS doc_count
      FROM (SELECT doc_id, unnest(list_distinct(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> ''))) AS term
            FROM m)
      GROUP BY term
    ),
    bg AS (
      SELECT term AS key, count(*) AS bg_count
      FROM (SELECT doc_id, unnest(list_distinct(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> ''))) AS term
            FROM documents)
      GROUP BY term
    ),
    sz AS (SELECT (SELECT count(*) FROM m)::DOUBLE AS n_fg,
                  (SELECT count(*) FROM documents)::DOUBLE AS n_bg),
    sc AS (
      SELECT fg.key, fg.doc_count, bg.bg_count,
             round((fg.doc_count / sz.n_fg - bg.bg_count / sz.n_bg)
                   * ((fg.doc_count / sz.n_fg) / (bg.bg_count / sz.n_bg)),
                   6) AS score
      FROM fg JOIN bg ON fg.key = bg.key CROSS JOIN sz
      WHERE fg.doc_count >= 3
    )
    SELECT key, doc_count, bg_count, score FROM sc
    WHERE score > 0
    ORDER BY score DESC, key ASC
    LIMIT 10
    """,
)
def l3_agg_significant_terms(spark, sf_dir):
    """L3 [ES parity]: ``significant_terms`` aggregation — the terms
    unusually frequent in the `spark`-matched set relative to the whole
    index, JLH-scored (the ES default heuristic: absolute lift x
    relative lift of per-doc frequencies). Two (term, doc_count) hash
    aggs — the foreground one over the matched set only — joined on
    term, TakeOrdered size; the explode carries distinct (id, term)
    pairs, never text (operators/aggs.py significant_terms_agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.significant_terms_agg(
        _matched_docs(spark, sf_dir), docs, size=10, min_doc_count=3
    )


@register(
    "l3_agg_composite",
    f"""
    WITH {_MATCHED_CTE},
    b AS (
      SELECT lang, source, count(*) AS doc_count,
             round(avg(n_chars), 4) AS avg_chars
      FROM m GROUP BY lang, source
    )
    SELECT lang, source, doc_count, avg_chars
    FROM b ORDER BY lang ASC, source ASC
    LIMIT 5 OFFSET 5
    """,
)
def l3_agg_composite(spark, sf_dir):
    """L3 [ES parity]: ``composite`` aggregation — (lang, source)
    multi-source buckets in bucket-key order with ``after``-key
    pagination: page 1's last key becomes the cursor, and THIS entry
    returns page 2, which must equal the key-ordered bucket list at
    OFFSET page-size (the oracle). The after-key predicate applies to
    the raw rows MAP-SIDE (a row's bucket key is its column tuple), so
    rows of already-returned buckets never enter the shuffle — the
    reason composite paging scales where a giant ``terms`` size
    cannot (operators/aggs.py composite_agg)."""
    m = _matched_docs(spark, sf_dir)
    metrics = {"avg_chars": F.round(F.avg("n_chars"), 4)}
    page1 = aggs.composite_agg(
        m, ["lang", "source"], size=5, metrics=metrics
    ).collect()
    cursor = (page1[-1]["lang"], page1[-1]["source"])
    return aggs.composite_agg(
        m, ["lang", "source"], size=5, after=cursor, metrics=metrics
    )


# ---------------------------------------------------------------------------
# ES query-DSL extensions: more_like_this, rescore, suggesters —
# the remaining public _search surfaces reachable from the reference's
# delegated search box (indexView.html:13-19).
# ---------------------------------------------------------------------------

_NE_TOKS_CTE = """
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
)
"""

_VOCAB_CTE = """
vocab AS (
  SELECT term, count(*) AS doc_freq
  FROM (SELECT doc_id, unnest(list_distinct(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> ''))) AS term
        FROM documents)
  GROUP BY term
)
"""


@register(
    "l3_more_like_this",
    f"""
    WITH {_NE_TOKS_CTE},
    seed AS (
      SELECT term, count(*) AS tf FROM toks WHERE doc_id = 0
      GROUP BY term HAVING count(*) >= 2
    ),
    nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
    dfs0 AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks
      WHERE term IN (SELECT term FROM seed) GROUP BY term
    ),
    sel AS (
      SELECT s.term, round(s.tf * ln(nn.n / d.df), 6) AS tfidf
      FROM seed s JOIN dfs0 d ON s.term = d.term CROSS JOIN nn
      WHERE d.df >= 5
      ORDER BY tfidf DESC, s.term ASC LIMIT 5
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
    ),
    dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    dl AS (
      SELECT d.doc_id, coalesce(c.cnt, 0)::DOUBLE AS dl
      FROM documents d
      LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM toks GROUP BY doc_id) c
        ON d.doc_id = c.doc_id
    ),
    avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
    sc AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (nn.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))
             ), 4) AS score
      FROM tf
      CROSS JOIN nn CROSS JOIN avgdl
      JOIN dfs ON tf.term = dfs.term
      JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM sc WHERE doc_id <> 0
    ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def l3_more_like_this(spark, sf_dir):
    """L3 [ES parity]: ``more_like_this`` — documents most similar to
    seed doc 0: the seed's interesting terms (tf >= 2 in the seed,
    df >= 5 in the index, ranked by classic tf-idf, top 5) run as a
    disjunctive BM25 query with the seed excluded from the hits. The
    oracle recomputes BOTH stages in SQL — term selection included —
    so the whole pipeline is hash-verified, not just the final search
    (operators/search.py more_like_this)."""
    docs = load_table(spark, sf_dir, "documents")
    return search.more_like_this(
        docs, 0, k=10, max_query_terms=5, min_term_freq=2, min_doc_freq=5
    )


@register(
    "l3_rescore_topk",
    f"""
    WITH {_NE_TOKS_CTE},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term
    ),
    dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
    dl AS (
      SELECT d.doc_id, coalesce(c.cnt, 0)::DOUBLE AS dl
      FROM documents d
      LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM toks GROUP BY doc_id) c
        ON d.doc_id = c.doc_id
    ),
    avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
    sc AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (nn.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))
             ), 4) AS score
      FROM tf
      CROSS JOIN nn CROSS JOIN avgdl
      JOIN dfs ON tf.term = dfs.term
      JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
    ),
    win AS (SELECT doc_id, score FROM sc
            ORDER BY score DESC, doc_id ASC LIMIT 50),
    ph AS (
      SELECT doc_id,
             CASE WHEN ' ' || array_to_string(list_filter(
                      string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> ''), ' ') || ' ' LIKE '% spark join %'
                  THEN 1.0 ELSE 0.0 END AS bonus
      FROM documents
    )
    SELECT w.doc_id, round(1.0 * w.score + 2.0 * ph.bonus, 4) AS score
    FROM win w JOIN ph ON w.doc_id = ph.doc_id
    ORDER BY score DESC, w.doc_id ASC LIMIT 10
    """,
)
def l3_rescore_topk(spark, sf_dir):
    """L3 [ES parity]: ``rescore`` — the flagship BM25 query's top-50
    window re-ranked by a constant-score ``match_phrase`` secondary
    query (``"spark join"``, weight 2): cheap disjunctive recall pass,
    exact-phrase precision bonus evaluated on the 50-row window only
    (broadcast back onto the corpus; the re-sort is a window-sized
    TakeOrdered). total = 1.0 * bm25 + 2.0 * [phrase]
    (operators/search.py rescore_topk)."""
    from bigdatasearchpro_spark.registry_text import SEARCH_QUERY

    docs = load_table(spark, sf_dir, "documents")
    return search.rescore_topk(
        docs, SEARCH_QUERY, "spark join",
        window_size=50, k=10, query_weight=1.0, rescore_weight=2.0,
    )


@register(
    "l3_suggest_term",
    f"""
    WITH {_VOCAB_CTE}
    SELECT term AS suggestion, levenshtein(term, 'par')::BIGINT AS distance,
           doc_freq
    FROM vocab
    WHERE levenshtein(term, 'par') BETWEEN 1 AND 2
    ORDER BY distance ASC, doc_freq DESC, suggestion ASC
    LIMIT 5
    """,
)
def l3_suggest_term(spark, sf_dir):
    """L3 [ES parity]: ``term`` suggester — spell corrections for the
    misspelling `par`: vocabulary terms within 2 edits (the input
    itself excluded), ranked distance asc, doc_freq desc, term asc
    (ES sort), top 5. Vocabulary-scale: one (term, doc_freq) hash agg
    over exploded distinct per-doc terms, then a bounded-levenshtein
    scan of |vocab| rows (operators/suggest.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return suggest.term_suggester(docs, "par", size=5, max_edits=2)


@register(
    "l3_suggest_completion",
    f"""
    WITH {_VOCAB_CTE}
    SELECT term AS suggestion, doc_freq
    FROM vocab WHERE term LIKE 's%'
    ORDER BY doc_freq DESC, suggestion ASC
    LIMIT 5
    """,
)
def l3_suggest_completion(spark, sf_dir):
    """L3 [ES parity]: ``completion`` suggester shape — vocabulary
    terms completing the prefix `s`, ranked by weight (document
    frequency) desc, term asc, top 5. ES serves this from an
    index-time FST; the engine's materialized form is the sorted
    vocabulary table (prefix runs range-skip)
    (operators/suggest.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return suggest.completion_suggester(docs, "s", size=5)


@register(
    "l3_suggest_phrase",
    f"""
    WITH {_VOCAB_CTE},
    inp AS (SELECT * FROM (VALUES (0, 'sprak'), (1, 'joni'), (2, 'window'))
            AS t(pos, tok)),
    corr AS (
      SELECT pos, term, levenshtein(term, tok)::BIGINT AS dist, doc_freq,
             row_number() OVER (PARTITION BY pos
               ORDER BY levenshtein(term, tok) ASC, doc_freq DESC, term ASC)
               AS rn
      FROM vocab CROSS JOIN inp
      WHERE levenshtein(term, tok) BETWEEN 1 AND 2
    ),
    opts AS (
      SELECT pos, term, dist, doc_freq, 1 AS edited FROM corr WHERE rn <= 3
      UNION ALL
      SELECT i.pos, i.tok, 0::BIGINT, coalesce(v.doc_freq, 0), 0
      FROM inp i LEFT JOIN vocab v ON v.term = i.tok
    ),
    phr AS (
      SELECT o0.term || ' ' || o1.term || ' ' || o2.term AS suggestion,
             o0.dist + o1.dist + o2.dist AS sum_dist,
             o0.doc_freq + o1.doc_freq + o2.doc_freq AS sum_freq,
             o0.term AS t0, o1.term AS t1, o2.term AS t2
      FROM (SELECT * FROM opts WHERE pos = 0) o0,
           (SELECT * FROM opts WHERE pos = 1) o1,
           (SELECT * FROM opts WHERE pos = 2) o2
      WHERE (o0.edited + o1.edited + o2.edited) BETWEEN 1 AND 2
    ),
    tk AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    bi AS (
      SELECT toks[i] AS a, toks[i+1] AS b, count(*) AS n2
      FROM tk, LATERAL (
        SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
      )
      GROUP BY a, b
    ),
    sc AS (
      SELECT p.suggestion,
             ((CASE WHEN b01.n2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN b12.n2 IS NULL THEN 0 ELSE 1 END))::BIGINT AS hits,
             (coalesce(b01.n2, 0) + coalesce(b12.n2, 0))::BIGINT
               AS bigram_sum,
             p.sum_freq, p.sum_dist
      FROM phr p
      LEFT JOIN bi b01 ON b01.a = p.t0 AND b01.b = p.t1
      LEFT JOIN bi b12 ON b12.a = p.t1 AND b12.b = p.t2
    )
    SELECT suggestion, hits, bigram_sum
    FROM sc
    ORDER BY hits DESC, bigram_sum DESC, sum_freq DESC, sum_dist ASC,
             suggestion ASC
    LIMIT 5
    """,
)
def l3_suggest_phrase(spark, sf_dir):
    """L3 [ES parity]: ``phrase`` suggester (did-you-mean) — the last
    ES 6.x suggester: per-token candidate corrections (vocabulary
    terms within 2 edits, top 3 per position) combined into candidate
    phrases (1..2 tokens changed) and reranked by the corpus's own
    bigram LM on an exact integer grid (observed-bigram hits, then
    total bigram count, then doc_freq, then edit distance) — for the
    misspelling "sprak joni window" the corpus evidence must surface
    "spark join window" (operators/suggest.py phrase_suggester)."""
    docs = load_table(spark, sf_dir, "documents")
    return suggest.phrase_suggester(
        docs, "sprak joni window", size=5, max_edits=2, per_token=3,
        max_errors=2,
    )


@register(
    "l3_scroll_export",
    """
    WITH m AS (
      SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
      WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x = 'spark')) > 0
    )
    SELECT doc_id, lang FROM m ORDER BY doc_id ASC
    LIMIT 40 OFFSET 80
    """,
)
def l3_scroll_export(spark, sf_dir):
    """L3 [ES parity]: ``scroll`` — full-export iteration of a query's
    hits in stable ``_doc`` order, batch by batch. This entry walks
    three 40-row pages with the keyset cursor and returns page 3,
    which must equal the match set at OFFSET 80 (the oracle; the bulk
    index stringifies all fields, so ``_doc`` order is the id's STRING
    order — both engines compare lexicographically). Unlike
    offset paging, the cursor predicate (``id > last``) pushes to the
    scan and each page is a TakeOrdered of the page size — page N
    costs page 1, nothing re-reads scrolled rows (api.scroll)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    idx = f"scroll_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, docs.select("doc_id", "text", "lang"), idx,
                           id_col="doc_id")
    try:
        cursor, page = None, None
        for _ in range(3):
            page, cursor = api.scroll(
                spark, idx, "spark", size=40, scroll_id=cursor,
                text_col="text",
            )
            if cursor is None:
                break
        rows = page.select("doc_id", "lang").collect()
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "s10_reindex",
    """
    SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
    WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x = 'spark')) > 0
    """,
)
def s10_reindex(spark, sf_dir):
    """S10 [ES parity]: ``_reindex`` — copy a query-narrowed index into
    a new index (ES: internal scroll + bulk loop; here ONE distributed
    scan -> query-string filter -> bulk write, no coordinator
    bottleneck). The oracle is the matched source set: the destination
    index must hold exactly the documents matching the query
    (api.reindex)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    src, dst = f"reindex_src_{tag}", f"reindex_dst_{tag}"
    api.bulk_data_to_index(spark, docs.select("doc_id", "text", "lang"), src,
                           id_col="doc_id")
    try:
        res = api.reindex(spark, src, dst, "spark", text_col="text")
        assert res["created"] == spark.table(dst).count()
        rows = spark.table(dst).select("doc_id", "lang").collect()
    finally:
        api.delete_index(spark, src)
        api.delete_index(spark, dst)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "s11_alias_scroll",
    """
    SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
    WHERE lang = 'en'
      AND len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x = 'spark')) > 0
    ORDER BY doc_id::VARCHAR ASC
    LIMIT 50
    """,
)
def s11_alias_scroll(spark, sf_dir):
    """S11 [ES parity]: index ALIASES (`POST _aliases` / `GET _alias`)
    — a FILTERED alias (lang = 'en') over a bulk-loaded index, read
    through the scroll API: the first 50 hits of the query `spark` in
    _doc order must equal the filtered matched set at LIMIT (oracle).
    The alias is a marked catalog view, so its filter pushes into the
    underlying index scan — a filtered alias costs a predicate, not a
    copy (sinks/ddl.py add_alias, api.scroll)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    idx, alias = f"alias_base_{tag}", f"alias_en_{tag}"
    api.bulk_data_to_index(spark, docs.select("doc_id", "text", "lang"), idx,
                           id_col="doc_id")
    try:
        api.add_alias(spark, idx, alias, filter_sql="lang = 'en'")
        assert (alias, idx) in api.get_alias(spark)
        page, _ = api.scroll(spark, alias, "spark", size=50, text_col="text")
        rows = page.select("doc_id", "lang").collect()
    finally:
        api.delete_alias(spark, alias)
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1997-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Relational: TPC-H Q7 shape — cross-nation trade volume by year.
    A 6-way join where BOTH nation legs broadcast (25 rows each) and
    supplier broadcasts too, so the only shuffles are lineitem-orders
    -customer equi-joins plus ONE aggregation exchange on the (nation,
    nation, year) key. The shipdate range filter pushes to the lineitem
    scan. Year extraction stays JVM-side (`year()`). Revenue
    accumulates in DECIMAL(18,4): double summation is order-dependent
    at the last cent across partitionings/engines; decimal is exact
    and order-independent (the deterministic-aggregation pattern for
    money at any scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """Relational: TPC-H Q18 shape — customers with very large orders.
    The IN-subquery (orders whose lineitems sum past a quantity
    threshold) is ONE aggregation over lineitem followed by a LEFT SEMI
    join — the aggregated key set, not lineitem, crosses into the probe;
    then the usual orders-customer join re-aggregates only the
    surviving orders. Top-100 is a TakeOrdered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150).select("l_orderkey")
    )
    surv = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    j = c.join(surv, F.col("o_custkey") == c.c_custkey).join(
        li, F.col("o_orderkey") == li.l_orderkey
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "st9_stream_static_join",
    """
    SELECT date_trunc('hour', e.ts) AS win_start, c.c_mktsegment AS segment,
           round(sum(e.value), 2) AS sum_value, count(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def st9_stream_static_join(spark, sf_dir):
    """§2.9: stream-static join + windowed aggregation — the canonical
    streaming-enrichment pipeline (micro-batches of the event stream
    join a static user->segment dimension, then aggregate revenue per
    hour window x segment). Run here as the batch-equivalent program;
    tests/test_streaming.py runs the REAL stream and proves
    stream == batch. The join is STATELESS in Structured Streaming
    (dim broadcasts; only the windowed agg keeps state,
    watermark-bounded) — streaming/pipelines.py
    stream_static_enriched_agg."""
    from bigdatasearchpro_spark.streaming.pipelines import (
        stream_static_enriched_agg,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return stream_static_enriched_agg(e, dim)


@register(
    "l3_phrase_prefix_match",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id FROM t
    WHERE len(list_filter(generate_series(1, greatest(len(toks) - 1, 0)),
              i -> toks[i] = 'query' AND starts_with(toks[i+1], 's'))) > 0
    """,
)
def l3_phrase_prefix_match(spark, sf_dir):
    """L3 [ES parity]: ``match_phrase_prefix`` — search-as-you-type:
    the query `"query s"` matches documents containing `query`
    followed immediately by a token starting `s` (`spark`, `scan`,
    `sort`, ...) — the live-search-box behavior behind the reference's
    delegated search UI. One narrow array expression per row
    (position filter + prefix check), no explode, no shuffle
    (operators/search.py phrase_prefix_expr)."""
    docs = load_table(spark, sf_dir, "documents")
    return search.phrase_prefix_match(docs, "query s")


@register(
    "p7_quarantine_ingest",
    """
    WITH d AS (
      SELECT l_orderkey::VARCHAR ||
               CASE WHEN l_linenumber % 7 = 0 THEN 'x' ELSE '' END AS okey_raw,
             CAST(l_quantity AS INT)::VARCHAR ||
               CASE WHEN l_linenumber % 11 = 0 THEN 'y' ELSE '' END AS qty_raw,
             l_linenumber
      FROM lineitem
    )
    SELECT okey_raw, qty_raw, l_linenumber,
           concat_ws(',',
             CASE WHEN okey_raw IS NOT NULL
                   AND TRY_CAST(okey_raw AS BIGINT) IS NULL
                  THEN 'okey_raw' END,
             CASE WHEN qty_raw IS NOT NULL
                   AND TRY_CAST(qty_raw AS DOUBLE) IS NULL
                  THEN 'qty_raw' END) AS quarantine_reason
    FROM d
    WHERE (okey_raw IS NOT NULL AND TRY_CAST(okey_raw AS BIGINT) IS NULL)
       OR (qty_raw IS NOT NULL AND TRY_CAST(qty_raw AS DOUBLE) IS NULL)
    """,
)
def p7_quarantine_ingest(spark, sf_dir):
    """P7: dead-letter ingest — dirty rows split into (clean,
    quarantined) in ONE narrow projection, quarantine rows keeping the
    ORIGINAL values plus a reason naming the failing columns (so the
    dead-letter queue is replayable after a parser fix); never fail
    the batch for a bad row, never silently drop it — the production
    form of the reference's per-row log-and-continue loop
    (BulkProcessImpl.java:110-131). The fixture dirt is deterministic
    (every 7th/11th line number corrupted); this entry returns the
    quarantined side, hash-verified reasons included
    (operators/transform.py quarantine_ingest)."""
    from bigdatasearchpro_spark.operators.transform import quarantine_ingest

    li = load_table(spark, sf_dir, "lineitem")
    dirty = li.select(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.when(F.col("l_linenumber") % 7 == 0, F.lit("x")).otherwise(F.lit("")),
        ).alias("okey_raw"),
        F.concat(
            F.col("l_quantity").cast("int").cast("string"),
            F.when(F.col("l_linenumber") % 11 == 0, F.lit("y")).otherwise(F.lit("")),
        ).alias("qty_raw"),
        "l_linenumber",
    )
    _, quarantined = quarantine_ingest(
        dirty, {"okey_raw": "bigint", "qty_raw": "double"}
    )
    return quarantined


@register(
    "s12_force_merge",
    """
    SELECT n_nationkey::VARCHAR AS n_nationkey, n_name,
           n_regionkey::VARCHAR AS n_regionkey
    FROM nation
    """,
)
def s12_force_merge(spark, sf_dir):
    """S12 [ES parity]: ``_forcemerge`` — compact an index to
    ``max_num_segments`` storage files (the small-files maintenance
    job every streaming/bulk ingest needs at scale; ES recommends it
    from a maintenance window, same caveat documented on
    api.force_merge). The oracle is the INPUT: compaction must change
    layout and nothing else, so the merged index's content
    hash-verifies against the source table."""
    import uuid

    from bigdatasearchpro_spark import api

    nation = load_table(spark, sf_dir, "nation")
    idx = f"fm_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, nation.repartition(8), idx,
                           id_col="n_nationkey")
    try:
        res = api.force_merge(spark, idx, max_num_segments=1)
        n_files = (
            spark.table(idx).select(F.input_file_name()).distinct().count()
        )
        if n_files != 1:
            raise AssertionError(f"force_merge left {n_files} files")
        assert res["rows"] == nation.count()
        rows = spark.table(idx).collect()
        schema = spark.table(idx).schema
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, schema)


@register(
    "l3_msearch",
    """
    WITH t AS (
      SELECT doc_id::VARCHAR AS doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                 x -> x <> '') AS toks
      FROM documents
    ),
    q1 AS (
      SELECT doc_id, lang AS sort_lang, 'q1' AS query_id FROM t
      WHERE list_contains(toks, 'spark')
      ORDER BY lang ASC, doc_id ASC LIMIT 8
    ),
    q2 AS (
      SELECT doc_id, lang AS sort_lang, 'q2' AS query_id FROM t
      WHERE lang = 'de'
      ORDER BY lang ASC, doc_id ASC LIMIT 8
    )
    SELECT * FROM q1 UNION ALL SELECT * FROM q2
    """,
)
def l3_msearch(spark, sf_dir):
    """L3 [ES parity]: ``_msearch`` — a batch of named queries against
    one index in a single request, each page tagged with its
    ``query_id``. One TakeOrdered page per query (the same plan
    query_data builds), unioned page-sized. Queries here: a full-text
    term and a field-scoped filter, both sorted by lang (id
    tie-break), k=8 (api.msearch)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    idx = f"msearch_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, docs.select("doc_id", "text", "lang"), idx,
                           id_col="doc_id")
    try:
        out = api.msearch(
            spark, idx, {"q1": "spark", "q2": "lang:de"}, k=8,
            text_col=["text", "lang"], sort="lang",
        )
        rows = out.collect()
        schema = out.schema
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, schema)


@register(
    "ts3_gap_detection",
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
           date_diff('second', prev_ts, ts)::BIGINT AS gap_seconds
    FROM o
    WHERE prev_ts IS NOT NULL
      AND date_diff('second', prev_ts, ts) > 6 * 3600
    ORDER BY user_id, gap_start
    """,
)
def ts3_gap_detection(spark, sf_dir):
    """Time-series: gap detection — per-key outage/silence intervals
    longer than a threshold (6 h), the monitoring primitive behind
    SLA/liveness checks on event streams. ONE lag window per key
    (partitioned by user, ordered by ts with event_id tie-break): each
    key sorts only its own rows, no global sort, the filter drops
    non-gaps map-side after the window. Output: (key, gap_start,
    gap_end, gap_seconds)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ has no direct long cast: go through epoch via to_unix_timestamp
    o = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).withColumn("__e", F.to_unix_timestamp("ts")).withColumn(
        "__pe", F.to_unix_timestamp("prev_ts")
    )
    return (
        o.filter(
            F.col("prev_ts").isNotNull()
            & ((F.col("__e") - F.col("__pe")) > 6 * 3600)
        )
        .select(
            "user_id",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            (F.col("__e") - F.col("__pe")).alias("gap_seconds"),
        )
        .orderBy("user_id", "gap_start")
    )


@register(
    "s13_snapshot_restore",
    """
    SELECT s_suppkey::VARCHAR AS s_suppkey, s_name,
           s_nationkey::VARCHAR AS s_nationkey, s_acctbal::VARCHAR AS s_acctbal
    FROM supplier
    """,
)
def s13_snapshot_restore(spark, sf_dir):
    """S13 [ES parity]: ``_snapshot`` create + restore — back an index
    up to a repository directory and restore it under a NEW name (the
    ES rename_pattern side-by-side restore). Both directions are one
    distributed parquet read/write; the restored table is a
    first-class marked index. The oracle is the source table: the
    restored content must round-trip exactly (api.snapshot_index /
    api.restore_index)."""
    import shutil
    import tempfile
    import uuid

    from bigdatasearchpro_spark import api

    sup = load_table(spark, sf_dir, "supplier")
    tag = uuid.uuid4().hex[:8]
    idx, restored = f"snap_src_{tag}", f"snap_restored_{tag}"
    repo = tempfile.mkdtemp(prefix="snap_repo_")
    api.bulk_data_to_index(spark, sup, idx, id_col="s_suppkey")
    try:
        res = api.snapshot_index(spark, idx, repo)
        assert res["rows"] == sup.count()
        api.delete_index(spark, idx)  # disaster strikes
        out = api.restore_index(spark, repo, idx, rename_to=restored)
        assert out["rows"] == res["rows"]
        assert restored in api.get_all_index(spark)
        rows = spark.table(restored).collect()
        schema = spark.table(restored).schema
    finally:
        api.delete_index(spark, idx)
        api.delete_index(spark, restored)
        shutil.rmtree(repo, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
             AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """Relational: TPC-H Q6 shape — the pure filter-and-aggregate probe
    (no join): date + discount-band + quantity predicates must ALL push
    to the parquet scan (PushedFilters), and the aggregate is one
    partial+final pass with no grouping shuffle beyond the final
    single-row exchange. DECIMAL money accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "s19_schema_evolution",
    """
    SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS batch_tag
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey AS batch_tag
    FROM nation WHERE n_nationkey >= 10
    ORDER BY n_nationkey
    """,
)
def s19_schema_evolution(spark, sf_dir):
    """S7+ lakehouse source concern: SCHEMA EVOLUTION — a table whose
    later files carry an added column. Batch 1 writes (key, name);
    batch 2 adds ``batch_tag``; a ``mergeSchema`` read unions them with
    NULLs for the pre-evolution files — exactly how long-lived ingest
    directories behave. The oracle replays the union. (At scale:
    mergeSchema reconciles footers at planning time; the scan stays
    one pass.)"""
    import tempfile

    n = load_table(spark, sf_dir, "nation")
    base = tempfile.mkdtemp(prefix="s19_evo_")
    n.filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", "n_name"
    ).write.mode("overwrite").parquet(base + "/b1")
    n.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("batch_tag")
    ).write.mode("overwrite").parquet(base + "/b2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(base + "/b1", base + "/b2")
        .orderBy("n_nationkey")
    )


@register(
    "s18_rollover",
    """
    SELECT 'roll_idx_000001' AS index_name,
           (SELECT count(*) FROM nation) AS docs_count
    UNION ALL
    SELECT 'roll_idx_000002', 0
    ORDER BY index_name
    """,
)
def s18_rollover(spark, sf_dir):
    """S18 [ES parity]: ``_rollover`` — the index-lifecycle primitive.
    Generation 1 is bulk-loaded past the max_docs condition; rollover
    creates generation 2 (same schema, _NNNNNN incremented) and
    re-points the write alias at it. The oracle pins the resulting
    generation names and doc counts (old keeps its data, new is empty
    and alias-targeted). api.rollover."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks import ddl

    nat = load_table(spark, sf_dir, "nation")
    g1, g2, alias = "roll_idx_000001", "roll_idx_000002", "roll_write"
    api.bulk_data_to_index(spark, nat, g1, id_col="n_nationkey")
    try:
        ddl.add_alias(spark, g1, alias)
        res = api.rollover(spark, alias, max_docs=10)
        assert res["rolled_over"] and res["new_index"] == g2
        # the alias now targets generation 2
        assert [
            r["index_name"]
            for r in ddl.list_aliases(spark).collect()
            if r["alias"] == alias
        ] == [g2]
        # dry-run against the fresh (empty) index: condition not met
        again = api.rollover(spark, alias, max_docs=10, dry_run=True)
        assert not again["rolled_over"]
        out = api.cat_indices(spark).filter(
            F.col("index_name").isin(g1, g2)
        )
        rows = (
            out.select("index_name", "docs_count").orderBy("index_name").collect()
        )
    finally:
        ddl.delete_alias(spark, alias)
        api.delete_index(spark, g1)
        api.delete_index(spark, g2)
    return spark.createDataFrame(rows, "index_name string, docs_count long")


@register(
    "ts4_resample_ffill",
    """
    WITH obs AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE user_id < 10
      GROUP BY user_id, ts
    ),
    grid AS (
      SELECT u.user_id, g.gts
      FROM (SELECT DISTINCT user_id FROM obs) u
      CROSS JOIN (
        SELECT unnest(generate_series(
          TIMESTAMP '2024-01-02 00:00:00',
          TIMESTAMP '2024-01-16 00:00:00',
          INTERVAL 6 HOUR)) AS gts
      ) g
    )
    SELECT g.user_id, g.gts AS ts, o.value
    FROM grid g
    ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.gts >= o.ts
    ORDER BY g.user_id, ts
    """,
)
def ts4_resample_ffill(spark, sf_dir):
    """Time-series: resample to a regular 6-hour grid with per-key
    forward fill (last observation carried forward) — the gap-bridging
    primitive behind dashboards and feature engineering on irregular
    event streams. Implementation: observations and grid markers union
    into ONE per-user window (`last(value, ignorenulls)` over ts order,
    grid markers sorting after an equal-ts observation), so the fill
    is a single shuffle on user_id — no per-grid-point join, no
    repeated scans; grid points before a user's first observation stay
    NULL. The oracle is DuckDB's native ASOF LEFT JOIN — a completely
    different evaluation strategy arriving at the same rows, which is
    exactly what makes the hash check strong. Ties at identical ts are
    pre-collapsed with max(value) on both sides."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    obs = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    grid_ts = F.explode(
        F.sequence(
            F.lit("2024-01-02 00:00:00").cast("timestamp"),
            F.lit("2024-01-16 00:00:00").cast("timestamp"),
            F.expr("INTERVAL 6 HOURS"),
        )
    ).alias("ts")
    grid = obs.select("user_id").distinct().select("user_id", grid_ts)
    unioned = obs.withColumn("__grid", F.lit(0)).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("value")
        ).withColumn("__grid", F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "__grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__fill", F.last("value", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__grid") == 1)
        .select("user_id", "ts", F.col("__fill").alias("value"))
        .orderBy("user_id", "ts")
    )


@register(
    "s14_delete_by_query",
    """
    SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
    WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x = 'spark')) = 0
    """,
)
def s14_delete_by_query(spark, sf_dir):
    """S14 [ES parity]: ``_delete_by_query`` — remove every document
    matching a query string (ES: internal scroll + bulk deletes; here
    ONE distributed scan -> anti-filter -> staged rewrite published
    with the force-merge swap protocol, so a failure never loses the
    index). The oracle is the complement set: the index must hold
    exactly the documents NOT matching the query (api.delete_by_query);
    the deleted count is asserted against the match count."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    idx = f"dbq_idx_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs.select("doc_id", "text", "lang"), idx, id_col="doc_id"
    )
    try:
        before = spark.table(idx).count()
        res = api.delete_by_query(spark, idx, "spark", text_col="text")
        assert res["deleted"] + res["remaining"] == before
        assert res["remaining"] == spark.table(idx).count()
        rows = spark.table(idx).select("doc_id", "lang").collect()
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "s15_update_by_query",
    """
    SELECT doc_id::VARCHAR AS doc_id,
           CASE WHEN len(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9]+'),
                  x -> x = 'spark')) > 0
                THEN 'xx' ELSE lang END AS lang
    FROM documents
    """,
)
def s15_update_by_query(spark, sf_dir):
    """S15 [ES parity]: ``_update_by_query`` with a script — rewrite a
    field on every document matching a query string, leaving the rest
    untouched (ES: scroll + scripted bulk updates; here ONE conditional
    projection over one scan, published with the staged-swap protocol).
    The oracle replays the CASE: matched docs get lang='xx', others
    keep theirs (api.update_by_query)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    idx = f"ubq_idx_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs.select("doc_id", "text", "lang"), idx, id_col="doc_id"
    )
    try:
        res = api.update_by_query(
            spark, idx, {"lang": "'xx'"}, "spark", text_col="text"
        )
        assert res["total"] == spark.table(idx).count()
        rows = spark.table(idx).select("doc_id", "lang").collect()
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "s47_routed_delete_by_query",
    """
    SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
    WHERE NOT (lang = 'de' AND len(list_filter(
        string_split_regex(lower(text), '[^a-z0-9]+'),
        x -> x = 'spark')) > 0)
    """,
)
def s47_routed_delete_by_query(spark, sf_dir):
    """S-family [ES parity]: ``_delete_by_query?routing=`` on a
    custom-routed index — the delete scopes to the one shard the
    routing value hashes to and rewrites ONLY that shard's partition
    directory (static-partition INSERT OVERWRITE: 1/n_shards of the
    table moves, the property that makes routed by-query writes viable
    at 100 TB; other shards' files proven untouched in
    tests/test_api.py).  Query pins the routing key
    (``lang:de AND text:spark``) so the shard scope is semantically
    redundant and the oracle replays the complement set without
    needing Spark's shard hash (api.delete_by_query)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    idx = f"rdbq_idx_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs.select("doc_id", "text", "lang"), idx,
        id_col="doc_id", routing_col="lang", n_shards=4,
    )
    try:
        res = api.delete_by_query(
            spark, idx, "lang:de AND text:spark",
            text_col=["text", "lang"], routing="de",
        )
        assert res["deleted"] + res["remaining"] == docs.count()
        rows = spark.table(idx).select("doc_id", "lang").collect()
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "s16_cat_indices",
    """
    SELECT 'cat_idx_nation' AS index_name,
           (SELECT count(*) FROM nation) AS docs_count, 5 AS shards
    UNION ALL
    SELECT 'cat_idx_region', (SELECT count(*) FROM region), 5
    ORDER BY index_name
    """,
)
def s16_cat_indices(spark, sf_dir):
    """S16 [ES parity]: ``GET _cat/indices`` — the operational overview
    (index, doc count, shard setting) the reference watched in Kibana
    (README.md:12, 809). Counts are metadata-sized reads per index;
    the oracle pins them against the source tables (api.cat_indices).
    Shards default to the reference's 5 (BulkProcessImpl.java:66)."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark import api

    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    api.bulk_data_to_index(spark, nat, "cat_idx_nation", id_col="n_nationkey")
    api.bulk_data_to_index(spark, reg, "cat_idx_region", id_col="r_regionkey")
    try:
        cat = api.cat_indices(spark).filter(
            F.col("index_name").isin("cat_idx_nation", "cat_idx_region")
        )
        rows = cat.orderBy("index_name").collect()
        schema = cat.schema
    finally:
        api.delete_index(spark, "cat_idx_nation")
        api.delete_index(spark, "cat_idx_region")
    return spark.createDataFrame(rows, schema)


@register(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """Relational: TPC-H Q8 shape (national market share) adapted to
    the fixture (no partsupp; p_type stands in for the part filter) —
    an 8-way join with BOTH nation legs, region, part and supplier
    broadcast, reduced to a per-year conditional-sum ratio in ONE
    aggregation pass. Volumes accumulate in DECIMAL(18,4) (exact,
    order-independent); only the final share divides as double, which
    is deterministic given identical operands."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    share = (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                      .otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
    return share


@register(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """Relational: TPC-H Q9 shape (product-line profit by nation/year)
    adapted to the fixture (no partsupp, so profit omits supplycost) —
    the LIKE filter prunes part BEFORE its broadcast join, supplier and
    nation broadcast, and the single shuffle is the (nation, year)
    aggregation. DECIMAL accumulation for the money sum."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= '1995-07-01' AND o.o_orderdate < '1995-10-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Relational: TPC-H Q10 shape — top-20 customers by returned-item
    revenue in a quarter. The returnflag + date filters push to the
    scans, nation broadcasts, and the top-20 is a TakeOrdered over the
    grouped result (never a global sort). Ties broken by custkey for
    oracle determinism; DECIMAL money accumulation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    j = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l.l_suppkey AS suppkey,
             round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(18,4))), 2) AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1995-04-01'
      GROUP BY suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev ON rev.suppkey = s.s_suppkey
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """Relational: TPC-H Q15 shape — supplier(s) with the maximum
    quarterly revenue: a derived revenue view consumed twice (once for
    the global-max scalar, once for the equality filter). The revenue
    aggregate is computed ONCE and cached; the scalar max folds to a
    literal before the final broadcast join with supplier. DECIMAL
    revenue so the max-equality compares exact values, not
    float-rounded ones."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    su = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).alias("total_revenue")
        )
        .persist()
    )
    try:
        top = rev.agg(F.max("total_revenue")).first()[0]
        out = (
            F.broadcast(rev.filter(F.col("total_revenue") == top))
            .join(su, F.col("suppkey") == su.s_suppkey)
            .select(
                "s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"),
            )
            .orderBy("s_suppkey")
        )
        rows, schema = out.collect(), out.schema
    finally:
        rev.unpersist()
    return out.sparkSession.createDataFrame(rows, schema)


@register(
    "q12_shipmode_priority",
    """
    SELECT l.l_linestatus AS shipmode_class,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1996-01-01'
    GROUP BY shipmode_class
    ORDER BY shipmode_class
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """Relational: TPC-H Q12 shape — per-class counts of high- vs
    low-priority orders among a year's shipments (the fixture has no
    l_shipmode; l_linestatus plays the class column). One equi join +
    one hash agg with BOTH conditional counts as parallel aggregate
    expressions in the SAME pass; the date filter pushes to the
    lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("shipmode_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode_class")
    )


@register(
    "q19_disjunctive_predicate_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_predicate_revenue(spark, sf_dir):
    """Relational: TPC-H Q19 shape — discounted revenue under a
    DISJUNCTION of brand/size/quantity band predicates spanning both
    join sides (the classic optimizer test: the per-side conjuncts
    must still push into each scan even though the top predicate is an
    OR). part broadcasts; revenue accumulates in DECIMAL (the
    order-independent money pattern, q7)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(band).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(18,4)")), 2,
        ).cast("double").alias("revenue")
    )


@register(
    "s21_field_caps",
    """
    SELECT * FROM (VALUES
      ('body',   'string', true, false, 'fc_idx_a'),
      ('doc_id', 'bigint', true, true,  'fc_idx_a'),
      ('doc_id', 'string', true, false, 'fc_idx_b'),
      ('lang',   'string', true, false, 'fc_idx_b'),
      ('n_chars','string', true, false, 'fc_idx_b')
    ) AS t(field, type, searchable, aggregatable, indices)
    ORDER BY field, type
    """,
)
def s21_field_caps(spark, sf_dir):
    """S21 [ES parity]: ``GET _field_caps`` — merged per-field
    capabilities across indices, with TYPE CONFLICTS kept visible the
    ES way (one row per (field, type) with the indices carrying it):
    fc_idx_a holds a native BIGINT doc_id (aggregatable), fc_idx_b is
    a bulk-loaded index whose stringify-all pipeline made doc_id a
    string — the exact divergence _field_caps exists to expose.
    Catalog-sized, schemas only (api.field_caps)."""
    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks import ddl

    docs = load_table(spark, sf_dir, "documents")
    ddl.create_index(spark, "fc_idx_a", "doc_id BIGINT, body STRING")
    api.bulk_data_to_index(
        spark, docs.select("doc_id", "lang", "n_chars"), "fc_idx_b",
        id_col="doc_id",
    )
    try:
        caps = api.field_caps(spark, ["fc_idx_a", "fc_idx_b"])
        rows = caps.orderBy("field", "type").collect()
        schema = caps.schema
    finally:
        api.delete_index(spark, "fc_idx_a")
        api.delete_index(spark, "fc_idx_b")
    return spark.createDataFrame(rows, schema)


@register(
    "s20_termvectors",
    """
    WITH tf AS (
      SELECT doc_id, t AS term, count(*) AS term_freq
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS t
        FROM documents
      )
      WHERE doc_id IN (1, 2, 7)
      GROUP BY doc_id, t
    ),
    stats AS (
      SELECT t AS term, count(DISTINCT doc_id) AS doc_freq,
             count(*) AS ttf
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS t
        FROM documents
      )
      GROUP BY t
    )
    SELECT tf.doc_id, tf.term AS term, tf.term_freq, s.doc_freq, s.ttf
    FROM tf JOIN stats s ON tf.term = s.term
    ORDER BY tf.doc_id, tf.term
    """,
)
def s20_termvectors(spark, sf_dir):
    """S20 [ES parity]: ``_termvectors`` / ``_mtermvectors`` — per-doc
    term_freq for requested ids plus corpus doc_freq and ttf
    (term_statistics=true). The requested-ids side is one pushed IN
    scan; corpus stats are ONE vocabulary-scale pass joined back with
    the tiny per-doc side broadcast (api.termvectors)."""
    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    return api.termvectors(docs, [1, 2, 7]).orderBy("doc_id", "term")


from bigdatasearchpro_spark import registry_curation  # noqa: E402,F401


@register(
    "l3_post_filter_facets",
    f"""
    WITH {_MATCHED_CTE}
    SELECT lang AS key, count(*) AS doc_count,
           sum(CASE WHEN n_chars > 600 THEN 1 ELSE 0 END)::BIGINT
             AS post_count
    FROM m GROUP BY lang
    ORDER BY doc_count DESC, key ASC
    LIMIT 5
    """,
)
def l3_post_filter_facets(spark, sf_dir):
    """L3 [ES parity]: ``post_filter`` — facet counts over the FULL
    `spark` match set next to the post-filtered hit counts
    (n_chars > 600): the faceted-navigation contract where a clicked
    filter narrows hits but not facets. ONE hash agg computes both
    (conditional count shares the pass) + TakeOrdered
    (operators/aggs.py post_filter_facets)."""
    m = _matched_docs(spark, sf_dir)
    return aggs.post_filter_facets(
        m, "lang", F.col("n_chars") > 600, size=5
    )


# ---------------------------------------------------------------- r7b
@register(
    "l3_agg_adjacency_matrix",
    """
    WITH s AS (
      SELECT
        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c_en,
        sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS c_src0,
        sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END)::BIGINT AS c_long,
        sum(CASE WHEN lang = 'en' AND source = 'src0'
            THEN 1 ELSE 0 END)::BIGINT AS c_en_src0,
        sum(CASE WHEN lang = 'en' AND n_chars >= 150
            THEN 1 ELSE 0 END)::BIGINT AS c_en_long,
        sum(CASE WHEN source = 'src0' AND n_chars >= 150
            THEN 1 ELSE 0 END)::BIGINT AS c_src0_long
      FROM documents
    )
    SELECT key, doc_count FROM (
      SELECT 'en' AS key, c_en AS doc_count FROM s
      UNION ALL SELECT 'src0', c_src0 FROM s
      UNION ALL SELECT 'long', c_long FROM s
      UNION ALL SELECT 'en&src0', c_en_src0 FROM s
      UNION ALL SELECT 'en&long', c_en_long FROM s
      UNION ALL SELECT 'src0&long', c_src0_long FROM s
    ) WHERE doc_count > 0 ORDER BY key
    """,
)
def l3_agg_adjacency_matrix(spark, sf_dir):
    """L3 [ES parity]: ``adjacency_matrix`` aggregation — named filters
    (en / src0 / long) plus every pairwise intersection counted in ONE
    scan of parallel conditional sums; empty buckets omitted like ES
    (operators/aggs.py adjacency_matrix_agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.adjacency_matrix_agg(
        docs,
        {
            "en": F.col("lang") == "en",
            "src0": F.col("source") == "src0",
            "long": F.col("n_chars") >= 150,
        },
    )


@register(
    "l3_agg_rare_terms",
    """
    SELECT o_custkey AS key, count(*)::BIGINT AS doc_count
    FROM orders GROUP BY o_custkey HAVING count(*) <= 4
    ORDER BY doc_count ASC, key ASC
    """,
)
def l3_agg_rare_terms(spark, sf_dir):
    """L3 [ES parity]: ``rare_terms`` aggregation — the long-tail
    buckets (customers with at most four orders).  One exact hash
    aggregate + doc_count filter: only the rare tail survives the agg,
    so the result is tail-sized — the exact answer ES's sharded
    count-asc terms agg cannot guarantee
    (operators/aggs.py rare_terms_agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return aggs.rare_terms_agg(orders, "o_custkey", max_doc_count=4)


from bigdatasearchpro_spark.registry_text import (  # noqa: E402
    SEARCH_QUERY as _SQ,
    _TERMS_SQL,
    _TOKS_CTE,
)

_BM25_SAMPLE_CTE = f"""
    {_TOKS_CTE},
    ne AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM ne
      WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
    ),
    dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
    dl AS (
      SELECT d.doc_id, coalesce(c.cnt, 0)::DOUBLE AS dl
      FROM documents d
      LEFT JOIN (SELECT doc_id, count(*) AS cnt FROM ne GROUP BY doc_id) c
        ON d.doc_id = c.doc_id
    ),
    avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
    sample AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (nn.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))
             ), 4) AS score
      FROM tf
      CROSS JOIN nn CROSS JOIN avgdl
      JOIN dfs ON tf.term = dfs.term
      JOIN dl ON tf.doc_id = dl.doc_id
      GROUP BY tf.doc_id
      ORDER BY score DESC, tf.doc_id ASC
      LIMIT 100
    )
"""


@register(
    "l3_agg_sampler",
    f"""
    WITH {_BM25_SAMPLE_CTE}
    SELECT d.lang AS key, count(*)::BIGINT AS doc_count
    FROM sample s JOIN documents d ON s.doc_id = d.doc_id
    GROUP BY d.lang
    ORDER BY doc_count DESC, key ASC
    """,
)
def l3_agg_sampler(spark, sf_dir):
    """L3 [ES parity]: ``sampler`` aggregation with a ``terms``
    sub-agg — the lang distribution of the 100 BEST-scoring hits of
    the flagship query, not of the whole match set.  The sample is a
    TakeOrderedAndProject over rounded BM25 scores (id tie-break, so
    the cutoff is deterministic — stricter than ES's per-shard
    nondeterministic sample), then one bucket-sized hash agg over 100
    rows; the sample side broadcasts into the join back to documents
    (operators/aggs.py sampler_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    sample = aggs.sampler_sample(
        search.search_topk(docs, _SQ, 100, scoring="bm25"),
        shard_size=100,
        sort=[F.desc("score")],
    )
    joined = docs.join(F.broadcast(sample.select("doc_id")), "doc_id")
    return (
        joined.groupBy(F.col("lang").alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )


@register(
    "l3_agg_weighted_avg",
    """
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_discount * 100) AS BIGINT) AS vi,
             CAST(round(l_quantity * 100) AS BIGINT) AS wi
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(sum(vi * wi) * 1000000 // (sum(wi) * 100) AS BIGINT)
             AS w_avg_scaled,
           CAST(sum(wi) AS BIGINT) AS sum_weight_scaled,
           count(*)::BIGINT AS doc_count
    FROM q GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def l3_agg_weighted_avg(spark, sf_dir):
    """L3 [ES parity]: ``weighted_avg`` metric aggregation — mean
    discount weighted by quantity per return flag, on the EXACT
    integer path: both inputs quantized onto their cent grids, int64
    products/sums, one floor-division to micro-units — bit-stable
    under any distributed sum order, which a double sum-of-products
    is not (operators/aggs.py weighted_avg_agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggs.weighted_avg_agg(
        li,
        value="l_discount",
        weight="l_quantity",
        group_cols=["l_returnflag"],
        value_scale=100,
        weight_scale=100,
    )


# Dense hourly click-bucket frame shared by the pipeline-agg oracles —
# the same grid l3_agg_date_histogram pins (min_doc_count: 0).
_CLICK_BUCKETS_CTE = """
    m AS (SELECT * FROM events WHERE event_type = 'click'),
    g AS (
      SELECT date_trunc('hour', ts) AS key, count(*) AS doc_count
      FROM m GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(key) FROM g),
                                    (SELECT max(key) FROM g),
                                    INTERVAL 1 HOUR)) AS key
    ),
    b AS (
      SELECT grid.key, coalesce(g.doc_count, 0) AS doc_count
      FROM grid LEFT JOIN g ON grid.key = g.key
    )
"""


def _click_buckets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    return aggs.date_histogram_agg(ev, "ts", "hour", min_doc_count=0)


@register(
    "l3_agg_derivative",
    f"""
    WITH {_CLICK_BUCKETS_CTE}
    SELECT key, doc_count,
           doc_count - lag(doc_count) OVER (ORDER BY key)
             AS doc_count_deriv
    FROM b ORDER BY key
    """,
)
def l3_agg_derivative(spark, sf_dir):
    """L3 [ES parity]: ``derivative`` pipeline aggregation —
    bucket-to-bucket delta of hourly click counts (first bucket NULL,
    like ES omits it).  The window runs over the BUCKET frame (~720
    hourly rows here; bucket cardinality, never corpus size — the
    corpus passes through the parent's one hash agg only)
    (operators/aggs.py derivative_agg)."""
    return aggs.derivative_agg(
        _click_buckets(spark, sf_dir), "doc_count"
    ).orderBy("key")


@register(
    "l3_agg_cumulative_sum",
    f"""
    WITH {_CLICK_BUCKETS_CTE}
    SELECT key, doc_count,
           CAST(sum(doc_count) OVER (
             ORDER BY key
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS doc_count_cumsum
    FROM b ORDER BY key
    """,
)
def l3_agg_cumulative_sum(spark, sf_dir):
    """L3 [ES parity]: ``cumulative_sum`` pipeline aggregation —
    running total of hourly click counts over the bucket frame (exact
    bigint; the oracle casts DuckDB's HUGEINT window sum back)
    (operators/aggs.py cumulative_sum_agg)."""
    return aggs.cumulative_sum_agg(
        _click_buckets(spark, sf_dir), "doc_count"
    ).orderBy("key")


@register(
    "l3_agg_moving_avg",
    f"""
    WITH {_CLICK_BUCKETS_CTE},
    w AS (
      SELECT key, doc_count,
             sum(doc_count) OVER (
               ORDER BY key ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
             ) AS s,
             count(doc_count) OVER (
               ORDER BY key ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
             ) AS c
      FROM b
    )
    SELECT key, doc_count,
           CASE WHEN c > 0 THEN CAST(s AS DOUBLE) / CAST(c AS DOUBLE) END
             AS doc_count_mavg
    FROM w ORDER BY key
    """,
)
def l3_agg_moving_avg(spark, sf_dir):
    """L3 [ES parity]: ``moving_fn`` (avg) pipeline aggregation —
    trailing-3-bucket mean of hourly click counts, window ending just
    BEFORE the current bucket (ES ``shift: 0``; first bucket NULL).
    The mean is an exact integer frame sum divided once, so both
    engines produce the identical double
    (operators/aggs.py moving_avg_agg)."""
    return aggs.moving_avg_agg(
        _click_buckets(spark, sf_dir), "doc_count", window=3
    ).orderBy("key")


@register(
    "l3_agg_serial_diff",
    f"""
    WITH {_CLICK_BUCKETS_CTE}
    SELECT key, doc_count,
           doc_count - lag(doc_count, 24) OVER (ORDER BY key)
             AS doc_count_sdiff_24
    FROM b ORDER BY key
    """,
)
def l3_agg_serial_diff(spark, sf_dir):
    """L3 [ES parity]: ``serial_diff`` pipeline aggregation with
    lag 24 — same-hour-yesterday differencing of hourly click counts
    (daily-seasonality removal); the first 24 buckets are NULL like ES
    (operators/aggs.py serial_diff_agg)."""
    return aggs.serial_diff_agg(
        _click_buckets(spark, sf_dir), "doc_count", lag=24
    ).orderBy("key")


_EV_BUCKETS_CTE = """
    g AS (
      SELECT date_trunc('hour', ts) AS key, count(*) AS doc_count,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
               AS n_clicks,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
               AS n_views
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT min(key) FROM g),
                                    (SELECT max(key) FROM g),
                                    INTERVAL 1 HOUR)) AS key
    ),
    b AS (
      SELECT grid.key, coalesce(g.doc_count, 0) AS doc_count,
             g.n_clicks, g.n_views
      FROM grid LEFT JOIN g ON grid.key = g.key
    ),
    s AS (
      SELECT key, doc_count, n_clicks, n_views,
             CASE WHEN coalesce(n_clicks + n_views, 0) > 0
                  THEN n_clicks * 10000 // (n_clicks + n_views) END
               AS click_share_e4
      FROM b
    )
"""


def _script_buckets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    buckets = aggs.date_histogram_agg(
        ev, "ts", "hour",
        metrics={
            "n_clicks": F.sum(
                (F.col("event_type") == "click").cast("long")
            ),
            "n_views": F.sum(
                (F.col("event_type") == "view").cast("long")
            ),
        },
        min_doc_count=0,
    )
    total = F.col("n_clicks") + F.col("n_views")
    return aggs.bucket_script_agg(
        buckets,
        "click_share_e4",
        F.when(total > 0, F.expr("n_clicks * 10000 div (n_clicks + n_views)")),
    )


@register(
    "l3_agg_bucket_script",
    f"""
    WITH {_EV_BUCKETS_CTE}
    SELECT * FROM s ORDER BY key
    """,
)
def l3_agg_bucket_script(spark, sf_dir):
    """L3 [ES parity]: ``bucket_script`` pipeline aggregation — a
    per-bucket expression over sibling metrics: hourly click share of
    click+view traffic on an exact 1e-4 integer grid (floor division
    of exact conditional counts — both engines replay it bit-for-bit;
    empty-traffic buckets NULL) (operators/aggs.py bucket_script_agg)."""
    return _script_buckets(spark, sf_dir).orderBy("key")


@register(
    "l3_agg_bucket_selector",
    f"""
    WITH {_EV_BUCKETS_CTE}
    SELECT * FROM s
    WHERE doc_count >= 3 AND click_share_e4 >= 2000
    ORDER BY key
    """,
)
def l3_agg_bucket_selector(spark, sf_dir):
    """L3 [ES parity]: ``bucket_selector`` pipeline aggregation — the
    HAVING of the agg DSL: keep only busy hours (>= 3 events) whose
    click share clears 20%, applied AFTER the sibling bucket_script
    (operators/aggs.py bucket_selector_agg)."""
    return aggs.bucket_selector_agg(
        _script_buckets(spark, sf_dir),
        (F.col("doc_count") >= 3) & (F.col("click_share_e4") >= 2000),
    ).orderBy("key")


@register(
    "l3_agg_auto_date_histogram",
    """
    WITH m AS (SELECT ts FROM events WHERE event_type = 'click'),
    sp AS (
      SELECT date_diff('second', min(ts), max(ts)) AS s FROM m
    ),
    choice AS (
      SELECT CASE
        WHEN s // 60 + 1 <= 100 THEN 'minute'
        WHEN s // 3600 + 1 <= 100 THEN 'hour'
        WHEN s // 86400 + 1 <= 100 THEN 'day'
        WHEN s // 604800 + 1 <= 100 THEN 'week'
        WHEN s // 2629800 + 1 <= 100 THEN 'month'
        ELSE 'year' END AS u
      FROM sp
    ),
    g AS (
      SELECT c.u AS interval,
             CASE c.u
               WHEN 'minute' THEN date_trunc('minute', m.ts)
               WHEN 'hour'   THEN date_trunc('hour', m.ts)
               WHEN 'day'    THEN CAST(date_trunc('day', m.ts) AS TIMESTAMP)
               WHEN 'week'   THEN CAST(date_trunc('week', m.ts) AS TIMESTAMP)
               WHEN 'month'  THEN CAST(date_trunc('month', m.ts) AS TIMESTAMP)
               ELSE               CAST(date_trunc('year', m.ts) AS TIMESTAMP)
             END AS key,
             count(*) AS doc_count
      FROM m CROSS JOIN choice c
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT unnest(generate_series(
        (SELECT min(key) FROM g), (SELECT max(key) FROM g),
        CASE (SELECT u FROM choice)
          WHEN 'minute' THEN INTERVAL 1 MINUTE
          WHEN 'hour'   THEN INTERVAL 1 HOUR
          WHEN 'day'    THEN INTERVAL 1 DAY
          WHEN 'week'   THEN INTERVAL 7 DAY
          WHEN 'month'  THEN INTERVAL 1 MONTH
          ELSE               INTERVAL 1 YEAR
        END)) AS key
    )
    SELECT (SELECT u FROM choice) AS interval, grid.key,
           coalesce(g.doc_count, 0) AS doc_count
    FROM grid LEFT JOIN g ON grid.key = g.key
    ORDER BY grid.key
    """,
)
def l3_agg_auto_date_histogram(spark, sf_dir):
    """L3 [ES parity]: ``auto_date_histogram`` — the engine picks the
    smallest calendar interval whose rough bucket estimate fits the
    ``buckets: 100`` target (integer ladder arithmetic both engines
    replay; the 30-day click fixture lands on daily buckets), then
    runs the ordinary dense min_doc_count:0 histogram at it and echoes
    the chosen ``interval`` like the ES response.  The probe is ONE
    scalar min/max aggregate — a single bounded driver row at any
    corpus size (operators/aggs.py auto_date_histogram_agg)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    return aggs.auto_date_histogram_agg(
        ev, "ts", target_buckets=100
    ).orderBy("key")


@register(
    "l3_agg_stats_bucket",
    f"""
    WITH {_CLICK_BUCKETS_CTE}
    SELECT count(doc_count)::BIGINT AS n_buckets,
           min(doc_count) AS min_bucket,
           max(doc_count) AS max_bucket,
           CAST(sum(doc_count) AS BIGINT) AS sum_bucket,
           CAST(sum(doc_count) AS DOUBLE) / CAST(count(doc_count) AS DOUBLE)
             AS avg_bucket
    FROM b
    """,
)
def l3_agg_stats_bucket(spark, sf_dir):
    """L3 [ES parity]: the sibling pipeline aggs (``stats_bucket`` /
    ``avg_bucket`` / ``sum_bucket`` / ``min_bucket`` / ``max_bucket``)
    in one row over ALL hourly click buckets — a one-row aggregate
    over the bucket-cardinality frame; the mean is the exact integer
    sum divided once (operators/aggs.py sibling_bucket_stats)."""
    return aggs.sibling_bucket_stats(
        _click_buckets(spark, sf_dir), "doc_count"
    )


@register(
    "l3_agg_percentile_ranks",
    """
    WITH s AS (
      SELECT count(l_quantity)::BIGINT AS n,
             sum(CASE WHEN l_quantity <= 10.0 THEN 1 ELSE 0 END)::BIGINT
               AS le0,
             sum(CASE WHEN l_quantity <= 25.0 THEN 1 ELSE 0 END)::BIGINT
               AS le1,
             sum(CASE WHEN l_quantity <= 40.0 THEN 1 ELSE 0 END)::BIGINT
               AS le2
      FROM lineitem
    )
    SELECT value, n_le, n AS doc_count,
           n_le * 1000000 // n AS rank_scaled
    FROM (
      SELECT CAST(10.0 AS DOUBLE) AS value, le0 AS n_le, n FROM s
      UNION ALL SELECT CAST(25.0 AS DOUBLE), le1, n FROM s
      UNION ALL SELECT CAST(40.0 AS DOUBLE), le2, n FROM s
    ) ORDER BY value
    """,
)
def l3_agg_percentile_ranks(spark, sf_dir):
    """L3 [ES parity]: ``percentile_ranks`` — the inverse of
    ``percentiles``, EXACT: the fraction of lineitems at or below each
    requested quantity, as parallel conditional counts in ONE scan and
    a rank on an exact 1e-6 integer grid (floor division both engines
    replay bit-for-bit; ES itself serves this from a t-digest with
    shard error) (operators/aggs.py percentile_ranks_agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggs.percentile_ranks_agg(li, "l_quantity", [10.0, 25.0, 40.0])


# matrix_stats oracle twin — generated with the EXACT operand order of
# aggs.matrix_stats_agg's mean/cov/corr chains (all correctly-rounded
# IEEE double ops over exact int64 moments, so both engines replay the
# identical doubles bit-for-bit).
_MS_FIELDS = {"l_quantity": 100, "l_discount": 100, "l_tax": 100}


def _matrix_stats_sql(table: str, fields: "dict[str, int]") -> str:
    names = list(fields)
    qi = {
        n: f"CAST(round({n} * {s}) AS BIGINT)" for n, s in fields.items()
    }
    sums = [f"CAST(sum({qi[n]}) AS BIGINT) AS s_{n}" for n in names]
    prods = [
        f"CAST(sum({qi[a]} * {qi[b]}) AS BIGINT) AS p_{a}_{b}"
        for i, a in enumerate(names)
        for b in names[i:]
    ]
    nd = "CAST(n AS DOUBLE)"

    def mean(x: str) -> str:
        return (
            f"((CAST(s_{x} AS DOUBLE) / CAST({float(fields[x])!r} AS DOUBLE))"
            f" / {nd})"
        )

    def cov(x: str, y: str) -> str:
        key = f"p_{x}_{y}" if f"p_{x}_{y}" in " ".join(prods) else f"p_{y}_{x}"
        sxy = (
            f"((CAST({key} AS DOUBLE) / "
            f"CAST({float(fields[x] * fields[y])!r} AS DOUBLE)) / {nd})"
        )
        return f"({sxy} - {mean(x)} * {mean(y)})"

    arms = []
    for i, a in enumerate(names):
        for b in names[i:]:
            corr = (
                f"({cov(a, b)} / (sqrt({cov(a, a)}) * sqrt({cov(b, b)})))"
            )
            arms.append(
                f"SELECT '{a}' AS field_x, '{b}' AS field_y, "
                f"n AS doc_count, s_{a} AS sum_x, s_{b} AS sum_y, "
                f"p_{a}_{b} AS sum_xy, {mean(a)} AS mean_x, "
                f"{mean(b)} AS mean_y, {cov(a, b)} AS covariance, "
                f"{corr} AS correlation FROM agg"
            )
    return (
        f"WITH agg AS (SELECT count(*)::BIGINT AS n, "
        + ", ".join(sums + prods)
        + f" FROM {table}) "
        + " UNION ALL ".join(arms)
        + " ORDER BY field_x, field_y"
    )


@register("l3_agg_matrix_stats", _matrix_stats_sql("lineitem", _MS_FIELDS))
def l3_agg_matrix_stats(spark, sf_dir):
    """L3 [ES parity]: ``matrix_stats`` aggregation — the pairwise
    covariance/correlation matrix of (quantity, discount, tax) on an
    EXACT moment core: cent-grid-quantized int64 sums and cross
    products accumulate in ONE scan of parallel aggregate expressions
    (order-independent), and the derived means/covariances/
    correlations are a fixed chain of correctly-rounded IEEE ops over
    those exact integers — bit-stable on any engine, unlike a naive
    float matrix.  The whole matrix is one scan + one one-row
    projection exploded per pair (operators/aggs.py
    matrix_stats_agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggs.matrix_stats_agg(li, _MS_FIELDS)


@register(
    "l3_agg_boxplot",
    f"""
    WITH {_MATCHED_CTE}
    SELECT min(n_chars::DOUBLE) AS min_v,
           round(quantile_cont(n_chars::DOUBLE, 0.25), 4) AS q1,
           round(quantile_cont(n_chars::DOUBLE, 0.50), 4) AS q2,
           round(quantile_cont(n_chars::DOUBLE, 0.75), 4) AS q3,
           max(n_chars::DOUBLE) AS max_v,
           round(quantile_cont(n_chars::DOUBLE, 0.75)
                 - quantile_cont(n_chars::DOUBLE, 0.25), 4) AS iqr
    FROM m
    """,
)
def l3_agg_boxplot(spark, sf_dir):
    """L3 [ES parity]: ``boxplot`` aggregation — min/q1/median/q3/max
    + IQR of the matched set's length distribution in ONE row from a
    single pass (array percentile + min/max share the aggregate);
    exact interpolated quantiles where ES serves a t-digest
    (operators/aggs.py boxplot_agg)."""
    return aggs.boxplot_agg(_matched_docs(spark, sf_dir), "n_chars")


@register(
    "l3_agg_diversified_sampler",
    f"""
    WITH {_BM25_SAMPLE_CTE.replace("LIMIT 100", "LIMIT 200")},
    pool AS (
      SELECT s.doc_id, d.source, s.score
      FROM sample s JOIN documents d ON s.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (
               PARTITION BY source ORDER BY score DESC, doc_id ASC
             ) AS rn
      FROM pool
    )
    SELECT doc_id, source, score FROM ranked
    WHERE rn <= 2
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
)
def l3_agg_diversified_sampler(spark, sf_dir):
    """L3 [ES parity]: ``diversified_sampler`` aggregation — the
    best-scoring hits of the flagship query de-biased to at most 2
    docs per source, capped at 20.  Plan: a bounded top-200 BM25 pool
    (TakeOrdered on rounded scores), a window partitioned BY SOURCE
    (per-key rank, no global sort), then the final TakeOrdered 20 —
    deterministic cutoffs via id tie-breaks, unlike ES's per-shard
    sample (operators/aggs.py diversified_sampler_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    # broadcast the 200-row scored pool INTO the corpus-side join —
    # never the corpus into the pool
    pool = F.broadcast(
        search.search_topk(docs, _SQ, 200, scoring="bm25")
    ).join(docs.select("doc_id", "source"), "doc_id")
    return aggs.diversified_sampler_sample(
        pool, shard_size=20, field="source", max_docs_per_value=2,
        sort=[F.desc("score")],
    ).select("doc_id", "source", "score")


@register(
    "l3_agg_terms_metric_order",
    """
    SELECT lang AS key, count(*) AS doc_count,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang
    ORDER BY avg_chars DESC, key ASC
    LIMIT 3
    """,
)
def l3_agg_terms_metric_order(spark, sf_dir):
    """L3 [ES parity]: ``terms`` aggregation ordered by a SUB-METRIC
    (``"order": {"avg_chars": "desc"}``) — buckets ranked by their
    mean length instead of doc_count.  On sharded ES this ordering is
    famously approximate (the bounded-error caveat in the ES docs);
    one exact hash agg + TakeOrdered here
    (operators/aggs.py terms_agg order_by)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.terms_agg(
        docs, "lang", size=3,
        metrics={"avg_chars": F.round(F.avg("n_chars"), 4)},
        order_by="avg_chars",
    )


@register(
    "l3_agg_filters_other_bucket",
    """
    WITH s AS (
      SELECT
        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS a,
        sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)::BIGINT AS b,
        sum(CASE WHEN NOT coalesce(lang = 'en', false)
                  AND NOT coalesce(n_chars > 300, false)
            THEN 1 ELSE 0 END)::BIGINT AS o
      FROM documents
    )
    SELECT 'en' AS key, a AS doc_count FROM s
    UNION ALL SELECT 'big', b FROM s
    UNION ALL SELECT '_other_', o FROM s
    """,
)
def l3_agg_filters_other_bucket(spark, sf_dir):
    """L3 [ES parity]: ``filters`` aggregation with
    ``other_bucket: true`` — the ES ``_other_`` bucket counting rows
    matching NO filter (NULL predicates count as non-matching, the ES
    filter-context rule), as one more conditional sum on the same
    single pass (operators/aggs.py filters_agg other_bucket)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.filters_agg(
        docs,
        {"en": F.col("lang") == "en", "big": F.col("n_chars") > 300},
        other_bucket=True,
    )


@register(
    "q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): LEFT OUTER join with a
    FILTERED JOIN PREDICATE (non-urgent orders only — the filter must
    live in the ON clause, not a WHERE, or zero-order customers
    vanish), then a double aggregation: orders per customer, customers
    per order-count.  Both aggs are plain hash aggregates; the outer
    join shuffles on the customer key once.  (The fixture carries no
    o_comment, so the predicate adapts the spec's NOT LIKE to
    priority — the plan shape is identical.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy(cust["c_custkey"])
        .agg(F.count(orders["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 1
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT EXISTS double correlated self-join — the only
    supplier whose item shipped late (> 60 days after the order) on a
    finalized multi-supplier order, region-filtered (the fixture's
    synthetic nation names replace the spec's 'SAUDI ARABIA' literal
    with a region-1 filter; same join shape).  Plan: the late set computes once
    and feeds both the probe and the NOT-EXISTS side; EXISTS compiles
    to a LeftSemi and NOT EXISTS to a LeftAnti on the order key —
    never a count-and-filter materialization.  (Ship-vs-order-date
    lateness adapts the spec's receipt-vs-commit columns, which the
    fixture lacks; the two-semi-join shape is identical.)"""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    others = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    ).alias("l2")
    has_other = l1.join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.o_k"))
        & (F.col("l1.l_suppkey") != F.col("l2.o_s")),
        "left_semi",
    )
    late_others = late.select(
        F.col("l_orderkey").alias("a_k"), F.col("l_suppkey").alias("a_s")
    ).alias("l3")
    only_late = has_other.join(
        late_others,
        (F.col("l1.l_orderkey") == F.col("l3.a_k"))
        & (F.col("l1.l_suppkey") != F.col("l3.a_s")),
        "left_anti",
    )
    return (
        only_late.join(supp, F.col("l1.l_suppkey") == supp["s_suppkey"])
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .filter(F.col("n_regionkey") == 1)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H completion (round 7, third pass): the seven shapes still absent
# from the optimizer-parity suite — Q2/Q3/Q5/Q11/Q14/Q16/Q20.  The
# fixture has no partsupp table (TESTDATA.md), so the partsupp-based
# queries (Q2/Q11/Q16/Q20) derive the part-supplier relation from
# lineitem — the JOIN/SUBQUERY SHAPES (correlated min, global scalar
# threshold, distinct-count + anti-join, correlated quantity threshold)
# are preserved exactly; only the base relation is adapted.


@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name,
           CAST(ps.cost AS DOUBLE) AS cost
    FROM ps
    JOIN eu ON eu.s_suppkey = ps.l_suppkey
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
      AND ps.cost = (
        SELECT min(ps2.cost) FROM ps ps2
        JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
        WHERE ps2.l_partkey = ps.l_partkey
      )
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Relational: TPC-H Q2 shape — the cheapest supplier per part
    within a region, i.e. a CORRELATED MIN subquery.  Adapted to the
    fixture (no partsupp): the part-supplier relation is the per-pair
    min lineitem price, in DECIMAL so the min is exact and the
    min-equality rejoin is bit-stable cross-engine.  The correlated
    subquery decorrelates to ONE aggregation (min cost per part over
    region suppliers) re-joined on (partkey, cost) — no per-row
    subquery execution at any scale; region/nation/supplier all
    broadcast, so the only shuffles are the two partkey aggregations."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,4)")).alias("cost"))
    )
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        su.join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
    best = ps_eu.groupBy(F.col("l_partkey").alias("b_pk")).agg(
        F.min("cost").alias("best_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        ps_eu.join(
            best,
            (ps_eu.l_partkey == best.b_pk) & (ps_eu.cost == best.best_cost),
        )
        .join(F.broadcast(p), ps_eu.l_partkey == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < '1998-03-15' AND l.l_shipdate > '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """Relational: TPC-H Q3 shape — top-10 unshipped orders of one
    market segment by revenue.  The segment filter prunes customer
    BEFORE its join (and customer stays the small build side); the
    date filters push to the orders and lineitem scans; one (orderkey,
    orderdate) aggregation; the top-10 is a TakeOrderedAndProject, so
    nothing but the heap crosses to the driver at any scale.  Money in
    DECIMAL, per the deterministic-aggregation pattern."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """Relational: TPC-H Q5 shape — revenue where supplier and
    customer share a nation, per nation of a region.  The signature
    constraint s_nationkey = c_nationkey rides the supplier join as a
    SECOND equi-key (no post-filter): supplier+nation+region broadcast,
    the date filter pushes to the orders scan, and the only shuffles
    are lineitem-orders-customer plus one 5-row nation aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey)
            & (su.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(18,4)")), 2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q11_important_stock",
    """
    WITH val AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    )
    , tot AS (
      SELECT CAST(sum(v) AS DOUBLE) AS t, count(*) AS k FROM val
    )
    SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM val, tot
    WHERE CAST(v AS DOUBLE) > 2.0 * t / k
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """Relational: TPC-H Q11 shape — parts whose stock value within one
    region exceeds a FRACTION OF THE GLOBAL TOTAL (a scalar subquery in
    the HAVING).  Adapted to the fixture (no partsupp): value is the
    per-part revenue from region suppliers.  The scalar global total is
    ONE extra reduce over the already-aggregated per-part values — a
    1-row broadcast crossed back in, NOT a rescan of lineitem; the
    threshold compares in DOUBLE on both engines (exact decimal-to-
    double conversion, identical operand order) so the cut is
    bit-stable.  The fraction is 2x the MEAN per-part share (2.0/k) —
    spec'd TPC-H uses 0.0001/SF, i.e. also scales inversely with part
    count; a fixed fraction returns the whole table at small SF and
    nothing at large SF."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        su.join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia), li.l_suppkey == asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(18,4)")).alias("v")
        )
    )
    total = val.agg(
        F.sum("v").cast("double").alias("t"), F.count("*").alias("k")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.lit(2.0) * F.col("t") / F.col("k"))
        .select(
            "l_partkey",
            F.round("v", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q14_promo_effect",
    """
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
             AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= '1997-09-01' AND l.l_shipdate < '1997-10-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """Relational: TPC-H Q14 shape — promo revenue share for one
    month: a conditional aggregate over a broadcast part join, zero
    GROUP BY keys (one global reduce).  Both sums accumulate in
    DECIMAL (exact, order-independent), convert to DOUBLE once, and
    divide in the same operand order on both engines — the ratio is
    bit-stable with NO rounding step (rounding a low-precision float
    is the cross-engine hash trap; a deterministic dividend/divisor
    pair needs none)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                  .cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 25, 30, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """Relational: TPC-H Q16 shape — how many distinct suppliers offer
    each (brand, type, size), EXCLUDING a supplier blocklist (the
    NOT-IN subquery; fixture stand-in: low account balance for the
    spec's complaint-comment scan).  Adapted to the fixture (no
    partsupp): the offer relation is lineitem.  The NOT IN becomes a
    broadcast LEFT ANTI join (supplier keys are never null here, so
    anti == NOT IN), the brand/size filters prune part before its
    broadcast, and the distinct-count is one partial_count(distinct)
    aggregation on the group key — no global distinct."""
    su_bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 30, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(su_bad), li.l_suppkey == su_bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_promotion",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q_ss
      FROM lineitem
      WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, sum(q_ss) AS q_p FROM shipped GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s
      JOIN part_total t ON t.l_partkey = s.l_partkey
      JOIN part p ON p.p_partkey = s.l_partkey
      WHERE p.p_name LIKE '%widget%' AND 2 * s.q_ss > t.q_p
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
      AND n.n_regionkey = 2
    ORDER BY s.s_name
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """Relational: TPC-H Q20 shape — suppliers who DOMINATE the supply
    of a named part family in a year (the spec's availqty >
    half-of-shipped correlated subquery; fixture adaptation without
    partsupp: a supplier qualifies when its own 1997 shipments of a
    widget part exceed half that part's total 1997 shipments).  The
    correlated half-sum decorrelates into two stacked aggregations on
    the SAME partkey shuffle key (the second is map-side combinable on
    the first's partitioning), the dominance test is integer-exact
    (2*q_ss > q_p; quantities are integral), and the IN collapses to a
    LEFT SEMI join against the tiny dominant-supplier set, which
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q_ss")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("t_pk")).agg(
        F.sum("q_ss").alias("q_p")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    dominant = (
        shipped.join(part_total, shipped.l_partkey == part_total.t_pk)
        .join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(2 * F.col("q_ss") > F.col("q_p"))
        .select("l_suppkey")
        .distinct()
    )
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        su.join(F.broadcast(dominant), su.s_suppkey == dominant.l_suppkey,
                "left_semi")
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "l3_agg_multi_terms",
    """
    SELECT lang AS key_lang, source AS key_source,
           count(*) AS doc_count, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY doc_count DESC, key_lang, key_source
    LIMIT 10
    """,
)
def l3_agg_multi_terms(spark, sf_dir):
    """L3 [ES parity]: ``multi_terms`` aggregation — top-10 buckets of
    the COMPOSITE (lang, source) key ranked by doc_count over the pair
    (the 7.12+ agg for when per-level `terms` nesting ranks wrong),
    with a sub-metric.  ONE hash aggregation on the composite key +
    TakeOrdered — same plan as `terms`, wider key, vs two stacked
    shuffles for the nested form (operators/aggs.py multi_terms_agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.multi_terms_agg(
        docs, ["lang", "source"],
        size=10, metrics={"sum_chars": F.sum("n_chars")},
    )


@register(
    "l3_agg_top_metrics",
    """
    WITH r AS (
      SELECT event_type AS key, ts, value, user_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             max(ts) OVER (PARTITION BY event_type) AS max_ts
      FROM events
    )
    SELECT key, max_ts AS ts, value, user_id
    FROM r WHERE rn = 1
    ORDER BY key
    """,
)
def l3_agg_top_metrics(spark, sf_dir):
    """L3 [ES parity]: ``top_metrics`` aggregation — per event_type,
    the (value, user_id) carried by the LATEST event (arg-max on ts):
    one max_by hash aggregation (partial-combinable JVM builtin), no
    window, no per-bucket sort — the plan ES's docs call "a cheaper
    top_hits when you need one row".  ES breaks ts ties per-shard-
    arbitrarily; here event_id rides the ordering struct so the pick
    is deterministic (the oracle replays it as a window, proving the
    agg == the sorted-pick semantics)
    (operators/aggs.py top_metrics_agg)."""
    ev = load_table(spark, sf_dir, "events")
    return aggs.top_metrics_agg(
        ev, "event_type", "ts", ["value", "user_id"], tie_col="event_id"
    )


@register(
    "l3_agg_string_stats",
    """
    SELECT count(text) AS count,
           min(strlen(text)) AS min_length,
           max(strlen(text)) AS max_length,
           sum(strlen(text))::DOUBLE / count(text)::DOUBLE AS avg_length
    FROM documents
    """,
)
def l3_agg_string_stats(spark, sf_dir):
    """L3 [ES parity]: ``string_stats`` aggregation over the text
    field — count, min/max/avg length in ONE pass (exact integer
    lengths; avg divides two exact BIGINTs once in DOUBLE, so the row
    is bit-stable).  The optional Shannon-entropy ES also reports
    needs a char-frequency explode + libm log2 — engine-divergent in
    the last ulp, so it stays behind with_entropy=False here and is
    pinned against a Python twin in tests/test_aggs.py
    (operators/aggs.py string_stats_agg)."""
    docs = load_table(spark, sf_dir, "documents")
    return aggs.string_stats_agg(docs, "text")


@register(
    "l3_agg_missing",
    """
    WITH e AS (
      SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS p
      FROM events
    )
    SELECT count(CASE WHEN p IS NULL THEN 1 END) AS missing_count,
           count(p) AS value_count
    FROM e
    """,
)
def l3_agg_missing(spark, sf_dir):
    """L3 [ES parity]: ``missing`` + ``value_count`` metric aggs — how
    many documents LACK a field and how many values are present, one
    conditional-count reduce.  The parquet fixture carries no nulls,
    so the entry injects a deterministic null pattern (event_id % 7)
    in both engines — the agg itself is what is under test
    (operators/aggs.py missing_agg)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "p",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("props")
        ),
    )
    return aggs.missing_agg(ev, "p")


@register(
    "l3_agg_mad",
    """
    WITH med AS (
      SELECT median(o_totalprice::DOUBLE) AS m FROM orders
    )
    SELECT round(median(abs(o_totalprice::DOUBLE - med.m)), 4) AS mad
    FROM orders, med
    """,
)
def l3_agg_mad(spark, sf_dir):
    """L3 [ES parity]: ``median_absolute_deviation`` — the robust
    dispersion ES serves from a t-digest sketch, computed EXACTLY:
    one percentile reduce for the median (1-row broadcast), one for
    the deviations (interpolated median on both engines, subtraction
    exactly rounded).  Two single-reduce passes — the irreducible
    data dependence of nested medians
    (operators/aggs.py median_absolute_deviation_agg)."""
    o = load_table(spark, sf_dir, "orders")
    return aggs.median_absolute_deviation_agg(o, "o_totalprice")


@register(
    "l3_agg_t_test",
    """
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'view')
    ),
    m AS (
      SELECT count(CASE WHEN event_type = 'click' THEN 1 END) AS n1,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS n2,
             sum(CASE WHEN event_type = 'click' THEN v END) AS s1,
             sum(CASE WHEN event_type = 'view' THEN v END) AS s2,
             sum(CASE WHEN event_type = 'click' THEN v * v END) AS q1,
             sum(CASE WHEN event_type = 'view' THEN v * v END) AS q2
      FROM q
    )
    SELECT n1, n2,
           ((s1::DOUBLE / n1 / 100 - s2::DOUBLE / n2 / 100)
            / sqrt(((q1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n1)
                    / (n1 - 1) / 10000) / n1
                   + ((q2::DOUBLE - s2::DOUBLE * s2::DOUBLE / n2)
                      / (n2 - 1) / 10000) / n2)) AS t_value
    FROM m
    """,
)
def l3_agg_t_test(spark, sf_dir):
    """L3 [ES parity]: ``t_test`` aggregation (heteroscedastic Welch,
    the ES default) between the `click` and `view` populations of
    `value`.  Moments are EXACT cent-grid int64 sums (one conditional
    pass, immune to float sum order); the closing chain is
    fixed-order -,*,/,sqrt — all correctly-rounded IEEE, NO libm — so
    the statistic hash-replays bit-for-bit
    (operators/aggs.py t_test_agg)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    return aggs.t_test_agg(ev, "value", "event_type", "click", "view")


@register(
    "l3_agg_normalize",
    """
    WITH g AS (
      SELECT date_trunc('hour', ts) AS key, count(*) AS doc_count
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT key, doc_count,
             min(doc_count) OVER () AS lo, max(doc_count) OVER () AS hi
      FROM g
    )
    SELECT key, doc_count,
           round(CASE WHEN hi <> lo
                 THEN (doc_count - lo)::DOUBLE / (hi - lo)::DOUBLE
                 ELSE CAST(0 AS DOUBLE) END, 6) AS normalized
    FROM b
    """,
)
def l3_agg_normalize(spark, sf_dir):
    """L3 [ES parity]: ``normalize`` pipeline aggregation
    (``rescale_0_1``) over the hourly click histogram — (v - min) /
    (max - min) as a window over the BUCKET frame (bucket-cardinality
    rows; the corpus passes only through the parent agg).  Integer
    doc_counts -> one exact double division
    (operators/aggs.py normalize_agg)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    buckets = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("key")
    ).agg(F.count("*").alias("doc_count"))
    return aggs.normalize_agg(buckets, "doc_count")


@register(
    "s24_sliced_scroll",
    """
    SELECT doc_id::VARCHAR AS doc_id, lang FROM documents
    WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 3 = 1
    ORDER BY doc_id::VARCHAR ASC
    """,
)
def s24_sliced_scroll(spark, sf_dir):
    """S24 [ES parity]: SLICED scrolling (`"slice": {"id": i, "max":
    m}`) — the parallel-export form of scroll: worker 1 of 3 drains
    ITS slice (id-hash % 3 == 1) page by page to exhaustion; the
    slices partition the index disjointly with no coordination, which
    is how a fleet of workers exports 100 TB concurrently.  The slice
    predicate is the engine's portable md5 hash (one more pushed
    filter), so the oracle replays the exact membership; the paging
    itself stays keyset-priced (api.scroll slice_spec)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    idx = f"sliced_scroll_{tag}"
    api.bulk_data_to_index(spark, docs.select("doc_id", "text", "lang"), idx,
                           id_col="doc_id")
    rows, cursor = [], None
    try:
        while True:
            page, cursor = api.scroll(
                spark, idx, size=50, scroll_id=cursor, slice_spec=(1, 3)
            )
            rows.extend(page.select("doc_id", "lang").collect())
            if cursor is None:
                break
    finally:
        api.delete_index(spark, idx)
    return spark.createDataFrame(rows, "doc_id string, lang string")


@register(
    "l3_agg_global",
    """
    WITH m AS (
      SELECT count(*) AS matched FROM documents
      WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x = 'spark')) > 0
    )
    SELECT m.matched,
           (SELECT count(*) FROM documents) AS global_count,
           (SELECT sum(n_chars) FROM documents)::BIGINT AS global_chars
    FROM m
    """,
)
def l3_agg_global(spark, sf_dir):
    """L3 [ES parity]: ``global`` bucket aggregation — metrics over
    the WHOLE index alongside the query-matched count (the ES escape
    hatch for "compare my hits against everything", e.g. percentage-
    of-corpus panels).  Two independent single-row reduces crossed
    together — the matched side reuses the filter context scan, the
    global side is one unfiltered reduce; nothing corpus-sized joins."""
    docs = load_table(spark, sf_dir, "documents")
    m = search.keyword_match(docs, "spark", mode="any").agg(
        F.count("*").alias("matched")
    )
    g = docs.agg(
        F.count("*").alias("global_count"),
        F.sum("n_chars").alias("global_chars"),
    )
    return m.crossJoin(F.broadcast(g))


@register(
    "l3_agg_change_point",
    f"""
    WITH {_CLICK_BUCKETS_CTE},
    s AS (
      SELECT key, doc_count,
             row_number() OVER (ORDER BY key) AS rn,
             CAST(sum(doc_count) OVER (
               ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum,
             count(*) OVER () AS n,
             CAST(sum(doc_count) OVER () AS BIGINT) AS tot,
             lead(key) OVER (ORDER BY key) AS next_key
      FROM b
    ),
    c AS (
      SELECT next_key AS key,
             CAST(cum AS DOUBLE) / CAST(rn AS DOUBLE) AS left_mean,
             CAST(tot - cum AS DOUBLE) / CAST(n - rn AS DOUBLE) AS right_mean
      FROM s WHERE rn < n
    )
    SELECT key, left_mean, right_mean,
           abs(right_mean - left_mean) AS mean_delta,
           'step_change' AS change_type
    FROM c
    ORDER BY mean_delta DESC, key ASC
    LIMIT 1
    """,
)
def l3_agg_change_point(spark, sf_dir):
    """L3 [ES parity]: ``change_point`` aggregation (ES 8.x) — the
    step-change detector over the hourly click-bucket series: the
    split maximizing |mean(left) - mean(right)|, reported as the first
    bucket of the new level plus both segment means.  Exact integer
    segment sums -> one double division each -> bit-stable argmax
    (ties on bucket key), so the oracle replays the full statistic;
    windows run over the ~700-row bucket frame, never the corpus
    (operators/aggs.py change_point_agg)."""
    return aggs.change_point_agg(_click_buckets(spark, sf_dir), "doc_count")


@register(
    "s37_downsample_tsdb",
    """
    WITH src AS (
      SELECT event_type, user_id % 8 AS host,
             date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type, host, bucket
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM src
    ),
    last AS (
      SELECT event_type, host, bucket, value AS v_last FROM r WHERE rn = 1
    ),
    agg AS (
      SELECT event_type, host, bucket,
             count(*) AS doc_count,
             min(value) AS v_min,
             max(value) AS v_max,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS v_sum
      FROM src GROUP BY event_type, host, bucket
    )
    SELECT agg.event_type, agg.host, agg.bucket, agg.doc_count,
           agg.v_min, agg.v_max, agg.v_sum, last.v_last
    FROM agg JOIN last USING (event_type, host, bucket)
    ORDER BY agg.event_type, agg.host, agg.bucket
    """,
)
def s37_downsample_tsdb(spark, sf_dir):
    """S37 [ES parity]: TSDB ``downsample`` — the rollup successor:
    raw metric events rewritten to one summary row per (event_type,
    host, hour): doc_count, min/max, order-independent DECIMAL sum
    (2-dp double), and the gauge's LAST value (latest (ts, id) in the
    bucket).  The synthetic `host` dimension (user_id % 8) makes the
    time-series id a real multi-field tuple like ES's
    time_series_dimension set.  One hash agg + one same-key
    partitioned window + a key-colocated join
    (operators/aggs.py downsample_tsdb)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "host", F.col("user_id") % 8
    )
    return aggs.downsample_tsdb(
        ev, ["event_type", "host"], interval="hour"
    ).orderBy("event_type", "host", "bucket")
