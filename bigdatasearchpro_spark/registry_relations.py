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


# ---------------------------------------------------------------------------
# Scripting DSL: script_score / runtime fields / scripted_metric
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators.scripting import (  # noqa: E402
    Script,
    runtime_field,
    script_score,
    scripted_metric_agg,
)

_SCORE_SCRIPT = (
    "params.w * doc['n_chars'].value / (doc['n_chars'].value + params.pivot)"
)
_SCORE_PARAMS = {"w": 2, "pivot": 200}

@register(
    "l3_script_score",
    f"""
    SELECT doc_id,
           {Script(_SCORE_SCRIPT, _SCORE_PARAMS).sql(
               field_map={"n_chars": "d.n_chars"})} AS score
    FROM documents d
    WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x = 'spark')) > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def l3_script_score(spark, sf_dir):
    """L3 [ES parity]: ``script_score`` query — the matched set of the
    term query `spark` re-scored by a Painless-subset script
    (saturation of n_chars, weight 2) COMPILED to a native Column
    expression (whole-stage codegen; no interpreter, no UDF) — the
    oracle SQL is emitted from the SAME AST with identical operand
    order, so every IEEE op matches bit-for-bit
    (operators/scripting.py Script)."""
    docs = load_table(spark, sf_dir, "documents")
    m = search.keyword_match(docs, "spark", mode="any")
    return (
        m.select(
            "doc_id",
            script_score(m, _SCORE_SCRIPT, _SCORE_PARAMS).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_TIER_SCRIPT = "Math.floor(doc['o_totalprice'].value / params.bucket)"
_TIER_PARAMS = {"bucket": 50000}

@register(
    "l3_runtime_field",
    f"""
    SELECT CAST({Script(_TIER_SCRIPT, _TIER_PARAMS).sql(
        field_map={"o_totalprice": "o_totalprice"})} AS BIGINT) AS tier,
           COUNT(*)::BIGINT AS doc_count
    FROM orders
    GROUP BY tier
    ORDER BY tier
    """,
)
def l3_runtime_field(spark, sf_dir):
    """L3 [ES parity]: runtime field (``runtime_mappings``) — a
    query-time computed field (price tier = floor(totalprice/50000))
    defined by a script and then used as a terms-agg key, exactly the
    ES no-reindex pitch.  The runtime column is a plain expression
    over the scan (pushdown/codegen unaffected); ONE hash aggregate
    (operators/scripting.py runtime_field)."""
    orders = load_table(spark, sf_dir, "orders")
    rt = runtime_field(orders, "tier", _TIER_SCRIPT, _TIER_PARAMS)
    return (
        rt.groupBy(F.col("tier").cast("bigint").alias("tier"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("tier")
    )


_METRIC_SCRIPT = "doc['l_quantity'].value * params.factor"
_METRIC_PARAMS = {"factor": 3}

@register(
    "l3_agg_scripted_metric",
    f"""
    SELECT l_returnflag,
           SUM({Script(_METRIC_SCRIPT, _METRIC_PARAMS).sql(
               field_map={"l_quantity": "l_quantity"})}) AS value
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def l3_agg_scripted_metric(spark, sf_dir):
    """L3 [ES parity]: ``scripted_metric`` aggregation in its
    distributable (monoid) form — map script emits quantity*3 per doc,
    combine/reduce sum — compiled to ONE hash aggregate with map-side
    partial combine (never a UDAF, never an interpreter).  Quantities
    are integral doubles so the sum is exact under any combine order
    (operators/scripting.py scripted_metric_agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return scripted_metric_agg(
        li, ["l_returnflag"], _METRIC_SCRIPT, _METRIC_PARAMS, reduce="sum"
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# IP ring: ip field functions, CIDR term query, ip_range aggregation
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators import ip as ipops  # noqa: E402

# deterministic 10.0.0.0/12 address from the customer key (Knuth-hash
# spread; identical integer derivation in both engines)
_IP_SQL = "(167772160 + (c_custkey * 2654435761) % 1048576)"


def _ip_col():
    return F.lit(167772160) + (
        F.col("c_custkey") * F.lit(2654435761)
    ) % F.lit(1048576)


@register(
    "f9_ip_funcs",
    f"""
    WITH base AS (
      SELECT c_custkey, {_IP_SQL} AS ip_long FROM customer
    )
    SELECT c_custkey, ip_long,
           ((ip_long // 16777216) % 256)::VARCHAR || '.' ||
           ((ip_long // 65536) % 256)::VARCHAR || '.' ||
           ((ip_long // 256) % 256)::VARCHAR || '.' ||
           (ip_long % 256)::VARCHAR AS ip_str,
           ip_long AS ip_back
    FROM base
    ORDER BY c_custkey
    """,
)
def f9_ip_funcs(spark, sf_dir):
    """F9 scalar-function family: ``ip`` type support — BIGINT ->
    dotted-quad format and string -> BIGINT parse, round-tripped
    (``ip_back`` re-parses the formatted string and must equal
    ``ip_long``; the oracle recomputes the expected integer from the
    same derivation).  Pure integer div/mod + split column math —
    codegen-span, no UDF (operators/ip.py)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select("c_custkey", _ip_col().alias("ip_long"))
    return (
        base.withColumn("ip_str", ipops.long_to_ip_col("ip_long"))
        .withColumn("ip_back", ipops.ip_to_long_col("ip_str"))
        .orderBy("c_custkey")
    )


_CIDR = "10.4.0.0/14"
_CIDR_LO, _CIDR_HI = ipops.parse_cidr(_CIDR)

@register(
    "l3_ip_cidr_query",
    f"""
    WITH base AS (
      SELECT c_custkey, {_IP_SQL} AS ip_long FROM customer
    )
    SELECT c_custkey,
           ((ip_long // 16777216) % 256)::VARCHAR || '.' ||
           ((ip_long // 65536) % 256)::VARCHAR || '.' ||
           ((ip_long // 256) % 256)::VARCHAR || '.' ||
           (ip_long % 256)::VARCHAR AS ip
    FROM base
    WHERE ip_long >= {_CIDR_LO} AND ip_long < {_CIDR_HI}
    ORDER BY c_custkey
    """,
)
def l3_ip_cidr_query(spark, sf_dir):
    """L3 [ES parity]: ``term`` query on an ``ip`` field in CIDR
    notation (`10.4.0.0/14`) — the CIDR resolves ONCE driver-side to a
    closed-open integer range whose predicate pushes into the scan
    (operators/ip.py parse_cidr/cidr_pred); the dotted form is
    re-formatted only for the surviving page."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select("c_custkey", _ip_col().alias("ip_long"))
    return (
        base.filter(ipops.cidr_pred("ip_long", _CIDR))
        .select("c_custkey", ipops.long_to_ip_col("ip_long").alias("ip"))
        .orderBy("c_custkey")
    )


_IP_RANGES = [
    ("low", None, "10.4.0.0"),
    ("mid", "10.4.0.0", "10.8.0.0"),
    ("high", "10.8.0.0", None),
]

@register(
    "l3_agg_ip_range",
    f"""
    WITH base AS (
      SELECT {_IP_SQL} AS ip_long FROM customer
    )
    SELECT 'low' AS key,
           SUM(CASE WHEN ip_long < {ipops.parse_ip("10.4.0.0")} THEN 1
               ELSE 0 END)::BIGINT AS doc_count FROM base
    UNION ALL
    SELECT 'mid',
           SUM(CASE WHEN ip_long >= {ipops.parse_ip("10.4.0.0")}
                     AND ip_long < {ipops.parse_ip("10.8.0.0")} THEN 1
               ELSE 0 END)::BIGINT FROM base
    UNION ALL
    SELECT 'high',
           SUM(CASE WHEN ip_long >= {ipops.parse_ip("10.8.0.0")} THEN 1
               ELSE 0 END)::BIGINT FROM base
    """,
)
def l3_agg_ip_range(spark, sf_dir):
    """L3 [ES parity]: ``ip_range`` aggregation — half-open dotted-quad
    buckets (unbounded ends allowed, empty buckets preserved, the ES
    contract) resolved driver-side to integers and reduced to ONE pass
    of parallel conditional counts (a single scalar aggregate row
    unpivoted — no shuffle per bucket; operators/ip.py ip_range_agg)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(_ip_col().alias("ip_long"))
    return ipops.ip_range_agg(base, "ip_long", _IP_RANGES)


# ---------------------------------------------------------------------------
# date_range aggregation (date-math bounds)
# ---------------------------------------------------------------------------

@register(
    "l3_agg_date_range",
    """
    SELECT 'old' AS key,
           SUM(CASE WHEN ts < TIMESTAMP '2024-01-13 00:00:00' THEN 1
               ELSE 0 END)::BIGINT AS doc_count FROM events
    UNION ALL
    SELECT 'last_week',
           SUM(CASE WHEN ts >= TIMESTAMP '2024-01-13 00:00:00'
                     AND ts < TIMESTAMP '2024-01-20 00:00:00' THEN 1
               ELSE 0 END)::BIGINT FROM events
    UNION ALL
    SELECT 'recent',
           SUM(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 1
               ELSE 0 END)::BIGINT FROM events
    """,
)
def l3_agg_date_range(spark, sf_dir):
    """L3 [ES parity]: ``date_range`` aggregation — buckets bounded by
    ES date-math expressions (`now-1w/d`, `now/d`; now passed
    explicitly = 2024-01-20, the reproducibility contract) resolved
    ONCE driver-side to timestamp literals, then ONE pass of parallel
    conditional counts (empty requested buckets preserved; the oracle
    embeds the hand-computed bounds)
    (operators/aggs.py date_range_agg + operators/datemath.py)."""
    import datetime as dt

    from bigdatasearchpro_spark.operators.aggs import date_range_agg

    ev = load_table(spark, sf_dir, "events")
    return date_range_agg(
        ev,
        "ts",
        [
            ("old", None, "now-1w/d"),
            ("last_week", "now-1w/d", "now/d"),
            ("recent", "now/d", None),
        ],
        now=dt.datetime(2024, 1, 20, 0, 0, 0),
    )


# ---------------------------------------------------------------------------
# significant_text aggregation (filter_duplicate_text semantics)
# ---------------------------------------------------------------------------

@register(
    "l3_agg_significant_text",
    """
    WITH m AS (
      SELECT d.* FROM documents d
      WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x = 'stream')) > 0
    ),
    fgd AS (
      SELECT min(doc_id) AS doc_id, text FROM m GROUP BY text
    ),
    fg AS (
      SELECT term AS key, count(*) AS doc_count
      FROM (SELECT doc_id, unnest(list_distinct(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> ''))) AS term
            FROM fgd)
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
    sz AS (SELECT (SELECT count(*) FROM fgd)::DOUBLE AS n_fg,
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
def l3_agg_significant_text(spark, sf_dir):
    """L3 [ES parity]: ``significant_text`` aggregation — JLH-scored
    term lift of the `stream`-matched hits' re-analyzed text vs the
    whole index, with ``filter_duplicate_text: true``: duplicated text
    counts ONCE (exact-text dedup, one hash aggregate) so boilerplate
    cannot fake significance; background stats stay whole-index like
    ES (operators/aggs.py significant_text_agg)."""
    from bigdatasearchpro_spark.operators import aggs

    docs = load_table(spark, sf_dir, "documents")
    fg = search.keyword_match(docs, "stream", mode="any")
    return aggs.significant_text_agg(fg, docs, size=10, min_doc_count=3)


# ---------------------------------------------------------------------------
# wrapper query (base64-encoded inner DSL)
# ---------------------------------------------------------------------------

import base64 as _b64  # noqa: E402
import json as _json  # noqa: E402

from bigdatasearchpro_spark.operators.wrapper import wrapper_query  # noqa: E402

_WRAPPED = _b64.b64encode(
    _json.dumps({"query_string": {"query": 'lang:en AND "the spark"'}}).encode()
).decode()

_ALL_TOKS_SQL = (
    "list_filter(string_split_regex(lower(concat_ws(' ', coalesce(text,''), "
    "coalesce(lang,''), coalesce(source,''))), '[^a-z0-9]+'), x -> x <> '')"
)

@register(
    "l3_wrapper_query",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'),
                         x -> x <> '') AS ltoks,
             {_ALL_TOKS_SQL} AS atoks
      FROM documents
    )
    SELECT doc_id, lang, source FROM t
    WHERE list_contains(ltoks, 'en')
      AND (' ' || array_to_string(atoks, ' ') || ' ') LIKE '% the spark %'
    ORDER BY doc_id
    """,
)
def l3_wrapper_query(spark, sf_dir):
    """L3 [ES parity]: ``wrapper`` query — a base64(JSON) payload
    decoded ONCE driver-side, its inner ``query_string`` compiled
    through the same native path as a direct query (the ES contract:
    the wrapper adds no semantics, so the plan is identical to the
    unwrapped form; operators/wrapper.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        wrapper_query(docs, _WRAPPED)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# simple_query_string (the lenient end-user grammar)
# ---------------------------------------------------------------------------

@register(
    "l3_simple_query_string",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id FROM t
    WHERE ((' ' || array_to_string(toks, ' ') || ' ') LIKE '% the spark %'
           AND list_contains(toks, 'join')
           AND NOT list_contains(toks, 'window'))
       OR len(list_filter(toks, x -> x LIKE 'group%')) > 0
    ORDER BY doc_id
    """,
)
def l3_simple_query_string(spark, sf_dir):
    """L3 [ES parity]: ``simple_query_string`` — the lenient end-user
    grammar (`+` AND, `|` OR, `-` NOT, quoted phrase, trailing-`*`
    prefix; syntax errors degrade instead of throwing, the ES
    contract) parsed into the SAME AST and compiled through the SAME
    predicate compiler as the full query_string — one narrow boolean
    filter in the scan's codegen span
    (operators/querystring.py parse_simple_query_string)."""
    from bigdatasearchpro_spark.operators.querystring import (
        simple_query_string_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        simple_query_string_filter(
            docs,
            '"the spark" join -window | group*',
            default_operator="and",
            default_field="text",
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# constant_score query
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators.wrapper import compile_dsl  # noqa: E402

@register(
    "l3_constant_score",
    """
    SELECT doc_id, CAST(1.2 AS DOUBLE) AS score
    FROM documents
    WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x = 'spark' OR x = 'join')) > 0
    ORDER BY doc_id
    """,
)
def l3_constant_score(spark, sf_dir):
    """L3 [ES parity]: ``constant_score`` query — the inner ``match``
    runs in pure FILTER context (no BM25 stats computed at all, the ES
    point of this query) and every hit carries the literal ``boost``
    as its score; the plan is the bare scan filter plus one literal
    column (operators/wrapper.py compile_dsl)."""
    docs = load_table(spark, sf_dir, "documents")
    out = compile_dsl(
        docs,
        {"constant_score": {
            "filter": {"match": {"text": "spark join"}},
            "boost": 1.2,
        }},
    )
    return out.select("doc_id", "score").orderBy("doc_id")


# ---------------------------------------------------------------------------
# ExactSubstr dedup (Lee et al. 2021) — sliding-window substring removal
# ---------------------------------------------------------------------------

@register(
    "l5_substring_dedup",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id, i AS wpos, array_to_string(toks[i+1 : i+8], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(range(0, greatest(len(toks) - 7, 0))) AS i
            FROM t)
    ),
    d AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT w.doc_id, w.wpos + j.j AS tpos
      FROM w JOIN d USING (win)
      CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
    ),
    tok AS (
      SELECT doc_id, tpos, toks[tpos + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS tpos FROM t)
    ),
    kept AS (
      SELECT tok.doc_id, tok.tpos, tok.tok
      FROM tok LEFT JOIN cov
        ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
      WHERE cov.doc_id IS NULL
    )
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           (len(t.toks) - coalesce(k.nk, 0))::BIGINT AS n_removed,
           coalesce(k.ct, '') AS clean_text
    FROM t LEFT JOIN (
      SELECT doc_id, count(*) AS nk,
             string_agg(tok, ' ' ORDER BY tpos) AS ct
      FROM kept GROUP BY doc_id
    ) k ON t.doc_id = k.doc_id
    ORDER BY t.doc_id
    """,
)
def l5_substring_dedup(spark, sf_dir):
    """L5 [EXT]: exact-substring deduplication — the ExactSubstr
    operator of Lee et al. 2021 at token granularity: every token
    position covered by an 8-token sliding window occurring >= 2 times
    corpus-wide (across docs AND within-doc repeats) is removed and
    the survivors reassemble in order.  Three corpus-linear passes
    (sliding-window explode -> window-count hash agg -> cover/anti
    join -> group-back); the windows SLIDE so duplicated passages are
    caught at any alignment, unlike segment_dedup's fixed grid
    (operators/curation.py substring_dedup)."""
    from bigdatasearchpro_spark.operators.curation import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(
        docs, window_tokens=8, min_count=2
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# indices_boost (cross-index merge weighting)
# ---------------------------------------------------------------------------

@register(
    "l3_indices_boost",
    """
    WITH base AS (
      SELECT doc_id % 2 AS half, doc_id::VARCHAR AS doc_id,
             list_filter(string_split_regex(lower(concat_ws(' ',
                 coalesce(doc_id::VARCHAR, ''), coalesce(text, ''),
                 coalesce(lang, ''), coalesce(source, ''),
                 coalesce(n_chars::VARCHAR, ''))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT * FROM base
      WHERE len(list_filter(toks,
                x -> x IN ('spark', 'join', 'window'))) > 0
    ),
    tf AS (SELECT half, doc_id, term, count(*) AS tf
           FROM (SELECT half, doc_id, unnest(toks) AS term FROM m)
           WHERE term IN ('spark', 'join', 'window')
           GROUP BY half, doc_id, term),
    dfs AS (SELECT half, term, count(*) AS df FROM tf GROUP BY half, term),
    nn AS (SELECT half, count(*)::DOUBLE AS n FROM m GROUP BY half),
    dl AS (SELECT half, doc_id, len(toks)::DOUBLE AS dl FROM m),
    ad AS (SELECT half, avg(dl) AS avgdl FROM dl GROUP BY half),
    sc AS (
      SELECT tf.half, tf.doc_id,
             round(sum(
               ln(1 + (nn.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / ad.avgdl))
             ), 4) AS score
      FROM tf
      JOIN nn ON tf.half = nn.half
      JOIN ad ON tf.half = ad.half
      JOIN dfs ON tf.half = dfs.half AND tf.term = dfs.term
      JOIN dl ON tf.half = dl.half AND tf.doc_id = dl.doc_id
      GROUP BY tf.half, tf.doc_id
    ),
    pages AS (
      SELECT half, doc_id,
             score * (CASE half WHEN 0 THEN 2.0 ELSE 0.5 END) AS score,
             row_number() OVER (PARTITION BY half
                                ORDER BY score DESC, doc_id ASC) AS rn
      FROM sc
    ),
    merged AS (
      SELECT doc_id, score,
             CASE half WHEN 0 THEN 'boost_probe_a_X'
                       ELSE 'boost_probe_b_X' END AS idx
      FROM pages WHERE rn <= 10
    )
    SELECT doc_id, score, idx AS "index"
    FROM merged
    ORDER BY score DESC, idx ASC, doc_id ASC
    LIMIT 10
    """,
)
def l3_indices_boost(spark, sf_dir):
    """L3 [ES parity]: ``indices_boost`` — the cross-index merge of
    `_all` search with per-index score multipliers (index a x2.0,
    index b x0.5; power-of-two boosts so the multiply is EXACT).
    Within-index order is boost-invariant (per-index pages unchanged);
    only the merge ranking moves — the oracle replays the whole
    scatter-gather with the boost applied before the page merge
    (api.query_data indices_boost)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    a, b = f"boost_probe_a_{tag}", f"boost_probe_b_{tag}"
    api.bulk_data_to_index(spark, docs.filter(F.col("doc_id") % 2 == 0), a,
                           id_col="doc_id")
    api.bulk_data_to_index(spark, docs.filter(F.col("doc_id") % 2 == 1), b,
                           id_col="doc_id")
    try:
        hits = api.query_data(
            spark, "spark join window", "_all", k=10,
            indices_boost={a: 2.0, b: 0.5},
        )
        rows = hits.select(
            "doc_id", "score",
            F.regexp_replace("index", tag, "X").alias("index"),
        ).collect()
    finally:
        api.delete_index(spark, a)
        api.delete_index(spark, b)
    return spark.createDataFrame(rows, "doc_id string, score double, index string")


# ---------------------------------------------------------------------------
# search templates + stored scripts
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators.wrapper import search_template  # noqa: E402

@register(
    "l3_search_template",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE n_chars >= 120 AND n_chars < 240 AND lang = 'en'
    ORDER BY doc_id
    """,
)
def l3_search_template(spark, sf_dir):
    """L3 [ES parity]: ``_search/template`` — mustache ``{{var}}``
    substitution into the raw JSON source BEFORE parsing (numeric
    params land unquoted, the ES semantics), rendered ONCE driver-side
    and dispatched through the same native compile path; here a
    templated range over n_chars intersected with a term on lang via
    two template invocations is folded into one range+term query
    (operators/wrapper.py render_template/search_template)."""
    docs = load_table(spark, sf_dir, "documents")
    out = search_template(
        docs,
        '{"range": {"n_chars": {"gte": {{lo}}, "lt": {{hi}}}}}',
        {"lo": 120, "hi": 240},
    )
    out = search_template(out, '{"term": {"lang": "{{l}}"}}', {"l": "en"})
    return out.select("doc_id", "n_chars").orderBy("doc_id")


@register(
    "s25_stored_script",
    """
    SELECT CAST(floor((CAST(o_totalprice AS DOUBLE)
                       / CAST(50000.0 AS DOUBLE))) AS BIGINT) AS tier,
           COUNT(*)::BIGINT AS doc_count
    FROM orders
    GROUP BY tier
    ORDER BY tier
    """,
)
def s25_stored_script(spark, sf_dir):
    """S-family [ES parity]: stored scripts — ``PUT _scripts/{id}``
    (parse-validated at PUT, like ES), resolved at USE time with
    request params bound (`{"script": {"id", "params"}}`), then the
    full lifecycle: the stored script drives a runtime-field terms
    agg identical to the inline form, and DELETE removes it
    (sinks/ddl.py put_script; api.stored_script_column)."""
    import uuid

    from bigdatasearchpro_spark import api

    orders = load_table(spark, sf_dir, "orders")
    sid = f"tier-script-{uuid.uuid4().hex[:8]}"
    api.put_script(
        spark, sid, "Math.floor(doc['o_totalprice'].value / params.bucket)"
    )
    try:
        assert api.get_script(spark, sid) is not None
        col = api.stored_script_column(spark, sid, {"bucket": 50000})
        out = (
            orders.withColumn("tier", col.cast("bigint"))
            .groupBy("tier")
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("tier")
        )
        rows = out.collect()
    finally:
        assert api.delete_script(spark, sid)
        assert api.get_script(spark, sid) is None
    return spark.createDataFrame(rows, "tier bigint, doc_count bigint")


@register(
    "s48_render_template",
    """
    SELECT doc_id, n_chars,
           '{"bool":{"must":[{"term":{"lang":"fr"}},{"range":{"n_chars":{"gte":150}}}]}}'
             AS rendered
    FROM documents
    WHERE lang = 'fr' AND n_chars >= 150
    ORDER BY doc_id
    """,
)
def s48_render_template(spark, sf_dir):
    """S-family [ES parity]: ``POST _render/template/{id}`` — a STORED
    mustache search template (``PUT _scripts/{id}``, lang=mustache) is
    rendered with request params into the exact query node the search
    would run (``{"template_output": ...}``), verified equal to the
    inline-source render, then dispatched natively; the canonical JSON
    of the render rides along as a constant column so the driver hash
    covers the render itself, not just the match set
    (api.render_search_template; operators/wrapper.py
    render_template)."""
    import json
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.operators.wrapper import compile_dsl

    docs = load_table(spark, sf_dir, "documents")
    tid = f"tpl-{uuid.uuid4().hex[:8]}"
    src = ('{"bool": {"must": [{"term": {"lang": "{{l}}"}}, '
           '{"range": {"n_chars": {"gte": {{lo}}}}}]}}')
    api.put_script(spark, tid, src, lang="mustache")
    try:
        out = api.render_search_template(
            spark, template_id=tid, params={"l": "fr", "lo": 150})
        node = out["template_output"]
        inline = api.render_search_template(
            spark, source=src, params={"l": "fr", "lo": 150})
        assert out == inline, "stored render != inline render"
        rendered = json.dumps(node, sort_keys=True, separators=(",", ":"))
        matched = compile_dsl(docs, node)
    finally:
        assert api.delete_script(spark, tid)
    return (
        matched.select("doc_id", "n_chars", F.lit(rendered).alias("rendered"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (head / middle / tail per language)
# ---------------------------------------------------------------------------

_FTOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)

@register(
    "l5_ccnet_buckets",
    f"""
    WITH t AS (SELECT doc_id, lang, {_FTOKS_SQL} AS toks FROM documents),
    bi AS (
      SELECT doc_id, toks[i] AS a, toks[i+1] AS b
      FROM t, LATERAL (
        SELECT unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
      )
    ),
    c2 AS (SELECT a, b, count(*) AS n2 FROM bi GROUP BY a, b),
    c1 AS (SELECT a, count(*) AS n1 FROM bi GROUP BY a),
    sc AS (
      SELECT bi.doc_id,
             round(avg(ln(c2.n2::DOUBLE / c1.n1)), 4) AS avg_logprob
      FROM bi JOIN c2 ON bi.a = c2.a AND bi.b = c2.b
              JOIN c1 ON bi.a = c1.a
      GROUP BY bi.doc_id
    ),
    ranked AS (
      SELECT t.doc_id, t.lang, sc.avg_logprob,
             ntile(3) OVER (PARTITION BY t.lang
                            ORDER BY sc.avg_logprob DESC NULLS LAST,
                                     t.doc_id ASC) AS tile
      FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id
    )
    SELECT doc_id, lang, avg_logprob,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    ORDER BY doc_id
    """,
)
def l5_ccnet_buckets(spark, sf_dir):
    """L5 [EXT]: CCNet perplexity bucketing (Wenzek et al. 2020) —
    per-language head/middle/tail thirds by corpus-bigram-LM fluency
    RANK (ntile per language partition; no corpus-global sort, no
    interpolated thresholds — integer-deterministic under ties).
    Unscorable <2-token docs land in the tail like CCNet's fragments
    (operators/curation.py ccnet_buckets)."""
    from bigdatasearchpro_spark.operators.curation import ccnet_buckets

    docs = load_table(spark, sf_dir, "documents")
    return ccnet_buckets(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Embedding-space decontamination (semantic eval-leak detection)
# ---------------------------------------------------------------------------

_EMB_QUANT_CTE = """
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> greatest(-127, least(127, floor(x::DOUBLE /
                      (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END)
                      + 0.5)))::BIGINT) AS q
      FROM (SELECT vec_id, embedding,
                   greatest(list_max(list_transform(embedding,
                            x -> abs(x)))::DOUBLE, 0) AS amax
            FROM embeddings)
    )
"""

@register(
    "l5_embedding_decontaminate",
    f"""
    WITH {_EMB_QUANT_CTE},
    n AS (SELECT vec_id, q,
                 list_sum(list_transform(q, x -> x * x))::BIGINT AS nn
          FROM q),
    b AS (SELECT vec_id AS bench_id, q AS bq, nn AS bn
          FROM n WHERE vec_id % 97 = 0),
    pairs AS (
      SELECT n.vec_id, b.bench_id,
             list_sum([n.q[i] * b.bq[i]
                       for i in generate_series(1, 64)])::BIGINT AS dot,
             n.nn, b.bn
      FROM n CROSS JOIN b
    )
    SELECT vec_id, count(*)::BIGINT AS n_matches
    FROM pairs
    WHERE dot > 0 AND 10000 * dot * dot >= 9025 * nn * bn
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def l5_embedding_decontaminate(spark, sf_dir):
    """L5 [EXT]: embedding-space benchmark decontamination — the
    semantic companion to n-gram decontamination: corpus vectors
    within cosine sqrt(9025/10000)=0.95 of ANY held-out benchmark
    vector (here the vec_id%97 eval subset, so the verbatim leaked
    copies flag themselves) are reported with their match counts.
    INTEGER-EXACT int8 decision on BOTH sides; the benchmark side is
    an eval-sized broadcast int64 matrix inside ONE Arrow numpy pass
    (quantize + matmul + mask) — no join, no shuffle
    (operators/similarity.py embedding_decontaminate_int8)."""
    from bigdatasearchpro_spark.operators.similarity import (
        embedding_decontaminate_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 0)
    return embedding_decontaminate_int8(
        emb, bench, thr_num=9025, thr_den=10000
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# span query family (legacy positional algebra)
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators.spans import span_query  # noqa: E402

_SPAN_TOKS_CTE = """
    t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    p AS (
      SELECT doc_id, toks[i] AS tok, i - 1 AS pos
      FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)
    )
"""

@register(
    "l3_span_near_query",
    f"""
    WITH {_SPAN_TOKS_CTE}
    SELECT DISTINCT a.doc_id FROM p a JOIN p b ON a.doc_id = b.doc_id
    WHERE a.tok = 'spark' AND b.tok = 'join'
      AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
    ORDER BY a.doc_id
    """,
)
def l3_span_near_query(spark, sf_dir):
    """L3 [ES parity]: ``span_near`` — `spark` then `join` in order
    with a cumulative gap budget of 2 (the legacy positional algebra
    behind sloppy proximity).  The span chain evaluates as nested
    array expressions over per-term position arrays — one codegen-span
    predicate, no explode; the oracle replays it as a positional
    self-join (operators/spans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return span_query(
        docs,
        {"span_near": {"clauses": [{"span_term": "spark"},
                                   {"span_term": "join"}],
                       "slop": 2, "in_order": True}},
    )


@register(
    "l3_span_first_query",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id FROM t
    WHERE list_contains(toks[1:3], 'spark')
    ORDER BY doc_id
    """,
)
def l3_span_first_query(spark, sf_dir):
    """L3 [ES parity]: ``span_first`` — `spark` within the first 3
    token positions (ES counts spans ending before ``end``); a pure
    prefix-slice predicate in both engines (operators/spans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return span_query(
        docs,
        {"span_first": {"match": {"span_term": "spark"}, "end": 3}},
    )


@register(
    "l3_span_not_query",
    f"""
    WITH {_SPAN_TOKS_CTE}
    SELECT DISTINCT a.doc_id FROM p a JOIN p b ON a.doc_id = b.doc_id
    WHERE a.tok = 'spark' AND b.tok = 'join'
      AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
      AND NOT EXISTS (
        SELECT 1 FROM p w
        WHERE w.doc_id = a.doc_id AND w.tok = 'window'
          AND w.pos >= a.pos AND w.pos <= b.pos
      )
    ORDER BY a.doc_id
    """,
)
def l3_span_not_query(spark, sf_dir):
    """L3 [ES parity]: ``span_not`` — the `spark .. join` near-spans
    that OVERLAP no `window` occurrence (ES default exclusion
    semantics); a document matches while at least one span survives
    the exclusion filter (operators/spans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    near = {"span_near": {"clauses": [{"span_term": "spark"},
                                      {"span_term": "join"}],
                          "slop": 2, "in_order": True}}
    return span_query(
        docs,
        {"span_not": {"include": near, "exclude": {"span_term": "window"}}},
    )


# ---------------------------------------------------------------------------
# ES SQL endpoint (_sql) + streaming script alerting
# ---------------------------------------------------------------------------

@register(
    "s26_sql_endpoint",
    """
    SELECT lang, count(*)::BIGINT AS n, max(n_chars)::BIGINT AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def s26_sql_endpoint(spark, sf_dir):
    """S-family [ES parity]: the ES SQL endpoint (``POST /_sql``) —
    SQL over an INDEX via the full lifecycle: bulk-load an index, run
    a read-only SELECT naming it, drop it.  The facade enforces ES
    SQL's read-only contract and the ``fetch_size`` cap; execution is
    Catalyst end-to-end (api.sql_query)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    name = f"sql_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, docs, name, id_col="doc_id")
    try:
        out = api.sql_query(
            spark,
            f"SELECT lang, count(*) AS n, max(CAST(n_chars AS BIGINT)) "
            f"AS max_chars FROM {name} GROUP BY lang ORDER BY lang",
        )
        rows = out.collect()
    finally:
        api.delete_index(spark, name)
    return spark.createDataFrame(rows, "lang string, n bigint, max_chars bigint")


@register(
    "st13_streaming_script_alert",
    """
    SELECT event_id, value * CAST(2.0 AS DOUBLE) AS score
    FROM events
    WHERE event_type = 'click' AND value * CAST(2.0 AS DOUBLE) > 150.0
    ORDER BY event_id
    """,
)
def st13_streaming_script_alert(spark, sf_dir):
    """§2.9 + scripting: script-driven ALERTING on a live stream — the
    events fixture replayed as 3 micro-batches, each event scored by a
    compiled script (`doc['value'].value * params.w`) and alerted past
    a threshold.  Stateless projection+filter => append mode emits
    each alert exactly once; the final alert set equals the batch
    filter, which the oracle replays (operators/scripting.py over a
    file-source stream)."""
    import shutil
    import tempfile

    from bigdatasearchpro_spark.streaming.pipelines import run_to_completion

    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="st13_src_")
    ck = tempfile.mkdtemp(prefix="st13_ck_")
    try:
        for i in range(3):
            (ev.filter(F.col("event_id") % 3 == i)
               .coalesce(1).write.mode("append").parquet(src))
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        scored = stream.withColumn(
            "score",
            script_score(stream, "doc['value'].value * params.w", {"w": 2}),
        )
        alerts = scored.filter(
            (F.col("event_type") == "click") & (F.col("score") > 150.0)
        ).select("event_id", "score")
        got = run_to_completion(alerts, checkpoint_dir=ck,
                                output_mode="append")
        rows = got.orderBy("event_id").collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(rows, "event_id bigint, score double")


# ---------------------------------------------------------------------------
# point-in-time search (consistent paging under concurrent mutation)
# ---------------------------------------------------------------------------

@register(
    "s27_point_in_time",
    """
    WITH half AS (SELECT * FROM documents WHERE doc_id % 2 = 0)
    SELECT 'pit' AS src, count(*)::BIGINT AS n FROM half
    UNION ALL
    SELECT 'live', count(*)::BIGINT FROM half WHERE lang <> 'de'
    ORDER BY src
    """,
)
def s27_point_in_time(spark, sf_dir):
    """S-family [ES parity]: point-in-time search — open a PIT on an
    index, MUTATE the live index underneath it (`_delete_by_query
    lang:de`), and observe that the PIT still serves the frozen view
    while live search sees the mutation; closing the PIT releases it.
    The freeze is one distributed snapshot write; PIT reads touch only
    the frozen files (api.open_pit / pit_dataframe / close_pit)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    name = f"pit_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), name, id_col="doc_id"
    )
    pit = None
    try:
        pit = api.open_pit(spark, name)
        api.delete_by_query(spark, name, "lang:de")
        n_pit = api.pit_dataframe(spark, pit).count()
        n_live = api.get_index_data_count(spark, name)
        rows = [("pit", n_pit), ("live", n_live)]
    finally:
        if pit is not None:
            assert api.close_pit(spark, pit) is True
            assert api.close_pit(spark, pit) is False
        api.delete_index(spark, name)
    return spark.createDataFrame(rows, "src string, n bigint").orderBy("src")


# ---------------------------------------------------------------------------
# BPE merge-table training (rows-only: iterative argmax loop)
# ---------------------------------------------------------------------------

@register("l5_bpe_train")
def l5_bpe_train(spark, sf_dir):
    """L5 [EXT] (rows-only by design — an ITERATIVE argmax loop, not
    SQL-expressible): learn a BPE merges table from the corpus
    (Sennrich et al. 2016) — per round: one vocab-sized pair-count
    hash agg, a 1-row argmax collect (count desc, pair lexicographic —
    deterministic under ties), one Arrow-batched greedy merge apply.
    The corpus is touched ONCE (the word-count agg); training runs on
    the vocabulary.  Pinned against a pure-python reference trainer in
    pytest (functions/bpe.py bpe_train)."""
    from bigdatasearchpro_spark.functions.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=6)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Curation pipeline v5: ExactSubstr clean -> CCNet rank on the CLEANED
# text -> keep head+middle -> per-(lang, bucket) summary
# ---------------------------------------------------------------------------

@register(
    "l5_pipeline_curation_v5",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id, i AS wpos, array_to_string(toks[i+1 : i+8], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(range(0, greatest(len(toks) - 7, 0))) AS i
            FROM t)
    ),
    d AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT w.doc_id, w.wpos + j.j AS tpos
      FROM w JOIN d USING (win)
      CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
    ),
    tok AS (
      SELECT doc_id, tpos, toks[tpos + 1] AS tok
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS tpos FROM t)
    ),
    kept AS (
      SELECT tok.doc_id, tok.tpos, tok.tok
      FROM tok LEFT JOIN cov
        ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
      WHERE cov.doc_id IS NULL
    ),
    clean AS (
      SELECT t.doc_id,
             coalesce(k.nk, 0)::BIGINT AS n_clean_tokens,
             coalesce(k.ct, '') AS clean_text
      FROM t LEFT JOIN (
        SELECT doc_id, count(*) AS nk,
               string_agg(tok, ' ' ORDER BY tpos) AS ct
        FROM kept GROUP BY doc_id
      ) k ON t.doc_id = k.doc_id
    ),
    ct AS (
      SELECT c.doc_id, d2.lang, c.n_clean_tokens,
             list_filter(string_split_regex(lower(c.clean_text),
                         '[^a-z0-9]+'), x -> x <> '') AS ctoks
      FROM clean c JOIN documents d2 ON c.doc_id = d2.doc_id
    ),
    bi AS (
      SELECT doc_id, ctoks[i] AS a, ctoks[i+1] AS b
      FROM ct, LATERAL (
        SELECT unnest(range(1, greatest(len(ctoks) - 1, 0) + 1)) AS i
      )
    ),
    c2 AS (SELECT a, b, count(*) AS n2 FROM bi GROUP BY a, b),
    c1 AS (SELECT a, count(*) AS n1 FROM bi GROUP BY a),
    sc AS (
      SELECT bi.doc_id,
             round(avg(ln(c2.n2::DOUBLE / c1.n1)), 4) AS avg_logprob
      FROM bi JOIN c2 ON bi.a = c2.a AND bi.b = c2.b
              JOIN c1 ON bi.a = c1.a
      GROUP BY bi.doc_id
    ),
    ranked AS (
      SELECT ct.doc_id, ct.lang, ct.n_clean_tokens,
             ntile(3) OVER (PARTITION BY ct.lang
                            ORDER BY sc.avg_logprob DESC NULLS LAST,
                                     ct.doc_id ASC) AS tile
      FROM ct LEFT JOIN sc ON ct.doc_id = sc.doc_id
    )
    SELECT lang,
           CASE tile WHEN 1 THEN 'head' ELSE 'middle' END AS bucket,
           count(*)::BIGINT AS n_docs,
           sum(n_clean_tokens)::BIGINT AS sum_tokens,
           min(doc_id)::BIGINT AS min_id,
           max(doc_id)::BIGINT AS max_id
    FROM ranked
    WHERE tile <= 2
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def l5_pipeline_curation_v5(spark, sf_dir):
    """L5 [EXT]: composed curation pipeline v5 — (1) ExactSubstr dedup
    cleans duplicated passages at any alignment, (2) the corpus bigram
    LM rescores fluency ON THE CLEANED TEXT (dedup before LM scoring —
    the CCNet ordering: duplicated boilerplate would otherwise inflate
    its own probability), (3) per-language head+middle thirds survive
    (tail dropped), (4) one per-(lang, bucket) summary.  ONE composed
    DuckDB oracle replays all four stages
    (curation.substring_dedup -> curation.ccnet_buckets)."""
    from bigdatasearchpro_spark.operators.curation import (
        ccnet_buckets,
        substring_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    clean = substring_dedup(docs, window_tokens=8, min_count=2).select(
        "doc_id", F.col("clean_text")
    )
    # The cleaned corpus feeds FOUR plan consumers (the bigram-LM
    # scorer's two input references, the bucket join-back, and the
    # token-count join): unpersisted, the ExactSubstr trunk — window
    # explode + duplicate-window agg + cover reassembly — re-ran once
    # per consumer (plan showed 8 SortMergeJoins with 4 trunk copies).
    # Persist + compute the (small, lang x bucket) summary eagerly so
    # the cache releases before return — l5_pipeline_end_to_end's
    # pattern.
    cleaned_docs = clean.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", F.col("clean_text").alias("text")).persist()
    try:
        buckets = ccnet_buckets(cleaned_docs)
        toks = F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        )
        survivors = (
            buckets.filter(F.col("bucket") != "tail")
            .join(cleaned_docs.select("doc_id",
                                      F.size(toks).alias("n_clean_tokens")),
                  "doc_id")
        )
        out = (
            survivors.groupBy("lang", "bucket")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_clean_tokens").alias("sum_tokens"),
                F.min("doc_id").alias("min_id"),
                F.max("doc_id").alias("max_id"),
            )
            .orderBy("lang", "bucket")
        )
        rows, schema = out.collect(), out.schema
    finally:
        cleaned_docs.unpersist()
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# linear retriever (ES 8.x weighted minmax-normalized fusion)
# ---------------------------------------------------------------------------

def _linear_retriever_oracle() -> str:
    from bigdatasearchpro_spark.registry import ORACLES
    from bigdatasearchpro_spark.registry_ext import _RANGE_QUERY_INTS

    bm25_50 = ORACLES["l3_search_bm25_topk"].replace("LIMIT 10", "LIMIT 50")
    qlist = "[" + ",".join(str(v) for v in _RANGE_QUERY_INTS) + "]"
    return f"""
    WITH tpage AS (SELECT * FROM ({bm25_50})),
    tb AS (SELECT min(score) AS lo, max(score) AS hi FROM tpage),
    tn AS (
      SELECT doc_id,
             CASE WHEN tb.hi > tb.lo
                  THEN (score - tb.lo) / (tb.hi - tb.lo)
                  ELSE CAST(1 AS DOUBLE) END AS norm_text
      FROM tpage CROSS JOIN tb
    ),
    v AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding, x -> abs(x)))::DOUBLE,
                      0) AS amax
      FROM embeddings
    ),
    qt AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> greatest(-127, least(127, floor(x::DOUBLE /
                      (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END)
                      + 0.5)))::BIGINT) AS q
      FROM v
    ),
    vsc AS (
      SELECT vec_id,
             list_sum([q[i] * ({qlist})[i]
                       for i in generate_series(1, 64)])::BIGINT AS dot,
             list_sum(list_transform(q, x -> x * x))::BIGINT AS n
      FROM qt
    ),
    vpage AS (
      SELECT vec_id, dot::DOUBLE / sqrt(n::DOUBLE) AS cos
      FROM vsc WHERE n > 0
      ORDER BY cos DESC, vec_id ASC LIMIT 50
    ),
    vb AS (SELECT min(cos) AS lo, max(cos) AS hi FROM vpage),
    vn AS (
      SELECT vec_id,
             CASE WHEN vb.hi > vb.lo
                  THEN (cos - vb.lo) / (vb.hi - vb.lo)
                  ELSE CAST(1 AS DOUBLE) END AS norm_vec
      FROM vpage CROSS JOIN vb
    )
    SELECT coalesce(tn.doc_id, vn.vec_id) AS doc_id,
           tn.norm_text, vn.norm_vec,
           coalesce(tn.norm_text, CAST(0 AS DOUBLE)) * CAST(0.75 AS DOUBLE)
           + coalesce(vn.norm_vec, CAST(0 AS DOUBLE)) * CAST(0.25 AS DOUBLE)
             AS score
    FROM tn FULL OUTER JOIN vn ON tn.doc_id = vn.vec_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """


@register("l4_linear_retriever", _linear_retriever_oracle())
def l4_linear_retriever(spark, sf_dir):
    """L4+L3 hybrid: the ES 8.x ``linear`` retriever — weighted sum of
    per-leg MINMAX-normalized scores (BM25 x0.75 + int8 cosine x0.25;
    power-of-two weights keep the multiplies exact) over 50-hit
    windows, absent legs contributing 0.  Same two single-scan
    TakeOrdered legs as RRF; min/max are one-row page aggregates
    broadcast into the normalize projection
    (operators/hybrid.py linear_hybrid_topk)."""
    from bigdatasearchpro_spark.operators.hybrid import linear_hybrid_topk
    from bigdatasearchpro_spark.registry_ext import _RANGE_QUERY_INTS
    from bigdatasearchpro_spark.registry_text import SEARCH_QUERY

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return linear_hybrid_topk(
        docs, emb, SEARCH_QUERY, _RANGE_QUERY_INTS, k=10, window=50
    )


# ---------------------------------------------------------------------------
# cross-cluster search (remote alias:index resolution)
# ---------------------------------------------------------------------------

@register(
    "s28_cross_cluster_search",
    """
    WITH t AS (
      SELECT doc_id, n_chars,
             list_filter(string_split_regex(lower(concat_ws(' ',
                 coalesce(text, ''), coalesce(lang, ''),
                 coalesce(source, ''))), '[^a-z0-9]+'),
                 x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, n_chars AS sort_n_chars FROM t
    WHERE list_contains(toks, 'spark')
    ORDER BY sort_n_chars DESC, doc_id ASC
    LIMIT 10
    """,
)
def s28_cross_cluster_search(spark, sf_dir):
    """S-family [ES parity]: cross-cluster search — `alias:index`
    resolves through a registered remote cluster (ES
    ``cluster.remote.{alias}.seeds``) and the query runs against the
    remote table IN PLACE (no copy — the CCS point; here the remote is
    a second lake root read directly).  The search itself is the same
    native path as local search: field sort, top-k heap
    (api.register_remote_cluster / resolve_index)."""
    from bigdatasearchpro_spark import api

    api.register_remote_cluster(spark, "lake", sf_dir)
    return api.query_data(
        spark, "spark", "lake:documents", k=10, sort="n_chars:desc"
    )


# ---------------------------------------------------------------------------
# completion suggester with contexts
# ---------------------------------------------------------------------------

@register(
    "l3_suggest_completion_context",
    """
    WITH v AS (
      SELECT term, count(*) AS doc_freq FROM (
        SELECT doc_id, unnest(list_distinct(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')))
            AS term
        FROM documents WHERE lang = 'en'
      ) GROUP BY term
    )
    SELECT term AS suggestion, doc_freq::BIGINT AS doc_freq FROM v
    WHERE term LIKE 's%'
    ORDER BY doc_freq DESC, suggestion ASC
    LIMIT 5
    """,
)
def l3_suggest_completion_context(spark, sf_dir):
    """L3 [ES parity]: ``completion`` suggester with CONTEXTS — the
    `s`-prefix suggestions restricted to the lang='en' slice, weights
    (doc frequency) computed WITHIN the slice (the per-language
    keyboard case).  The context predicate pushes into the scan BEFORE
    the vocabulary explode (operators/suggest.py
    completion_suggester_context)."""
    from bigdatasearchpro_spark.operators import suggest

    docs = load_table(spark, sf_dir, "documents")
    return suggest.completion_suggester_context(
        docs, "s", {"lang": "en"}, size=5
    )


# ---------------------------------------------------------------------------
# custom routing (shard-partitioned index + pruned routed search)
# ---------------------------------------------------------------------------

@register(
    "s29_routed_search",
    """
    WITH t AS (
      SELECT doc_id::VARCHAR AS doc_id, n_chars::VARCHAR AS n_chars,
             list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'),
                         x -> x <> '') AS ltoks,
             list_filter(string_split_regex(lower(concat_ws(' ',
                 coalesce(doc_id::VARCHAR, ''), coalesce(text, ''),
                 coalesce(lang, ''), coalesce(source, ''),
                 coalesce(n_chars::VARCHAR, ''))),
                 '[^a-z0-9]+'), x -> x <> '') AS atoks
      FROM documents
    )
    SELECT doc_id, n_chars AS sort_n_chars FROM t
    WHERE list_contains(ltoks, 'en') AND list_contains(atoks, 'spark')
    ORDER BY sort_n_chars DESC, doc_id ASC
    LIMIT 10
    """,
)
def s29_routed_search(spark, sf_dir):
    """S-family [ES parity]: custom ROUTING — the index is written
    PARTITIONED by ``pmod(xxhash64(lang), 4)`` (the ES routing-hash
    shard), and ``?routing=en`` prunes the search scan to that one
    shard directory (partition pruning — the reason custom routing
    exists at 100 TB: one shard instead of a fan-out).  The query
    re-filters inside the shard like ES, so the routed result equals
    the unrouted one — which is what the oracle replays; the pruning
    itself is plan-gated in pytest
    (sinks/bulk.py routing write; api.apply_routing)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    name = f"routed_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs, name, id_col="doc_id", routing_col="lang", n_shards=4
    )
    try:
        hits = api.query_data(
            spark, "lang:en AND spark", name, k=10,
            sort="n_chars:desc", routing="en",
        )
        rows = hits.collect()
    finally:
        api.delete_index(spark, name)
    return spark.createDataFrame(
        rows, "doc_id string, sort_n_chars string"
    )


# ---------------------------------------------------------------------------
# ingest pipelines (index-time processor chains)
# ---------------------------------------------------------------------------

@register(
    "s30_ingest_pipeline",
    """
    WITH enriched AS (
      SELECT lower(c.c_mktsegment) AS segment, n.n_name AS nation,
             CAST(floor(CAST(c.c_acctbal AS DOUBLE)
                        * CAST(100.0 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS acctbal_cents
      FROM customer c LEFT JOIN nation n
        ON c.c_nationkey = n.n_nationkey
    )
    SELECT segment, nation,
           count(*)::BIGINT AS n,
           sum(acctbal_cents)::BIGINT AS sum_cents
    FROM enriched
    GROUP BY segment, nation
    ORDER BY segment, nation
    """,
)
def s30_ingest_pipeline(spark, sf_dir):
    """S-family [ES parity]: ingest pipelines (``_ingest/pipeline``) —
    a stored processor chain (lowercase + script + ENRICH, the ES
    enrich-policy lookup join referencing an index by name) applied at
    bulk time via ``?pipeline=``: the document model the reference
    hand-rolled in Java is one stored pipeline here.  Column
    processors fold into the write projection (zero extra passes);
    enrich is ONE broadcast join against the policy index
    (operators/ingest.py; api.put_ingest_pipeline)."""
    import uuid

    from bigdatasearchpro_spark import api

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    tag = uuid.uuid4().hex[:8]
    lookup_idx = f"ingest_nations_{tag}"
    out_idx = f"ingest_out_{tag}"
    pid = f"cust-pipeline-{tag}"
    # the enrich policy index must hold the TYPED lookup (a bulk index
    # would stringify it; create the marked table directly)
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    bulk_index_table(nat, lookup_idx)
    api.put_ingest_pipeline(
        spark,
        pid,
        [
            {"lowercase": {"field": "c_mktsegment"}},
            {"rename": {"field": "c_mktsegment", "target_field": "segment"}},
            {"script": {
                "source": "Math.floor(doc['c_acctbal'].value * params.s"
                          " + params.h)",
                "params": {"s": 100, "h": 0.5},
                "target_field": "acctbal_cents",
            }},
            {"convert": {"field": "acctbal_cents", "type": "long"}},
            {"enrich": {"index": lookup_idx, "match_field": "c_nationkey",
                        "target_fields": ["nation"]}},
            {"remove": {"field": "c_name"}},
        ],
    )
    try:
        api.bulk_data_to_index(
            spark, cust, out_idx, id_col="c_custkey", pipeline=pid
        )
        out = api.sql_query(
            spark,
            f"SELECT segment, nation, count(*) AS n, "
            f"sum(CAST(acctbal_cents AS BIGINT)) AS sum_cents "
            f"FROM {out_idx} GROUP BY segment, nation "
            f"ORDER BY segment, nation",
        )
        rows = out.collect()
    finally:
        assert api.delete_ingest_pipeline(spark, pid)
        api.delete_index(spark, lookup_idx)
        api.delete_index(spark, out_idx)
    return spark.createDataFrame(
        rows, "segment string, nation string, n bigint, sum_cents bigint"
    )


# ---------------------------------------------------------------------------
# children aggregation + frequent_item_sets
# ---------------------------------------------------------------------------

@register(
    "l3_agg_children",
    """
    SELECT o.o_orderpriority AS priority,
           count(*)::BIGINT AS n_children,
           sum(l.l_quantity) AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY priority
    ORDER BY priority
    """,
)
def l3_agg_children(spark, sf_dir):
    """L3 [ES parity]: ``children`` aggregation over the `join` field —
    parent buckets (orders by priority) each aggregating their
    lineitem CHILDREN (count + exact integral-quantity sum).  One key
    join carrying only (key, bucket) from the parent side + ONE hash
    aggregate on the bucket (operators/parentchild.py children_agg)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = parentchild.children_agg(
        orders,
        li,
        "o_orderkey",
        "o_orderpriority",
        [F.count(F.lit(1)).alias("n_children"),
         F.sum("l_quantity").alias("sum_qty")],
        child_on="l_orderkey",
    )
    return out.select(
        F.col("o_orderpriority").alias("priority"), "n_children", "sum_qty"
    ).orderBy("priority")


@register(
    "l3_agg_frequent_item_sets",
    """
    WITH rows_ AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    fi AS (
      SELECT i FROM rows_ GROUP BY i HAVING count(*) >= 3
    ),
    pruned AS (SELECT r.b, r.i FROM rows_ r JOIN fi ON r.i = fi.i),
    pairs AS (
      SELECT a.i AS item_a, b2.i AS item_b
      FROM pruned a JOIN pruned b2 ON a.b = b2.b AND a.i < b2.i
    )
    SELECT item_a, item_b, count(*)::BIGINT AS support
    FROM pairs
    GROUP BY item_a, item_b
    HAVING count(*) >= 3
    ORDER BY support DESC, item_a ASC, item_b ASC
    LIMIT 10
    """,
)
def l3_agg_frequent_item_sets(spark, sf_dir):
    """L3 [ES parity]: ``frequent_item_sets`` aggregation (ES 8.4+),
    the 2-itemset form — part PAIRS co-occurring in >= 3 orders
    (market-basket mining).  The Apriori property does the scale work:
    frequent ITEMS are found first and baskets semi-join to them
    BEFORE the pair self-join, so the quadratic step runs only over
    qualifying basket width (operators/aggs.py
    frequent_item_sets_agg)."""
    from bigdatasearchpro_spark.operators import aggs

    li = load_table(spark, sf_dir, "lineitem")
    return aggs.frequent_item_sets_agg(
        li, "l_orderkey", "l_partkey", min_support=3, size=10
    )


# ---------------------------------------------------------------------------
# categorize_text aggregation (log declustering)
# ---------------------------------------------------------------------------

@register(
    "l3_agg_categorize_text",
    """
    WITH msg AS (
      SELECT event_type || ' user=' || user_id::VARCHAR
             || ' v=' || CAST(floor(value) AS BIGINT)::VARCHAR
             || ' ' || props AS m
      FROM events
    )
    SELECT regexp_replace(m, '[0-9]+(\\.[0-9]+)?', '#', 'g') AS category,
           count(*)::BIGINT AS doc_count
    FROM msg
    GROUP BY category
    ORDER BY doc_count DESC, category ASC
    LIMIT 10
    """,
)
def l3_agg_categorize_text(spark, sf_dir):
    """L3 [ES parity]: ``categorize_text`` aggregation — log messages
    (synthesized here from the events row: type + user + value +
    props) grouped by their number-masked token SKELETON, the
    deterministic core of ES's ML log categorizer.  One masking
    expression + ONE hash agg (operators/aggs.py
    categorize_text_agg)."""
    from bigdatasearchpro_spark.operators import aggs

    ev = load_table(spark, sf_dir, "events")
    msg = ev.select(
        F.concat(
            F.col("event_type"), F.lit(" user="),
            F.col("user_id").cast("string"), F.lit(" v="),
            F.floor("value").cast("bigint").cast("string"),
            F.lit(" "), F.col("props"),
        ).alias("m")
    )
    return aggs.categorize_text_agg(msg, "m", size=10)


# ---------------------------------------------------------------------------
# EQL sequence detection
# ---------------------------------------------------------------------------

@register(
    "l3_eql_sequence",
    """
    WITH s1 AS (SELECT user_id AS by_, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'),
    s2 AS (SELECT user_id AS by_, ts AS ts_2, event_id AS id_2
           FROM events WHERE event_type = 'click'),
    s3 AS (SELECT user_id AS by_, ts AS ts_3, event_id AS id_3
           FROM events WHERE event_type = 'purchase'),
    c2 AS (
      SELECT by_, ts_1, id_1, ts_2, id_2 FROM (
        SELECT s1.by_, s1.ts_1, s1.id_1, s2.ts_2, s2.id_2,
               row_number() OVER (PARTITION BY s1.by_, s1.ts_1, s1.id_1
                                  ORDER BY s2.ts_2, s2.id_2) AS rn
        FROM s1 JOIN s2 ON s1.by_ = s2.by_
         AND s2.ts_2 > s1.ts_1
         AND date_diff('second', s1.ts_1, s2.ts_2) <= 259200
      ) WHERE rn = 1
    ),
    c3 AS (
      SELECT by_, ts_1, id_1, ts_2, id_2, ts_3, id_3 FROM (
        SELECT c2.*, s3.ts_3, s3.id_3,
               row_number() OVER (PARTITION BY c2.by_, c2.ts_1, c2.id_1,
                                               c2.ts_2, c2.id_2
                                  ORDER BY s3.ts_3, s3.id_3) AS rn
        FROM c2 JOIN s3 ON c2.by_ = s3.by_
         AND s3.ts_3 > c2.ts_2
         AND date_diff('second', c2.ts_1, s3.ts_3) <= 259200
      ) WHERE rn = 1
    )
    SELECT by_ AS user_id, ts_1, id_1, ts_2, id_2, ts_3, id_3
    FROM c3 ORDER BY user_id, ts_1, id_1
    """,
)
def l3_eql_sequence(spark, sf_dir):
    """L3 [ES parity]: EQL ``sequence by user_id [view] [click]
    [purchase] within 3d`` (``_eql/search``, the security-analytics
    language) — per-user ordered 3-step funnels whose total span fits
    the window, HEAD-matched (each partial chain extends with its
    EARLIEST qualifying next event; ties by event id — deterministic
    and exactly what the oracle's rn=1 window replays).  Each step is
    a pushed filter over the same scan; chain extensions are
    entity-key joins with banded time predicates + one min-struct agg
    (operators/eql.py eql_sequence)."""
    from bigdatasearchpro_spark.operators.eql import eql_sequence

    ev = load_table(spark, sf_dir, "events")
    return eql_sequence(
        ev,
        [{"event_type": "view"}, {"event_type": "click"},
         {"event_type": "purchase"}],
        by="user_id",
        within_seconds=259200,
    )


@register(
    "l3_eql_until",
    """
    WITH s1 AS (SELECT user_id AS by_, ts AS ts_1, event_id AS id_1
                FROM events WHERE event_type = 'view'),
    s2 AS (SELECT user_id AS by_, ts AS ts_2, event_id AS id_2
           FROM events WHERE event_type = 'click'),
    s3 AS (SELECT user_id AS by_, ts AS ts_3, event_id AS id_3
           FROM events WHERE event_type = 'purchase'),
    c2 AS (
      SELECT by_, ts_1, id_1, ts_2, id_2 FROM (
        SELECT s1.by_, s1.ts_1, s1.id_1, s2.ts_2, s2.id_2,
               row_number() OVER (PARTITION BY s1.by_, s1.ts_1, s1.id_1
                                  ORDER BY s2.ts_2, s2.id_2) AS rn
        FROM s1 JOIN s2 ON s1.by_ = s2.by_
         AND s2.ts_2 > s1.ts_1
         AND date_diff('second', s1.ts_1, s2.ts_2) <= 259200
      ) WHERE rn = 1
    ),
    c3 AS (
      SELECT by_, ts_1, id_1, ts_2, id_2, ts_3, id_3 FROM (
        SELECT c2.*, s3.ts_3, s3.id_3,
               row_number() OVER (PARTITION BY c2.by_, c2.ts_1, c2.id_1,
                                               c2.ts_2, c2.id_2
                                  ORDER BY s3.ts_3, s3.id_3) AS rn
        FROM c2 JOIN s3 ON c2.by_ = s3.by_
         AND s3.ts_3 > c2.ts_2
         AND date_diff('second', c2.ts_1, s3.ts_3) <= 259200
      ) WHERE rn = 1
    )
    SELECT by_ AS user_id, ts_1, id_1, ts_2, id_2, ts_3, id_3
    FROM c3
    WHERE NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c3.by_
          AND e.ts > c3.ts_1 AND e.ts < c3.ts_2)
      AND NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'signup' AND e.user_id = c3.by_
          AND e.ts > c3.ts_1 AND e.ts < c3.ts_3)
    ORDER BY user_id, ts_1, id_1
    """,
)
def l3_eql_until(spark, sf_dir):
    """L3 [ES parity]: EQL ``sequence by user_id [view] ![error]
    [click] [purchase] until [signup] within 3d`` — the r7-verdict
    gap #4: real detection rules use ``until`` (an expiry event kills
    in-flight sequences) and missing-event ``![...]`` steps (no
    matching event between the surrounding steps).  Both are banded
    ANTI-joins on the entity key over the head-matched funnel
    (operators/eql.py): the negation bands (ts_1, ts_2), the until
    band (ts_1, ts_3), strict bounds.  The oracle extends the funnel
    replay with two NOT EXISTS probes — semantics hash-verified, not
    just row counts."""
    from bigdatasearchpro_spark.operators.eql import eql_sequence

    ev = load_table(spark, sf_dir, "events")
    return eql_sequence(
        ev,
        [{"event_type": "view"}, {"not": {"event_type": "error"}},
         {"event_type": "click"}, {"event_type": "purchase"}],
        by="user_id",
        within_seconds=259200,
        until={"event_type": "signup"},
    )


# ---------------------------------------------------------------------------
# transforms (_transform pivot -> dest index)
# ---------------------------------------------------------------------------

@register(
    "s31_transform_pivot",
    """
    SELECT o_orderpriority AS priority,
           count(o_orderkey)::BIGINT AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY priority
    ORDER BY priority
    """,
)
def s31_transform_pivot(spark, sf_dir):
    """S-family [ES parity]: Transforms (``_transform``) — a stored
    PIVOT job materializing an entity-centric summary index from a
    source index: PUT validates the spec, ``_start`` runs ONE hash
    aggregate and overwrites the dest (the checkpoint contract), and
    the dest is a first-class searchable index.  Continuous mode maps
    to the streaming ring's foreachBatch CDC apply; the batch
    checkpoint is what this entry verifies end-to-end
    (api.put_transform / start_transform)."""
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    orders = load_table(spark, sf_dir, "orders")
    tag = uuid.uuid4().hex[:8]
    src_idx, dest_idx, tid = (
        f"tf_src_{tag}", f"tf_dest_{tag}", f"tf-{tag}",
    )
    bulk_index_table(orders, src_idx)  # typed source index
    api.put_transform(
        spark, tid,
        source=src_idx, dest=dest_idx,
        pivot={
            "group_by": {"priority": "o_orderpriority"},
            "aggregations": {
                "n_orders": {"value_count": "o_orderkey"},
                "min_price": {"min": "o_totalprice"},
                "max_price": {"max": "o_totalprice"},
            },
        },
    )
    try:
        stats = api.start_transform(spark, tid)
        assert stats["docs_indexed"] > 0
        out = api.sql_query(
            spark,
            f"SELECT priority, n_orders, min_price, max_price "
            f"FROM {dest_idx} ORDER BY priority",
        )
        rows = out.collect()
    finally:
        assert api.delete_transform(spark, tid)
        api.delete_index(spark, src_idx)
        api.delete_index(spark, dest_idx)
    return spark.createDataFrame(
        rows,
        "priority string, n_orders bigint, min_price double, "
        "max_price double",
    )


@register(
    "s49_rollup_job",
    """
    SELECT time_bucket(INTERVAL '6 hours', ts) AS ts_bucket,
           event_type,
           min(value) AS value_min,
           max(value) AS value_max,
           count(value)::BIGINT AS value_value_count,
           CAST(sum(user_id) AS BIGINT) AS user_id_sum
    FROM events
    GROUP BY ts_bucket, event_type
    ORDER BY ts_bucket, event_type
    """,
)
def s49_rollup_job(spark, sf_dir):
    """S-family [ES parity]: X-Pack rollup jobs (``_rollup/job``) —
    PUT stores + config-validates the job (groups: date_histogram
    fixed_interval 6h + terms on event_type; metrics per field),
    ``_start`` materializes the rollup index through the SAME pivot
    engine as the transforms (api.py start_transform: one map-side-
    combinable hash aggregate -> bulk_index_table overwrite), the
    rollup index is first-class searchable, a started job refuses
    DELETE until stopped (the ES lifecycle), and the result is
    hash-verified against the pivot oracle.  min/max/value_count/
    integral-sum only in the fixture — double SUM is combine-order-
    dependent (the engine-wide exactness rule)
    (api.put_rollup_job / start_rollup_job)."""
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    events = load_table(spark, sf_dir, "events")
    tag = uuid.uuid4().hex[:8]
    src_idx, ru_idx, jid = f"ru_src_{tag}", f"ru_dest_{tag}", f"ru-{tag}"
    bulk_index_table(events, src_idx)  # typed source index
    api.put_rollup_job(
        spark, jid,
        index_pattern=src_idx, rollup_index=ru_idx,
        groups={
            "date_histogram": {"field": "ts", "fixed_interval": "6h"},
            "terms": {"fields": ["event_type"]},
        },
        metrics=[
            {"field": "value", "metrics": ["min", "max", "value_count"]},
            {"field": "user_id", "metrics": ["sum"]},
        ],
    )
    try:
        stats = api.start_rollup_job(spark, jid)
        assert stats["rollup_docs"] > 0 and stats["status"] == "started"
        # ES lifecycle: a started job refuses delete
        try:
            api.delete_rollup_job(spark, jid)
            raise AssertionError("started rollup job must refuse delete")
        except ValueError:
            pass
        api.stop_rollup_job(spark, jid)
        out = api.sql_query(
            spark,
            f"SELECT ts_bucket, event_type, value_min, value_max, "
            f"value_value_count, user_id_sum FROM {ru_idx} "
            f"ORDER BY ts_bucket, event_type",
        )
        rows = out.collect()
    finally:
        # force-stop first: if the body failed between _start and _stop
        # the job is still "started" and delete would raise, masking
        # the original error
        if api.get_rollup_job(spark, jid) is not None:
            api.stop_rollup_job(spark, jid)
            assert api.delete_rollup_job(spark, jid)
        api.delete_index(spark, src_idx)
        api.delete_index(spark, ru_idx)
    return spark.createDataFrame(
        rows,
        "ts_bucket timestamp, event_type string, value_min double, "
        "value_max double, value_value_count bigint, user_id_sum bigint",
    )


@register(
    "s51_rollup_search",
    """
    SELECT time_bucket(INTERVAL '12 hours', ts) AS ts_bucket,
           event_type,
           CAST(sum(user_id) AS BIGINT) AS user_id_sum,
           count(user_id)::BIGINT AS n_events,
           CAST(sum(user_id) AS DOUBLE) / count(user_id) AS user_id_avg,
           min(value) AS value_min,
           max(value) AS value_max
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY ts_bucket, event_type
    ORDER BY ts_bucket, event_type
    """,
)
def s51_rollup_search(spark, sf_dir):
    """S-family [ES parity]: ``_rollup_search`` — a LIVE agg request
    against a rollup index, rewritten onto the pre-aggregated columns
    (sum->sum(f_sum), value_count->sum(f_value_count), avg->
    sum(f_sum)/sum(f_value_count) exactly as ES recombines its stored
    (sum, count) pair, terms query on a grouped field).  The job rolls
    at 6h; the search asks for 12h — re-bucketing the stored buckets,
    never the raw data — and the oracle aggregates the RAW table at
    12h: searching the rollup must equal aggregating the raw data.
    The ONE hash aggregate runs over the rollup index, which is
    |buckets| rows, not |raw| — the entire point of rollups at 100 TB
    (api.rollup_search; avg stays float-deterministic because the
    engine divides two exact integers once, job capture
    sum+value_count on a BIGINT field)."""
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    events = load_table(spark, sf_dir, "events")
    tag = uuid.uuid4().hex[:8]
    src_idx, ru_idx, jid = f"rs_src_{tag}", f"rs_dest_{tag}", f"rs-{tag}"
    bulk_index_table(events, src_idx)  # typed source index
    api.put_rollup_job(
        spark, jid,
        index_pattern=src_idx, rollup_index=ru_idx,
        groups={
            "date_histogram": {"field": "ts", "fixed_interval": "6h"},
            "terms": {"fields": ["event_type"]},
        },
        metrics=[
            {"field": "user_id", "metrics": ["sum", "value_count"]},
            {"field": "value", "metrics": ["min", "max"]},
        ],
    )
    try:
        api.start_rollup_job(spark, jid)
        out = api.rollup_search(
            spark, ru_idx,
            date_histogram={"field": "ts", "fixed_interval": "12h"},
            terms=["event_type"],
            metrics={
                "user_id_sum": ("sum", "user_id"),
                "n_events": ("value_count", "user_id"),
                "user_id_avg": ("avg", "user_id"),
                "value_min": ("min", "value"),
                "value_max": ("max", "value"),
            },
            query={"terms": {"event_type": ["click", "purchase"]}},
        )
        rows = out.orderBy("ts_bucket", "event_type").collect()
    finally:
        if api.get_rollup_job(spark, jid) is not None:
            api.stop_rollup_job(spark, jid)
            assert api.delete_rollup_job(spark, jid)
        api.delete_index(spark, src_idx)
        api.delete_index(spark, ru_idx)
    return spark.createDataFrame(
        rows,
        "ts_bucket timestamp, event_type string, user_id_sum bigint, "
        "n_events bigint, user_id_avg double, value_min double, "
        "value_max double",
    )


@register(
    "s50_slm_policy",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'de'
    ORDER BY doc_id
    """,
)
def s50_slm_policy(spark, sf_dir):
    """S-family [ES parity]: X-Pack SLM (``_slm/policy``) — snapshot
    scheduling metadata over the existing snapshot machinery: PUT
    stores + validates the policy (repo, ``*``-glob index patterns,
    cron, name template, count retention), ``_execute`` resolves the
    globs against the LIVE index list and snapshots each match
    (api.snapshot_index — one distributed write, settings manifests
    included), count-based retention deletes the oldest snapshot
    whole, and the surviving snapshot restores to a hash-identical
    index (api.put_slm_policy / execute_slm_policy /
    restore_index)."""
    import os
    import shutil
    import tempfile
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    idx, restored, pid = f"slm_src_{tag}", f"slm_rest_{tag}", f"slm-{tag}"
    repo = tempfile.mkdtemp(prefix="slm_repo_")
    bulk_index_table(
        docs.filter(F.col("lang") == "de")
        .select("doc_id", "lang", "n_chars"), idx)
    api.put_slm_policy(
        spark, pid, repository=repo, indices=[f"slm_src_{tag[:4]}*"],
        retention_max_count=1)
    try:
        first = api.execute_slm_policy(spark, pid)
        assert first["indices"] == [idx] and not first["deleted"]
        second = api.execute_slm_policy(spark, pid)
        # count retention: the first snapshot aged out WHOLE
        assert second["deleted"] == [first["snapshot"]]
        api.restore_index(
            spark, os.path.join(repo, second["snapshot"]), idx,
            rename_to=restored)
        out = api.sql_query(
            spark,
            f"SELECT doc_id, lang, n_chars FROM {restored} "
            f"ORDER BY doc_id",
        )
        rows = out.collect()
    finally:
        assert api.delete_slm_policy(spark, pid)
        api.delete_index(spark, idx)
        api.delete_index(spark, restored)
        shutil.rmtree(repo, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_chars bigint")


# ---------------------------------------------------------------------------
# leakage-safe dataset split (cluster-level hashing)
# ---------------------------------------------------------------------------

@register(
    "l5_leakage_safe_split",
    """
    WITH g AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ),
    gmin AS (SELECT h, min(doc_id) AS group_id FROM g GROUP BY h),
    assigned AS (
      SELECT g.doc_id, gmin.group_id FROM g JOIN gmin ON g.h = gmin.h
    )
    SELECT doc_id, group_id,
           CASE WHEN ('0x' || substring(md5(group_id::VARCHAR), 1, 15))::BIGINT
                     % 100 < 10 THEN 'val'
                WHEN ('0x' || substring(md5(group_id::VARCHAR), 1, 15))::BIGINT
                     % 100 < 20 THEN 'test'
                ELSE 'train' END AS split
    FROM assigned
    ORDER BY doc_id
    """,
)
def l5_leakage_safe_split(spark, sf_dir):
    """L5 [EXT]: leakage-safe train/val/test split — the split hash
    runs over the duplicate-CLUSTER id (exact-text clusters here:
    group = min id per content hash; the near-dup-safe form plugs
    resolve_duplicate_groups in as the cluster table), so duplicated
    documents can never straddle splits — the eval-contamination guard
    a plain id-hash split lacks.  One hash agg + key join for cluster
    assignment; the split itself stays the portable pure projection
    (operators/curation.py leakage_safe_split)."""
    from bigdatasearchpro_spark.operators.curation import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# length-bucketed batching (padding-minimizing serving layout)
# ---------------------------------------------------------------------------

@register(
    "l5_length_bucketed_batches",
    r"""
    WITH t AS (
      SELECT lang AS shard, doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT shard, doc_id, n_tokens,
             ((row_number() OVER (PARTITION BY shard
                                  ORDER BY n_tokens ASC, doc_id ASC) - 1)
              // 32)::BIGINT AS batch_id
      FROM t
    )
    SELECT shard, batch_id,
           count(*)::BIGINT AS n_docs,
           max(n_tokens)::BIGINT AS max_tokens,
           sum(n_tokens)::BIGINT AS sum_tokens,
           (count(*) * max(n_tokens))::BIGINT AS padded_tokens
    FROM b
    GROUP BY shard, batch_id
    ORDER BY shard, batch_id
    """,
)
def l5_length_bucketed_batches(spark, sf_dir):
    """L5 [EXT]: length-bucketed batch layout — per-language shards
    sort by token length and chunk into 32-doc batches so padded cost
    (n_docs x max_tokens) tracks sum_tokens (the serving-stack padding
    minimization).  One narrow projection + ONE shard-partitioned
    window + one per-batch hash agg — no global sort
    (operators/curation.py length_bucketed_batches)."""
    from bigdatasearchpro_spark.operators.curation import (
        length_bucketed_batches,
    )

    docs = load_table(spark, sf_dir, "documents")
    return length_bucketed_batches(docs, batch_size=32)


# ---------------------------------------------------------------------------
# streaming transform (continuous pivot mode)
# ---------------------------------------------------------------------------

@register(
    "st14_streaming_transform",
    """
    SELECT event_type, count(*)::BIGINT AS n, sum(user_id)::BIGINT AS su
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st14_streaming_transform(spark, sf_dir):
    """§2.9 [ES parity]: the CONTINUOUS mode of `_transform` — the same
    pivot (group event_type -> count + exact integral sum) run as a
    streaming aggregation over the events fixture replayed in 3
    micro-batches (complete mode = the transform checkpoint: dest
    always reflects one full pivot of the data seen).  Final state ==
    the batch pivot == the DuckDB oracle — the claim
    api.start_transform's docstring makes, verified end-to-end
    (streaming/pipelines.py run_to_completion)."""
    import shutil
    import tempfile

    from bigdatasearchpro_spark.streaming.pipelines import run_to_completion

    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="st14_src_")
    ck = tempfile.mkdtemp(prefix="st14_ck_")
    try:
        for i in range(3):
            (ev.filter(F.col("event_id") % 3 == i)
               .coalesce(1).write.mode("append").parquet(src))
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        pivot = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("su"),
        )
        got = run_to_completion(pivot, checkpoint_dir=ck,
                                output_mode="complete")
        rows = got.orderBy("event_type").collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n bigint, su bigint"
    )


# ---------------------------------------------------------------------------
# watcher (stored pull-mode alerts)
# ---------------------------------------------------------------------------

@register(
    "s32_watcher",
    """
    WITH c AS (
      SELECT count(*)::BIGINT AS n FROM events
      WHERE event_type = 'error' AND value > 90
    )
    SELECT 'hot-errors' AS watch_id, n AS value,
           (n > 10) AS condition_met
    FROM c
    """,
)
def s32_watcher(spark, sf_dir):
    """S-family [ES parity]: Watcher (``_watcher``) — the PULL form of
    alerting (the streaming ring serves the push form): a stored watch
    whose input counts hot error events, a `gt` condition, and an
    action that fires when it holds; ``_execute`` is ONE scalar
    aggregate per run.  The full lifecycle (PUT/GET/EXECUTE/DELETE)
    runs inside the entry (api.put_watch / execute_watch)."""
    import uuid

    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    ev = load_table(spark, sf_dir, "events")
    tag = uuid.uuid4().hex[:8]
    idx = f"watch_events_{tag}"
    wid = f"hot-errors-{tag}"
    bulk_index_table(ev, idx)  # typed events index
    api.put_watch(
        spark, wid,
        input_sql=(
            f"SELECT count(*) AS n FROM {idx} "
            f"WHERE event_type = 'error' AND CAST(value AS DOUBLE) > 90"
        ),
        condition={"gt": 10},
        action="notify",
    )
    try:
        assert api.get_watch(spark, wid) is not None
        res = api.execute_watch(spark, wid)
        rows = [("hot-errors", int(res["value"]), res["condition_met"])]
    finally:
        assert api.delete_watch(spark, wid)
        api.delete_index(spark, idx)
    return spark.createDataFrame(
        rows, "watch_id string, value bigint, condition_met boolean"
    )


# ---------------------------------------------------------------------------
# ILM (index lifecycle management policy ticks)
# ---------------------------------------------------------------------------

@register(
    "s33_ilm_lifecycle",
    """
    SELECT 'ilm_idx_000002' AS index_name,
           (SELECT count(*) FROM nation) AS docs_count
    UNION ALL
    SELECT 'ilm_idx_000003', 0
    ORDER BY index_name
    """,
)
def s33_ilm_lifecycle(spark, sf_dir):
    """S-family [ES parity]: ILM (``_ilm/policy``) — the policy layer
    over the lifecycle primitives: hot-phase rollover at max_docs,
    delete phase keeping the newest 2 generations.  Two policy ticks:
    tick 1 rolls gen1 -> gen2 (both kept); after refilling gen2, tick
    2 rolls gen2 -> gen3 AND the delete phase drops gen1 — the oracle
    pins the surviving generation names and counts.  One count +
    empty-create + catalog drops per tick; generations age out whole,
    no data rewrite (api.put_ilm_policy / apply_ilm)."""
    from bigdatasearchpro_spark import api
    from bigdatasearchpro_spark.sinks import ddl
    from bigdatasearchpro_spark.sinks.bulk import bulk_index_table

    nat = load_table(spark, sf_dir, "nation")
    g1, g2, g3 = "ilm_idx_000001", "ilm_idx_000002", "ilm_idx_000003"
    alias, pol = "ilm_write", "ilm_pol_probe"
    api.bulk_data_to_index(spark, nat, g1, id_col="n_nationkey")
    api.put_ilm_policy(spark, pol, rollover_max_docs=10,
                       keep_generations=2)
    try:
        ddl.add_alias(spark, g1, alias)
        t1 = api.apply_ilm(spark, alias, pol)
        assert t1["rolled_over"] and t1["deleted"] == []
        # refill the new write index past the condition
        bulk_index_table(
            load_table(spark, sf_dir, "nation"), g2, mode="overwrite"
        )
        t2 = api.apply_ilm(spark, alias, pol)
        assert t2["rolled_over"] and t2["deleted"] == [g1]
        out = api.cat_indices(spark).filter(
            F.col("index_name").isin(g1, g2, g3)
        )
        rows = out.select("index_name", "docs_count").orderBy(
            "index_name").collect()
    finally:
        assert api.delete_ilm_policy(spark, pol)
        ddl.delete_alias(spark, alias)
        for g in (g1, g2, g3):
            try:
                api.delete_index(spark, g)
            except Exception:
                pass
    return spark.createDataFrame(rows, "index_name string, docs_count long")


# ---------------------------------------------------------------------------
# hamming kNN over bit vectors (ES element_type: bit)
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.registry_ext import _RANGE_QUERY_INTS  # noqa: E402

_QLO = sum((1 << i) for i in range(32) if _RANGE_QUERY_INTS[i] > 0)
_QHI = sum((1 << i) for i in range(32) if _RANGE_QUERY_INTS[i + 32] > 0)

@register(
    "l4_hamming_topk",
    f"""
    WITH b AS (
      SELECT vec_id,
             list_sum([CASE WHEN embedding[i+1] > 0
                            THEN (1::BIGINT << i) ELSE 0 END
                       for i in generate_series(0, 31)])::BIGINT AS lo,
             list_sum([CASE WHEN embedding[i+33] > 0
                            THEN (1::BIGINT << i) ELSE 0 END
                       for i in generate_series(0, 31)])::BIGINT AS hi
      FROM embeddings
    )
    SELECT vec_id,
           (bit_count(xor(lo, {_QLO}::BIGINT))
            + bit_count(xor(hi, {_QHI}::BIGINT)))::INT AS hamming
    FROM b
    ORDER BY hamming ASC, vec_id ASC
    LIMIT 10
    """,
)
def l4_hamming_topk(spark, sf_dir):
    """L4 [ES parity]: kNN over BIT vectors (ES 8.x ``element_type:
    bit`` with hamming similarity) — sign-binarized embeddings packed
    into two 32-bit halves (64x smaller than float32, the
    corpus-scale point), distance = popcount of the XOR, TakeOrdered
    page.  Pure integer column math in the scan's codegen span; the
    fixed integer query vector binarizes ONCE at import
    (operators/similarity.py hamming_topk / binarize_embedding)."""
    from bigdatasearchpro_spark.operators.similarity import hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return hamming_topk(emb, [float(v) for v in _RANGE_QUERY_INTS], 10)


# ---------------------------------------------------------------------------
# maxSim late-interaction ranking (ES rank_vectors)
# ---------------------------------------------------------------------------

def _maxsim_oracle() -> str:
    q = [int(x) for x in _RANGE_QUERY_INTS]
    n_sub, sub = 8, 8
    e_cols = ", ".join(
        f"CAST(floor(embedding[{i + 1}]::DOUBLE * 1000.0 + 0.5) AS BIGINT)"
        f" AS e{i}"
        for i in range(64)
    )
    parts = []
    for qi in range(n_sub):
        dots = []
        for dj in range(n_sub):
            terms = " + ".join(
                f"e{dj * sub + t} * ({q[qi * sub + t]})" for t in range(sub)
            )
            dots.append(f"({terms})")
        parts.append("greatest(" + ", ".join(dots) + ")")
    score = " + ".join(parts)
    return f"""
    WITH e AS (SELECT vec_id, {e_cols} FROM embeddings)
    SELECT vec_id, ({score})::BIGINT AS maxsim
    FROM e
    ORDER BY maxsim DESC, vec_id ASC
    LIMIT 10
    """


@register("l4_maxsim_topk", _maxsim_oracle())
def l4_maxsim_topk(spark, sf_dir):
    """L4 [ES parity]: late-interaction maxSim ranking (ES 8.x
    ``rank_vectors`` maxSimDotProduct; ColBERT's scoring rule) — each
    document is a SET of sub-vectors (the 64-dim fixture vector
    reshaped 8x8; a real corpus stores token vectors) and score =
    sum over query sub-vectors of the max dot against the doc's set.
    Components quantize to a 1e3 integer grid so every dot/max/sum is
    BIGINT — the page replays in SQL; the score is ONE explicit
    Python-built expression tree in the scan (no interpreted HOF
    lambdas — the PQ codegen lesson), closed by TakeOrdered
    (operators/similarity.py maxsim_topk)."""
    from bigdatasearchpro_spark.operators.similarity import maxsim_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return maxsim_topk(emb, _RANGE_QUERY_INTS, 10)


# ---------------------------------------------------------------------------
# geo_shape envelope relations
# ---------------------------------------------------------------------------

# per-customer envelope: a 0.5-degree box around the derived grid point
_ENV_SQL = """
      SELECT c_custkey,
             (((c_custkey * 7919) % 17000) / 100.0 - 85.0) AS minlat,
             (((c_custkey * 7919) % 17000) / 100.0 - 84.5) AS maxlat,
             (((c_custkey * 104729) % 36000) / 100.0 - 180.0) AS minlon,
             (((c_custkey * 104729) % 36000) / 100.0 - 179.5) AS maxlon
      FROM customer
"""

@register(
    "l3_geo_shape_envelope",
    f"""
    WITH e AS ({_ENV_SQL})
    SELECT c_custkey,
           (minlat <= 20.0 AND maxlat >= 0.0
            AND minlon <= 40.0 AND maxlon >= 10.0) AS intersects,
           (minlat >= 0.0 AND maxlat <= 20.0
            AND minlon >= 10.0 AND maxlon <= 40.0) AS within
    FROM e
    WHERE (minlat <= 20.0 AND maxlat >= 0.0
           AND minlon <= 40.0 AND maxlon >= 10.0)
    ORDER BY c_custkey
    """,
)
def l3_geo_shape_envelope(spark, sf_dir):
    """L3 [ES parity]: ``geo_shape`` query over ENVELOPE geometries —
    stored per-customer boxes (0.5-degree, derived on the geo ring's
    exact grid) tested against a query box with the public relations:
    the entry returns the INTERSECTS set with each hit's WITHIN flag
    (contains is the mirrored form, unit-tested).  Axis-aligned boxes
    make every relation four scan-pushable comparisons
    (operators/geo.py envelope_relation)."""
    from bigdatasearchpro_spark.operators.geo import envelope_relation

    cust = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * F.lit(7919)) % F.lit(17000)) / F.lit(100.0)
    lon = ((F.col("c_custkey") * F.lit(104729)) % F.lit(36000)) / F.lit(100.0)
    env = cust.select(
        "c_custkey",
        (lat - F.lit(85.0)).alias("minlat"),
        (lat - F.lit(84.5)).alias("maxlat"),
        (lon - F.lit(180.0)).alias("minlon"),
        (lon - F.lit(179.5)).alias("maxlon"),
    )
    q = (0.0, 20.0, 10.0, 40.0)
    inter = envelope_relation(
        F.col("minlat"), F.col("maxlat"), F.col("minlon"), F.col("maxlon"),
        q, "intersects",
    )
    within = envelope_relation(
        F.col("minlat"), F.col("maxlat"), F.col("minlon"), F.col("maxlon"),
        q, "within",
    )
    return (
        env.select(
            "c_custkey", inter.alias("intersects"), within.alias("within")
        )
        .filter("intersects")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# collapse with inner_hits
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.registry_text import (  # noqa: E402
    SEARCH_QUERY as _SEARCH_QUERY,
    _TERMS_SQL as _SEARCH_TERMS_SQL,
    _TOKS_CTE as _SEARCH_TOKS_CTE,
)

@register(
    "l3_collapse_inner_hits",
    f"""
    WITH {_SEARCH_TOKS_CTE},
    ne AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM ne
      WHERE term IN {_SEARCH_TERMS_SQL} GROUP BY doc_id, term
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
    scored AS (
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
    ranked AS (
      SELECT s.doc_id, d.source, s.score,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY s.score DESC, s.doc_id ASC) AS r
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    kept AS (SELECT * FROM ranked WHERE r <= 2),
    winners AS (
      SELECT source, arg_min(doc_id, r) AS winner_id,
             arg_min(score, r) AS winner_score
      FROM kept GROUP BY source
    ),
    page AS (
      SELECT * FROM winners
      ORDER BY winner_score DESC, winner_id ASC
      LIMIT 10
    )
    SELECT p.source, p.winner_id, p.winner_score,
           k.r, k.doc_id AS inner_id, k.score AS inner_score
    FROM page p JOIN kept k ON p.source = k.source
    ORDER BY p.winner_score DESC, p.winner_id ASC, k.r ASC
    """,
)
def l3_collapse_inner_hits(spark, sf_dir):
    """L3 [ES parity]: ``collapse`` with ``inner_hits`` — each
    collapsed per-source group carries its own top-2 page (winner
    included) as rank-ordered arrays, the "other hits from this
    domain" expansion, computed inside the SAME per-key window (no
    second search; search.collapse_topk inner_hits)."""
    docs = load_table(spark, sf_dir, "documents")
    page = search.collapse_topk(
        docs, _SEARCH_QUERY, "source", 10, inner_hits=2
    )
    # the driver canonicalizer hashes scalar cells: unnest the inner
    # page to one row per (group, rank)
    inner = F.transform(
        F.arrays_zip("inner_ids", "inner_scores"),
        lambda x: F.struct(
            x["inner_ids"].alias("i"), x["inner_scores"].alias("s")
        ),
    )
    return (
        page.select(
            "source",
            F.col("doc_id").alias("winner_id"),
            F.col("score").alias("winner_score"),
            F.posexplode(inner).alias("r0", "h"),
        )
        .select(
            "source", "winner_id", "winner_score",
            (F.col("r0") + 1).cast("bigint").alias("r"),
            F.col("h.i").alias("inner_id"),
            F.col("h.s").alias("inner_score"),
        )
        .orderBy(F.desc("winner_score"), F.asc("winner_id"), F.asc("r"))
    )


# ---------------------------------------------------------------------------
# graph explore (significance-driven term-graph expansion)
# ---------------------------------------------------------------------------

@register(
    "l3_graph_explore",
    """
    WITH inc AS (
      SELECT doc_id, unnest(list_distinct(list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')))
          AS term
      FROM documents
    ),
    bg AS (SELECT term, count(*) AS bg_count FROM inc GROUP BY term),
    nbg AS (SELECT count(*)::DOUBLE AS n FROM documents),
    seeddocs AS (SELECT DISTINCT doc_id FROM inc WHERE term = 'spark'),
    nfg1 AS (SELECT count(*)::DOUBLE AS n FROM seeddocs),
    fg1 AS (SELECT term, count(*) AS doc_count FROM inc
            WHERE doc_id IN (SELECT doc_id FROM seeddocs) GROUP BY term),
    h1 AS (
      SELECT 1 AS hop, 'spark' AS source, fg1.term, fg1.doc_count,
             round((fg1.doc_count / nfg1.n - bg.bg_count / nbg.n)
                   * ((fg1.doc_count / nfg1.n) / (bg.bg_count / nbg.n)),
                   6) AS score
      FROM fg1 JOIN bg USING (term) CROSS JOIN nfg1 CROSS JOIN nbg
      WHERE fg1.doc_count >= 3 AND fg1.term <> 'spark'
    ),
    h1top AS (
      SELECT * FROM h1 WHERE score > 0
      ORDER BY score DESC, term ASC LIMIT 3
    ),
    v2docs AS (
      SELECT h.term AS source, i.doc_id
      FROM h1top h JOIN inc i ON i.term = h.term
    ),
    nfg2 AS (SELECT source, count(*)::DOUBLE AS n
             FROM v2docs GROUP BY source),
    fg2 AS (SELECT v.source, i.term, count(*) AS doc_count
            FROM v2docs v JOIN inc i ON v.doc_id = i.doc_id
            GROUP BY v.source, i.term),
    h2 AS (
      SELECT 2 AS hop, fg2.source, fg2.term, fg2.doc_count,
             round((fg2.doc_count / nfg2.n - bg.bg_count / nbg.n)
                   * ((fg2.doc_count / nfg2.n) / (bg.bg_count / nbg.n)),
                   6) AS score
      FROM fg2 JOIN bg USING (term)
      JOIN nfg2 ON fg2.source = nfg2.source CROSS JOIN nbg
      WHERE fg2.doc_count >= 3
    ),
    h2top AS (
      SELECT hop, source, term, doc_count, score FROM (
        SELECT h2.*, row_number() OVER (
            PARTITION BY source ORDER BY score DESC, term ASC) AS rn
        FROM h2
        WHERE score > 0 AND term <> 'spark'
          AND term NOT IN (SELECT term FROM h1top)
      ) WHERE rn <= 3
    )
    SELECT hop, source, term, doc_count::BIGINT AS doc_count, score
    FROM (SELECT hop, source, term, doc_count, score FROM h1top
          UNION ALL
          SELECT hop, source, term, doc_count, score FROM h2top)
    ORDER BY hop, source, score DESC, term
    """,
)
def l3_graph_explore(spark, sf_dir):
    """L3 [ES parity]: Graph explore (``_graph/explore``) — from the
    seed term `spark`, expand the 3 most SIGNIFICANTLY connected
    vertices (JLH vs the whole index, the Graph API's
    relevance-not-popularity rule), then expand each of those 3 one
    hop further; vertex dedup is against PRIOR hops so within-hop
    expansions are independent and the whole walk replays in SQL.
    Per expansion: one significant_terms pass; the frontier between
    hops is a 3-row driver list (operators/aggs.py graph_explore)."""
    from bigdatasearchpro_spark.operators import aggs

    docs = load_table(spark, sf_dir, "documents")
    return aggs.graph_explore(
        docs, "spark", hops=2, top_per_hop=3, min_doc_count=3
    )


# ---------------------------------------------------------------------------
# rate + random_sampler aggregations
# ---------------------------------------------------------------------------

@register(
    "l3_agg_rate",
    """
    SELECT date_trunc('day', ts)::TIMESTAMP AS key,
           count(*)::BIGINT AS doc_count,
           count(*)::DOUBLE * 3600.0 / 86400.0 AS rate
    FROM events
    GROUP BY key
    ORDER BY key
    """,
)
def l3_agg_rate(spark, sf_dir):
    """L3 [ES parity]: ``rate`` aggregation — per-day buckets with the
    doc count normalized to an hourly rate, divisor = each bucket's
    OWN calendar span (month buckets would divide by their real
    length).  One hash agg + one exact division per bucket row
    (operators/aggs.py rate_agg)."""
    from bigdatasearchpro_spark.operators import aggs

    ev = load_table(spark, sf_dir, "events")
    out = aggs.rate_agg(ev, "ts", bucket_interval="day",
                        unit_seconds=3600)
    return out.select(
        F.col("key").cast("timestamp").alias("key"), "doc_count", "rate"
    )


@register(
    "l3_agg_random_sampler",
    """
    WITH s AS (
      SELECT * FROM documents
      WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
            % 100 < 25
    )
    SELECT count(*)::BIGINT AS sample_docs,
           count(*)::DOUBLE * (100.0 / 25.0) AS est_docs,
           sum(n_chars)::DOUBLE * (100.0 / 25.0) AS est_chars
    FROM s
    """,
)
def l3_agg_random_sampler(spark, sf_dir):
    """L3 [ES parity]: ``random_sampler`` aggregation — linear
    sub-aggs over a 25% sample scaled by 1/p (the huge-corpus
    cheap-agg trade).  The sample is the portable md5-hash family
    (deterministic + engine-replayable where ES uses per-shard RNG),
    so the estimator itself is hash-verified
    (operators/aggs.py random_sampler_agg)."""
    from bigdatasearchpro_spark.operators import aggs

    docs = load_table(spark, sf_dir, "documents")
    return aggs.random_sampler_agg(
        docs, 25,
        {"est_docs": F.count(F.lit(1)).cast("double"),
         "est_chars": F.sum("n_chars").cast("double")},
    )


# ---------------------------------------------------------------------------
# Round-7 seventh pass: the ES `nested` surface (array-of-struct
# sub-documents), the remaining pipeline aggs (bucket_sort /
# percentiles_bucket), and the `pinned` query.
# ---------------------------------------------------------------------------

from bigdatasearchpro_spark.operators import aggs, nested  # noqa: E402

_NESTED_PRED_SQL = "l_returnflag = 'R' AND l_quantity >= 45"


def _nested_docs(spark, sf_dir):
    """Orders with their lineitems as an ES nested mapping:
    ``lines: array<struct<l_linenumber, l_returnflag, l_quantity>>``."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return nested.build_nested_docs(
        orders.select("o_orderkey", "o_orderpriority"),
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        "o_orderkey",
        "l_orderkey",
        ["l_linenumber", "l_returnflag", "l_quantity"],
        path="lines",
        order_by=["l_linenumber"],
    )


@register(
    "l3_nested_query",
    f"""
    SELECT l_orderkey AS o_orderkey,
           sum(CASE WHEN {_NESTED_PRED_SQL} THEN 1 ELSE 0 END)::BIGINT
             AS n_nested_hits
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CASE WHEN {_NESTED_PRED_SQL} THEN 1 ELSE 0 END) >= 1
    ORDER BY o_orderkey
    """,
)
def l3_nested_query(spark, sf_dir):
    """L3 [ES parity]: the ``nested`` query — parents where at least
    one SUB-OBJECT satisfies the whole inner conjunction (shipmode
    'R' AND quantity >= 45 within ONE lineitem), the semantics the
    nested mapping type exists for.  The document side is the real ES
    shape (``array<struct>`` built once, like ES co-locates nested
    Lucene docs at index time); the query itself is ``F.filter`` +
    ``size`` over the array — a narrow codegen expression in the scan,
    no explode/join/shuffle at any corpus size (operators/nested.py
    nested_query)."""
    docs = _nested_docs(spark, sf_dir)
    out = nested.nested_query(
        docs,
        "lines",
        lambda o: (o.getField("l_returnflag") == "R")
        & (o.getField("l_quantity") >= 45),
    )
    return out.select(
        "o_orderkey", F.col("n_nested_hits").cast("long").alias("n_nested_hits")
    ).orderBy("o_orderkey")


@register(
    "l3_nested_vs_object",
    """
    SELECT l_orderkey AS o_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
       AND max(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) = 1
       AND max(CASE WHEN l_returnflag = 'R' AND l_quantity >= 45
                    THEN 1 ELSE 0 END) = 0
    ORDER BY o_orderkey
    """,
)
def l3_nested_vs_object(spark, sf_dir):
    """L3 [ES parity]: the cross-object FALSE-POSITIVE set — parents
    that match the flat/"object"-mapped dotted-path query (some line
    has returnflag 'R', some line has quantity >= 45) but NOT the ``nested``
    query (no single line has both).  This is exactly the match-set
    difference the nested mapping type removes; both sides are narrow
    array expressions over the same nested column, one scan
    (operators/nested.py cross_object_match)."""
    docs = _nested_docs(spark, sf_dir)
    mode = lambda o: o.getField("l_returnflag") == "R"  # noqa: E731
    qty = lambda o: o.getField("l_quantity") >= 45  # noqa: E731
    cross = nested.cross_object_match(docs, "lines", [mode, qty])
    n_nested = F.size(F.filter("lines", lambda o: mode(o) & qty(o)))
    return (
        docs.filter(cross & (n_nested == 0))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "l3_agg_nested_terms",
    """
    SELECT l_returnflag,
           count(*)::BIGINT AS doc_count,
           count(DISTINCT l_orderkey)::BIGINT AS parent_count
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def l3_agg_nested_terms(spark, sf_dir):
    """L3 [ES parity]: ``nested`` aggregation + ``terms`` on a nested
    field with the ``reverse_nested`` parent re-count per bucket —
    doc_count counts nested OBJECTS (the nested context), parent_count
    counts distinct PARENTS (the reverse_nested context).  The explode
    of ``array<struct>`` is a scan of the child relation it was built
    from, so the whole agg is one hash aggregate on the bucket key;
    both counts come out of the same aggregate (operators/nested.py
    nested_terms_agg)."""
    docs = _nested_docs(spark, sf_dir)
    return (
        nested.nested_terms_agg(docs, "lines", "l_returnflag",
                                parent_id="o_orderkey")
        .orderBy("l_returnflag")
    )


_CLICK_HOUR_CTE = """
b AS (
  SELECT date_trunc('hour', ts) AS key, count(*) AS doc_count
  FROM events WHERE event_type = 'click' GROUP BY 1
)
"""


def _click_hour_buckets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


@register(
    "l3_agg_bucket_sort",
    f"""
    WITH {_CLICK_HOUR_CTE}
    SELECT * FROM b
    ORDER BY doc_count DESC, key ASC
    LIMIT 5 OFFSET 2
    """,
)
def l3_agg_bucket_sort(spark, sf_dir):
    """L3 [ES parity]: ``bucket_sort`` pipeline aggregation — the
    ORDER BY ... LIMIT ... OFFSET of the agg DSL: hourly click buckets
    re-ranked by doc_count (busiest first, key tiebreak), then
    truncated with ``from: 2, size: 5``.  Operates on the
    bucket-cardinality frame only — a bounded sort at any corpus size
    (operators/aggs.py bucket_sort_agg)."""
    return aggs.bucket_sort_agg(
        _click_hour_buckets(spark, sf_dir),
        [F.desc("doc_count"), F.asc("key")],
        from_=2,
        size=5,
    )


@register(
    "l3_agg_percentiles_bucket",
    f"""
    WITH {_CLICK_HOUR_CTE},
    r AS (
      SELECT doc_count AS value,
             row_number() OVER (ORDER BY doc_count ASC) AS rn,
             count(*) OVER () AS n
      FROM b
    ),
    p AS (SELECT unnest([25, 50, 75, 99]) AS percent)
    SELECT p.percent, r.value AS doc_count_pct
    FROM p JOIN r ON r.rn = greatest(1, (p.percent * r.n + 99) // 100)
    ORDER BY p.percent
    """,
)
def l3_agg_percentiles_bucket(spark, sf_dir):
    """L3 [ES parity]: ``percentiles_bucket`` sibling pipeline
    aggregation — percentiles of a sibling metric ACROSS the parent's
    buckets, exact nearest-rank (ceil(p/100 * n), pure integer
    arithmetic both engines replay bit-for-bit; ES itself is exact
    here too — the bucket list is sorted in memory, no t-digest).
    The single unpartitioned window is bucket-cardinality, never
    corpus-sized (operators/aggs.py percentiles_bucket_agg)."""
    return aggs.percentiles_bucket_agg(
        _click_hour_buckets(spark, sf_dir), "doc_count", [25, 50, 75, 99]
    )


from bigdatasearchpro_spark.registry_text import (  # noqa: E402
    SEARCH_QUERY as _PIN_QUERY,
    _TERMS_SQL as _PIN_TERMS_SQL,
    _TOKS_CTE as _PIN_TOKS_CTE,
)

# Pin list: two ids that exist at every fixture SF plus one that never
# does (ES skips missing pinned ids — replayed by the IN-documents
# filter in the oracle).
_PIN_IDS = (42, 7, 10**9)
_PIN_VALUES_SQL = ", ".join(
    f"({i}, {p + 1})" for p, i in enumerate(_PIN_IDS)
)


@register(
    "l3_pinned_query",
    f"""
    WITH {_PIN_TOKS_CTE},
    ne AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM ne
      WHERE term IN {_PIN_TERMS_SQL} GROUP BY doc_id, term
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
    scored AS (
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
    pins AS (
      SELECT * FROM (VALUES {_PIN_VALUES_SQL}) p(doc_id, pin_pos)
      WHERE doc_id IN (SELECT doc_id FROM documents)
    ),
    page AS (
      SELECT * FROM (
        SELECT doc_id, pin_pos, CAST(NULL AS DOUBLE) AS score FROM pins
        UNION ALL
        SELECT doc_id, CAST(NULL AS INTEGER) AS pin_pos, score
        FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM pins)
      )
      ORDER BY pin_pos ASC NULLS LAST, score DESC NULLS LAST, doc_id ASC
      LIMIT 10
    )
    SELECT CAST(row_number() OVER (
             ORDER BY pin_pos ASC NULLS LAST, score DESC NULLS LAST,
                      doc_id ASC) AS BIGINT) AS rank,
           doc_id, pin_pos IS NOT NULL AS pinned, score
    FROM page ORDER BY rank
    """,
)
def l3_pinned_query(spark, sf_dir):
    """L3 [ES parity]: the ``pinned`` query — curated ids rank first,
    in the order given, ahead of the organic BM25 hits of the inner
    query; pinned docs show regardless of organic match, organic
    duplicates of pinned ids are suppressed, and ids absent from the
    index are skipped (the 10^9 pin).  The organic side is the
    ordinary single-scan scored TakeOrdered; the pin list is a literal
    broadcast; the final ordering touches a page-sized frame only
    (operators/search.py pinned_query)."""
    docs = load_table(spark, sf_dir, "documents")
    out = search.pinned_query(docs, _PIN_QUERY, list(_PIN_IDS), 10)
    return out.withColumn("rank", F.col("rank").cast("long")).orderBy("rank")


@register(
    "s34_terms_enum",
    """
    SELECT term FROM (
      SELECT DISTINCT source AS term FROM documents
      WHERE lower(source) LIKE 'src1%'
    ) ORDER BY term LIMIT 10
    """,
)
def s34_terms_enum(spark, sf_dir):
    """S34 [ES parity]: ``POST {index}/_terms_enum`` — sorted distinct
    values of a keyword field under a case-insensitive prefix, first
    ``size`` only (the search-box autocomplete endpoint, 7.14+).  One
    distinct hash agg over a single pruned column with the prefix
    predicate pushed to the scan, then a 10-row TakeOrdered page
    (api.terms_enum)."""
    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    api.bulk_data_to_index(spark, docs, "te_idx", id_col="doc_id")
    try:
        terms = api.terms_enum(spark, "te_idx", "source", "src1")
    finally:
        api.delete_index(spark, "te_idx")
    return spark.createDataFrame([(t,) for t in terms], "term string")


@register(
    "l3_analyzer_edge_ngram",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS term
      FROM documents
    ),
    m AS (
      SELECT doc_id
      FROM toks
      GROUP BY doc_id
      HAVING max(CASE WHEN term LIKE 'spa%' THEN 1 ELSE 0 END) = 1
         AND max(CASE WHEN term LIKE 'win%' THEN 1 ELSE 0 END) = 1
    )
    SELECT d.doc_id, d.lang FROM documents d
    JOIN m ON d.doc_id = m.doc_id
    ORDER BY d.doc_id
    """,
)
def l3_analyzer_edge_ngram(spark, sf_dir):
    """L3 analyzers: ``edge_ngram`` — the search-as-you-type INDEX
    analyzer (each standard token emits its 2..5-char prefixes;
    search_analyzer stays standard, ES's documented asymmetric
    autocomplete pairing — the first asymmetric pair through the
    (index expr, query analyze) slot).  The partial query "spa win"
    matches via plain term containment against the indexed grams; the
    oracle replays the equivalent prefix semantics (a token yields
    gram 'spa' iff it LIKEs 'spa%').  The gram expansion is a bounded
    array expression in the scan (<= 4 prefixes per token), no
    explode, no UDF (operators/analyzers.py _edge_ngram_tokens)."""
    from bigdatasearchpro_spark.operators.analyzers import ANALYZERS

    docs = load_table(spark, sf_dir, "documents")
    idx_expr, q_analyze = ANALYZERS["edge_ngram"]
    grams = idx_expr(F.col("text"))
    terms = q_analyze("spa win")
    pred = F.lit(True)
    for t in terms:
        pred = pred & F.array_contains(grams, t)
    return docs.filter(pred).select("doc_id", "lang").orderBy("doc_id")


@register(
    "l3_agg_moving_percentiles",
    f"""
    WITH {_CLICK_HOUR_CTE},
    fr AS (
      SELECT key, doc_count,
             list_sort(list(doc_count) OVER (
               ORDER BY key ASC
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)) AS f
      FROM b
    )
    SELECT key, doc_count,
           CASE WHEN f IS NULL THEN NULL
                ELSE f[greatest(1, (50 * len(f) + 99) // 100)]
           END AS doc_count_p50,
           CASE WHEN f IS NULL THEN NULL
                ELSE f[greatest(1, (90 * len(f) + 99) // 100)]
           END AS doc_count_p90
    FROM fr ORDER BY key
    """,
)
def l3_agg_moving_percentiles(spark, sf_dir):
    """L3 [ES parity]: ``moving_percentiles`` pipeline aggregation —
    p50/p90 of the hourly click doc_count over the trailing 3-bucket
    frame (moving_fn window semantics: the frame ends before the
    current bucket, first bucket NULL).  Exact nearest-rank over each
    frame's sorted values — bounded array sort per bucket on the
    bucket-cardinality frame, no t-digest, no corpus window
    (operators/aggs.py moving_percentiles_agg)."""
    return aggs.moving_percentiles_agg(
        _click_hour_buckets(spark, sf_dir), "doc_count", [50, 90],
        window=3,
    ).orderBy("key")


@register(
    "l1_fingerprint_dedup",
    """
    WITH fp AS (
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))), ' ') AS fingerprint
      FROM documents
    )
    SELECT fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*)::BIGINT AS n_members
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) >= 2
    ORDER BY fingerprint
    """,
)
def l1_fingerprint_dedup(spark, sf_dir):
    """L1+L3 [ES parity]: dedup by the ``fingerprint`` ANALYZER key
    (lowercase -> standard split -> dedupe -> sort -> single-space
    join — the OpenRefine/ES clustering key): documents that are
    word-set permutations of each other collapse to one fingerprint
    regardless of word ORDER or repetition — a canonicalization the
    content-hash dedup ring cannot express.  Groups with >= 2 members
    keep the min doc_id.  One narrow fingerprint projection in the
    scan + one hash agg on the key — the exact-dedup plan shape with a
    smarter key (operators/analyzers.py _fingerprint_tokens)."""
    from bigdatasearchpro_spark.operators.analyzers import ANALYZERS

    docs = load_table(spark, sf_dir, "documents")
    idx_expr, _ = ANALYZERS["fingerprint"]
    fp = docs.select(
        "doc_id", idx_expr(F.col("text")).getItem(0).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("fingerprint")
    )


@register(
    "s35_index_resize",
    """
    WITH n AS (SELECT count(*) AS c FROM events)
    SELECT * FROM (
      SELECT '_clone' AS op, 4 AS shards, c AS rows FROM n
      UNION ALL SELECT '_shrink', 4, c FROM n
      UNION ALL SELECT '_split', 16, c FROM n
    ) ORDER BY op
    """,
)
def s35_index_resize(spark, sf_dir):
    """S35 [ES parity]: the index-resize APIs — ``_split`` /
    ``_shrink`` / ``_clone`` lifecycle over a custom-routed index:
    8 shards split 2x to 16, shrunk 4x to 4, then cloned.  Every
    resize preserves content exactly (row counts hash-checked here;
    per-document shard-lineage invariants — each source shard fans out
    only to its own children — are pinned in tests/test_nested.py).
    One content-invariant distributed rewrite per op, the lakehouse
    equivalent of ES's hard-link split (api.resize_index)."""
    from bigdatasearchpro_spark import api

    ev = load_table(spark, sf_dir, "events")
    api.bulk_data_to_index(spark, ev, "rs_idx", id_col="event_id",
                           routing_col="user_id", n_shards=8)
    try:
        split = api.resize_index(spark, "rs_idx", "rs_idx_16",
                                 op="_split", factor=2)
        shrink = api.resize_index(spark, "rs_idx_16", "rs_idx_4",
                                  op="_shrink", factor=4)
        clone = api.resize_index(spark, "rs_idx_4", "rs_idx_c",
                                 op="_clone")
        rows = [(r["op"], r["shards"], r["rows"])
                for r in (clone, shrink, split)]
    finally:
        for idx in ("rs_idx", "rs_idx_16", "rs_idx_4", "rs_idx_c"):
            try:
                api.delete_index(spark, idx)
            except Exception:
                pass
    out = spark.createDataFrame(rows, "op string, shards int, rows long")
    return out.orderBy("op")


@register(
    "l3_synonym_search",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS l
      FROM documents
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    WHERE (list_contains(t.l, 'sort') OR list_contains(t.l, 'order'))
      AND list_contains(t.l, 'window')
    ORDER BY d.doc_id
    """,
)
def l3_synonym_search(spark, sf_dir):
    """L3 [ES parity]: query-time synonym expansion (``synonym_graph``
    token filter, ``expand: true`` + match ``operator: and``): the
    query "sort window" with the synonym group {sort, order} requires
    one hit PER GROUP — any member satisfies its group's position.
    One narrow OR-of-array_contains predicate per group inside the
    scan's codegen span; no explode, no vocabulary pass, no join
    (operators/search.py synonym_match / expand_synonyms)."""
    docs = load_table(spark, sf_dir, "documents")
    out = search.synonym_match(
        docs, "sort window", [("sort", "order")], mode="all"
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


@register(
    "l1_soft_dedup_weights",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    c AS (SELECT text, count(*) AS n FROM corpus GROUP BY text)
    SELECT d.doc_id, c.n::BIGINT AS n_dups,
           (1000000 // c.n)::BIGINT AS weight_ppm
    FROM corpus d JOIN c ON d.text = c.text
    ORDER BY d.doc_id
    """,
)
def l1_soft_dedup_weights(spark, sf_dir):
    """L1/L5 [LLM curation]: SoftDeDup reweighting (He et al. 2024) —
    every document kept, down-weighted by its exact-duplicate count
    (weight 1/n on an exact 1e6 integer grid) so each unique text
    contributes one expected document to the training mix; deletion is
    the keep-1 special case, soft weighting keeps the often-higher-
    quality duplicated text at reduced sampling temperature.  The
    fixture corpus is duplicate-free, so the entry replays the
    standard deterministic mutation (every 5th doc twice, every 10th
    three times — n in {1,2,3}).  One md5 content-key hash agg + one
    key join back — the exact-dedup shuffle with (key, n)-only payload
    on the agg side (operators/dedup.py soft_dedup_weights)."""
    from bigdatasearchpro_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
    )
    out = dedup.soft_dedup_weights(corpus, "text")
    return out.select("doc_id", "n_dups", "weight_ppm").orderBy("doc_id")


@register(
    "l3_span_containing_query",
    f"""
    WITH {_SPAN_TOKS_CTE}
    SELECT doc_id, count(*)::BIGINT AS n_spans FROM (
      SELECT a.doc_id, a.pos AS s, b.pos AS e
      FROM p a JOIN p b ON a.doc_id = b.doc_id
      WHERE a.tok = 'spark' AND b.tok = 'window'
        AND b.pos > a.pos AND b.pos - a.pos - 1 <= 3
        AND EXISTS (
          SELECT 1 FROM p j
          WHERE j.doc_id = a.doc_id AND j.tok = 'join'
            AND j.pos BETWEEN a.pos AND b.pos
        )
    ) GROUP BY doc_id ORDER BY doc_id
    """,
)
def l3_span_containing_query(spark, sf_dir):
    """L3 [ES parity]: ``span_containing`` — the BIG spans
    (`spark`..`window`, slop 3, in order) that contain at least one
    little `join` span, counted per document.  Same nested-array
    algebra as the rest of the span family — one codegen-span
    expression, no explode; the twin ``span_within`` entry shows the
    two operators' span SETS differ even where their doc sets coincide
    (operators/spans.py span_spec_expr)."""
    from bigdatasearchpro_spark.operators.spans import span_spec_expr

    docs = load_table(spark, sf_dir, "documents")
    spec = {"span_containing": {
        "big": {"span_near": {"clauses": [{"span_term": "spark"},
                                          {"span_term": "window"}],
                              "slop": 3, "in_order": True}},
        "little": {"span_term": "join"},
    }}
    spans = span_spec_expr("text", spec)
    return (
        docs.select("doc_id", F.size(spans).cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy("doc_id")
    )


@register(
    "l3_span_within_query",
    f"""
    WITH {_SPAN_TOKS_CTE}
    SELECT doc_id, count(*)::BIGINT AS n_spans FROM (
      SELECT DISTINCT j.doc_id, j.pos
      FROM p j
      WHERE j.tok = 'join' AND EXISTS (
        SELECT 1 FROM p a JOIN p b ON a.doc_id = b.doc_id
        WHERE a.doc_id = j.doc_id AND a.tok = 'spark'
          AND b.tok = 'window' AND b.pos > a.pos
          AND b.pos - a.pos - 1 <= 3
          AND a.pos <= j.pos AND j.pos <= b.pos
      )
    ) GROUP BY doc_id ORDER BY doc_id
    """,
)
def l3_span_within_query(spark, sf_dir):
    """L3 [ES parity]: ``span_within`` — the LITTLE `join` spans lying
    inside a big `spark`..`window` (slop 3) span, counted per
    document.  The doc-level match set equals ``span_containing``'s,
    but the returned SPAN set (what scoring and further span nesting
    consume) is the little side — the count column makes the driver
    hash distinguish the two operators (operators/spans.py
    span_spec_expr)."""
    from bigdatasearchpro_spark.operators.spans import span_spec_expr

    docs = load_table(spark, sf_dir, "documents")
    spec = {"span_within": {
        "big": {"span_near": {"clauses": [{"span_term": "spark"},
                                          {"span_term": "window"}],
                              "slop": 3, "in_order": True}},
        "little": {"span_term": "join"},
    }}
    spans = span_spec_expr("text", spec)
    return (
        docs.select("doc_id", F.size(spans).cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy("doc_id")
    )


@register(
    "l4_sparse_vector_topk",
    """
    WITH tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS w
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS t
        FROM documents
      ) GROUP BY doc_id, t
    )
    SELECT doc_id,
           sum(CASE term WHEN 'spark' THEN 3 * w
                         WHEN 'join' THEN 2 * w
                         WHEN 'window' THEN 1 * w
                         ELSE 0 END)::BIGINT AS score
    FROM tf
    GROUP BY doc_id
    HAVING score > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def l4_sparse_vector_topk(spark, sf_dir):
    """L4 [ES parity]: the ``sparse_vector`` / ``text_expansion``
    query (8.x, the ELSER retrieval surface) — documents store a
    ``map<token, weight>`` sparse vector; the query's weighted tokens
    {spark:3, join:2, window:1} score by sparse dot product, top-10.
    The stored-field shape and query semantics are exactly ES's; the
    weight producer here is term frequency (model-free stand-in for
    the learned expansion — the plumbing, not the model, is the
    operator).  The dot product unrolls to a 3-lookup addition chain
    in the scan's codegen span + a TakeOrdered page: one scan, no
    explode/join/shuffle; BIGINT-exact (operators/similarity.py
    sparse_vector_topk)."""
    from bigdatasearchpro_spark.operators.similarity import (
        sparse_vector_column,
        sparse_vector_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    stored = docs.select(
        "doc_id", sparse_vector_column(docs, "text").alias("sparse_vec")
    )
    return sparse_vector_topk(
        stored, {"spark": 3, "join": 2, "window": 1}, 10
    )


@register(
    "l5_pipeline_curation_v6",
    r"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, source FROM documents
      WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000, text, source FROM documents
      WHERE doc_id % 10 = 0
    ),
    w AS (
      SELECT doc_id, text, source,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS words
      FROM corpus
    ),
    gate AS (
      SELECT doc_id, text, source
      FROM (
        SELECT doc_id, text, source,
               len(words)::BIGINT AS n_words,
               coalesce(list_sum(list_transform(words, x -> strlen(x))),
                        0)::BIGINT AS sum_wl,
               len(list_filter(words,
                   x -> x = '#' OR contains(x, '...')))::BIGINT AS n_symbol,
               len(list_filter(words,
                   x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha,
               len(list_distinct(list_filter(
                   list_transform(words, x -> lower(x)),
                   x -> list_contains(
                     ['the','be','to','of','and','that','have','with'], x)
               )))::BIGINT AS stop_hits
        FROM w
      )
      WHERE n_words >= 50 AND n_words <= 100000
        AND sum_wl >= 3 * n_words AND sum_wl <= 10 * n_words
        AND 100 * n_symbol <= 10 * n_words
        AND 100 * n_alpha >= 80 * n_words
        AND stop_hits >= 1
    ),
    cnt AS (SELECT text, count(*) AS n FROM gate GROUP BY text),
    weighted AS (
      SELECT g.doc_id, g.source AS domain,
             len(list_filter(string_split_regex(lower(g.text),
                 '[^a-z0-9]+'), x -> x <> '')) AS raw_tokens,
             (1000000 // c.n)::BIGINT AS weight_ppm
      FROM gate g JOIN cnt c ON g.text = c.text
    ),
    staged AS (
      SELECT doc_id, domain, weight_ppm,
             (raw_tokens * weight_ppm) // 1000000 AS n_tokens
      FROM weighted
    ),
    cum AS (
      SELECT doc_id, domain, weight_ppm, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY domain
               ORDER BY md5(doc_id::VARCHAR), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM staged
    )
    SELECT doc_id, domain, n_tokens::BIGINT AS n_tokens, weight_ppm,
           cum_tokens::BIGINT AS cum_tokens
    FROM cum
    WHERE cum_tokens - n_tokens < CASE domain
        WHEN 'src0' THEN 900 WHEN 'src1' THEN 400 ELSE 0 END
    ORDER BY domain, cum_tokens, doc_id
    """,
)
def l5_pipeline_curation_v6(spark, sf_dir):
    """L5 [training data]: curation pipeline v6 — the SoftDeDup-aware
    token budget: Gopher gate -> exact-duplicate 1/n weights (the
    standard every-5th/10th duplicate-injected corpus) -> per-domain
    token budgets metered in duplicate-DISCOUNTED tokens
    (floor(tokens * weight / 1e6)), so a text crawled n times spends
    one document's worth of budget across all copies instead of
    starving its domain's quota.  Plan: one narrow gate projection,
    one (key, n) hash agg + key join for the weights, one window
    cumsum per domain partition — three corpus-linear stages, one
    composed DuckDB oracle (operators/curation.py domain_token_budget
    weight_ppm_col + dedup.soft_dedup_weights)."""
    from bigdatasearchpro_spark.operators import curation, dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
    )
    gate = curation.gopher_rules(corpus, min_stop_hits=1)
    kept = corpus.join(
        gate.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    weighted = dedup.soft_dedup_weights(kept, "text")
    admitted = curation.domain_token_budget(
        weighted, {"src0": 900, "src1": 400},
        weight_ppm_col="weight_ppm",
    )
    return admitted.select(
        "doc_id", "domain", "n_tokens", "weight_ppm", "cum_tokens"
    ).orderBy("domain", "cum_tokens", "doc_id")


@register("l3_agg_variable_width_histogram", None)
def l3_agg_variable_width_histogram(spark, sf_dir):
    """L3 [ES parity]: ``variable_width_histogram`` — 8 dynamically-
    placed buckets over order totalprice (narrow where dense, wide
    where sparse).  ES's per-shard streaming clustering is explicitly
    non-deterministic; this is the deterministic two-phase shape: one
    fine fixed-width hash agg over the corpus (bounded cells,
    map-side combine) + a driver-side agglomerative merge over the
    bounded cell list (adjacent min-centroid-gap fusion, integer-exact
    Fraction compares).  Rows-only by design — the iterative merge has
    no SQL replay; the merge math is pinned by a pure-Python twin test
    (operators/aggs.py variable_width_histogram_agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return aggs.variable_width_histogram_agg(
        orders, "o_totalprice", 8
    )


@register(
    "l3_agg_vwh_fine_cells",
    """
    WITH b AS (
      SELECT min(o_totalprice)::DOUBLE AS lo,
             max(o_totalprice)::DOUBLE AS hi
      FROM orders
    )
    SELECT LEAST(199, CAST(floor((o_totalprice - lo) / (hi - lo) * 200)
                           AS INTEGER))::INTEGER AS cell,
           count(*)::BIGINT AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS s,
           min(o_totalprice)::DOUBLE AS mn,
           max(o_totalprice)::DOUBLE AS mx
    FROM orders, b
    GROUP BY cell
    ORDER BY cell
    """,
)
def l3_agg_vwh_fine_cells(spark, sf_dir):
    """L3 [ES parity]: the DISTRIBUTED phase of
    ``variable_width_histogram`` hash-verified on its own (r9 verdict
    ask #7) — the min/max probe + fine fixed-width hash aggregate that
    `l3_agg_variable_width_histogram` collects before its (rows-only,
    twin-tested) driver-side merge: per non-empty cell the count,
    integer-grid sum (floor(x*100 + 0.5) — the cross-engine-stable
    grid, not float round), min, and max.  Same inputs as the merged
    entry so the pair covers the whole operator
    (operators/aggs.py variable_width_fine_cells)."""
    orders = load_table(spark, sf_dir, "orders")
    return aggs.variable_width_fine_cells(orders, "o_totalprice")


@register(
    "l3_agg_terms_partition",
    """
    SELECT l_partkey,
           count(*)::BIGINT AS doc_count,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    WHERE ('0x' || substring(md5(l_partkey::VARCHAR), 1, 8))::BIGINT % 4 = 1
    GROUP BY l_partkey
    ORDER BY l_partkey
    """,
)
def l3_agg_terms_partition(spark, sf_dir):
    """L3 [ES parity]: ``terms`` aggregation with ``include:
    {partition: 1, num_partitions: 4}`` — ES's documented paging for
    aggregations over fields too high-cardinality for one response:
    the TERM SPACE is hash-partitioned and each request aggregates one
    disjoint, exhaustive slice.  The slice predicate is MAP-SIDE on
    the scan (like sliced scroll), so each page's hash table is
    bounded by its key slice, not the field cardinality — the 100 TB
    contract.  Portable md5 family, hash-replayed by the oracle; the
    xxhash64 fast path carries the same disjoint+exhaustive pytest
    invariants (operators/aggs.py terms_partition_filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    sliced = li.filter(
        aggs.terms_partition_filter_md5("l_partkey", 1, 4)
    )
    return (
        sliced.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .orderBy("l_partkey")
    )


@register(
    "l3_agg_composite_histogram",
    """
    WITH b AS (
      SELECT floor(o_totalprice / 50000) * 50000 AS price_bucket,
             o_orderpriority,
             count(*)::BIGINT AS doc_count
      FROM orders
      GROUP BY 1, 2
    )
    SELECT price_bucket, o_orderpriority, doc_count
    FROM b ORDER BY price_bucket ASC, o_orderpriority ASC
    LIMIT 5 OFFSET 5
    """,
)
def l3_agg_composite_histogram(spark, sf_dir):
    """L3 [ES parity]: ``composite`` aggregation with a ``histogram``
    SOURCE — (price histogram interval 50000, priority terms) bucket
    tuples in key order, page 2 via the after-key cursor (oracle:
    OFFSET page-size).  A histogram source is just another per-row key
    expression, so the map-side after-key pushdown works unchanged —
    the property that makes composite THE scalable paging surface
    (operators/aggs.py composite_histogram_source / composite_agg)."""
    orders = load_table(spark, sf_dir, "orders").select(
        aggs.composite_histogram_source("o_totalprice", 50000,
                                        name="price_bucket"),
        "o_orderpriority",
    )
    page1 = aggs.composite_agg(
        orders, ["price_bucket", "o_orderpriority"], size=5
    ).collect()
    cursor = (page1[-1]["price_bucket"], page1[-1]["o_orderpriority"])
    return aggs.composite_agg(
        orders, ["price_bucket", "o_orderpriority"], size=5, after=cursor
    )


@register(
    "l3_span_multi_query",
    f"""
    WITH {_SPAN_TOKS_CTE}
    SELECT doc_id, count(*)::BIGINT AS n_spans FROM (
      SELECT a.doc_id, a.pos AS s, b.pos AS e
      FROM p a JOIN p b ON a.doc_id = b.doc_id
      WHERE a.tok LIKE 'sp%' AND b.tok = 'join'
        AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
    ) GROUP BY doc_id ORDER BY doc_id
    """,
)
def l3_span_multi_query(spark, sf_dir):
    """L3 [ES parity]: ``span_multi`` — the multi-term span wrapper
    (here a ``prefix`` matcher) composed inside ``span_near``: any
    `sp*` token followed by `join` within a gap budget of 2, span
    counts per document.  ES rewrites the wrapped query into a
    position-carrying disjunction over matching vocabulary terms; the
    re-expression keeps the disjunction implicit as ONE per-token
    pattern predicate feeding the same span-array algebra — no
    vocabulary expansion, no explode, one codegen-span expression;
    the oracle replays it as a positional self-join with a LIKE
    prefix (operators/spans.py span_spec_expr, span_multi node)."""
    from bigdatasearchpro_spark.operators.spans import span_spec_expr

    docs = load_table(spark, sf_dir, "documents")
    spec = {"span_near": {
        "clauses": [
            {"span_multi": {"match": {"prefix": {"value": "sp"}}}},
            {"span_term": "join"},
        ],
        "slop": 2, "in_order": True,
    }}
    spans = span_spec_expr("text", spec)
    return (
        docs.select("doc_id", F.size(spans).cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy("doc_id")
    )


@register(
    "s36_async_search",
    """
    SELECT lang, count(*)::BIGINT AS doc_count,
           sum(n_chars)::BIGINT AS sum_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def s36_async_search(spark, sf_dir):
    """S36 [ES parity]: ``_async_search`` lifecycle — submit a grouped
    search over a 4-shard lang-routed index, tick 2 shards and fetch a
    PARTIAL response (is_partial, and — because routing colocates each
    lang in exactly one shard — every partial row is the EXACT final
    row for its completed shard's langs, asserted here), tick the
    rest, fetch the final response, delete the search.  Each fetch is
    ONE filter + hash aggregate whose shard predicate PRUNES the
    routed scan to completed shard directories; the final reduce
    equals the whole-index aggregate, which the oracle replays
    (api.submit/tick/get/delete_async_search)."""
    import uuid

    from bigdatasearchpro_spark import api

    docs = load_table(spark, sf_dir, "documents")
    name = f"async_probe_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, docs, name, id_col="doc_id",
                           routing_col="lang", n_shards=4)
    try:
        sub = api.submit_async_search(spark, name, group_by="lang",
                                      sum_col="n_chars")
        assert sub["is_partial"] and sub["completed_shards"] == 0
        api.tick_async_search(spark, sub["id"], shards=2)
        part = api.get_async_search(spark, sub["id"])
        assert part["is_partial"] and part["completed_shards"] == 2
        partial_rows = {tuple(r) for r in part["response"].collect()}
        st = api.tick_async_search(spark, sub["id"], shards=2)
        assert not st["is_running"]
        fin = api.get_async_search(spark, sub["id"])
        assert not fin["is_partial"]
        rows = fin["response"].collect()
        # routed-shard partials are exact finals for their langs
        assert partial_rows < {tuple(r) for r in rows}
        assert api.delete_async_search(spark, sub["id"])
    finally:
        api.delete_index(spark, name)
    return spark.createDataFrame(
        rows, "lang string, doc_count bigint, sum_chars bigint"
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# streaming TSDB downsample (continuous metrics rollup at ingest)
# ---------------------------------------------------------------------------

@register(
    "st15_streaming_downsample",
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
def st15_streaming_downsample(spark, sf_dir):
    """§2.9 [ES parity]: TSDB downsampling AT INGEST — the s37 rollup
    (per (event_type, host, hour): count/min/max/DECIMAL-sum/gauge
    last) run as ONE streaming aggregation over the events fixture
    replayed in 3 micro-batches (complete mode).  The gauge last-value
    is ``max_by(value, (ts, event_id))`` — a declarative aggregate the
    incremental state store maintains, so the streaming form needs no
    window at all; final state == the batch rollup == the DuckDB
    oracle (streaming/pipelines.py run_to_completion)."""
    import shutil
    import tempfile

    from bigdatasearchpro_spark.streaming.pipelines import run_to_completion

    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="st15_src_")
    ck = tempfile.mkdtemp(prefix="st15_ck_")
    try:
        for i in range(3):
            (ev.filter(F.col("event_id") % 3 == i)
               .coalesce(1).write.mode("append").parquet(src))
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rolled = (
            stream.withColumn("host", F.col("user_id") % 8)
            .groupBy(
                "event_type", "host",
                F.date_trunc("hour", F.col("ts")).alias("bucket"),
            )
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.min("value").alias("v_min"),
                F.max("value").alias("v_max"),
                F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("v_sum"),
                F.max_by(
                    "value", F.struct(F.col("ts"), F.col("event_id"))
                ).alias("v_last"),
            )
        )
        got = run_to_completion(rolled, checkpoint_dir=ck,
                                output_mode="complete")
        rows = (
            got.select("event_type", "host", "bucket", "doc_count",
                       "v_min", "v_max", "v_sum", "v_last")
            .orderBy("event_type", "host", "bucket")
            .collect()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, host bigint, bucket timestamp, "
        "doc_count bigint, v_min double, v_max double, "
        "v_sum double, v_last double",
    )
