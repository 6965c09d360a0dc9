"""Full-text search ring (SURVEY.md L3 + T1).

The reference exposes keyword search by posting the user's ``q=`` string
straight to Elasticsearch's URI-search endpoint
(``indexView.html:13-19``); its own query methods return null
(``ElasticServiceImpl.java:127-136``). ES 6.x semantics for that path:
standard analysis (split on non-alphanumerics + lowercase), boolean
term match (OR), BM25 scoring, top-10 by ``_score``. This module
re-homes those semantics natively as DataFrame programs.

Scale design (100 TB corpus):
- Tokenization/TF are narrow map-side ops (explode + hash-agg with
  partial aggregation) — no driver involvement.
- Query terms are a tiny literal set: we filter the exploded tokens to
  query terms FIRST, so the per-term document-frequency aggregation
  shuffles only matching (doc, term) pairs, not the whole corpus.
- Corpus-level constants (N, avg doc length) are single scalar
  aggregates, broadcast by Catalyst as literals after ``.first()`` —
  acceptable: two tiny jobs, or precomputed once in the inverted index.
- For repeated queries, ``build_inverted_index`` materializes
  (term, doc_id, tf) + doc-length tables partitioned by term so a query
  touches only its terms' partitions.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ES standard-analyzer-alike: lowercase, split on any non-alphanumeric run.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def analyze_query(q: str) -> list[str]:
    """Driver-side analysis of the query string (same analyzer)."""
    return [t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t]


def tokenize(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    """Standard-analyzer tokenization as a narrow projection."""
    return df.withColumn(
        out,
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != ""),
    )


def _term_freqs(docs: DataFrame, id_col: str, text_col: str, terms: Sequence[str]) -> DataFrame:
    """(doc, term, tf) for query terms only — filter before the shuffle."""
    toks = tokenize(docs, text_col).select(
        id_col, F.explode("tokens").alias("term")
    )
    return (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def keyword_match(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "any",
) -> DataFrame:
    """Boolean keyword match (the SQL-oracle-able subset of L3).

    ``mode='any'`` = ES URI-search default (OR); ``'all'`` = AND.
    Returns the matching rows of ``docs`` unchanged.
    """
    if mode not in ("any", "all"):
        raise ValueError(f"unknown mode: {mode!r} (use 'any' or 'all')")
    terms = analyze_query(query)
    if not terms:
        return docs.limit(0)
    from bigdatasearchpro_spark.sources.files import fan_out

    tf = _term_freqs(fan_out(docs), id_col, text_col, terms)
    hits = tf.groupBy(id_col).agg(F.countDistinct("term").alias("__nterms"))
    if mode == "all":
        hits = hits.filter(F.col("__nterms") == len(set(terms)))
    return docs.join(hits.select(id_col), id_col, "left_semi")


def search_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scoring: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Scored top-k keyword search — the reference's end-user query path
    (T1: top-10 by ``_score`` desc) run natively.

    ``scoring='tfidf'``: score = sum_t tf(t,d) * ln(N / df(t)).
    ``scoring='bm25'`` : Robertson/ES-style
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
        score  = sum_t idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen))

    Deterministic: score rounded to ``round_to`` decimals and ties broken
    by ``id_col`` asc, so the result is oracle-comparable.
    """
    terms = analyze_query(query)
    if not terms:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    if scoring not in ("tfidf", "bm25"):
        raise ValueError(f"unknown scoring: {scoring}")

    from bigdatasearchpro_spark.sources.files import fan_out

    # The exploded term rows carry the document length along (constant
    # per doc), so no doc-length table exists and no shuffle joins it
    # back — at 100 TB that join was a full reshuffle of one row per
    # document. The (N, avgdl) scalar aggregate below is a second scan
    # that re-runs the tokenizer; the materialized-index path
    # (search_topk_indexed + corpus_stats persisted at build time) is
    # what removes it for repeated queries.
    toked = fan_out(docs).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != ""
        ).alias("__toks"),
    )
    # (N, avgdl): one scalar aggregate over the corpus — in the
    # index-once path these constants are persisted at build time
    # (see search_topk_indexed) and this scan disappears.
    srow = toked.agg(
        F.count("*").alias("n"), F.avg(F.size("__toks")).alias("avgdl")
    ).first()
    n_docs, avgdl = int(srow["n"]), float(srow["avgdl"] or 0.0)

    tf = (
        toked.select(
            F.col(id_col),
            F.size("__toks").cast("double").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(list(terms)))  # prune before the shuffle
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    df_stats = tf.groupBy("term").agg(F.count("*").alias("df"))

    if scoring == "tfidf":
        scored = tf.join(F.broadcast(df_stats), "term").withColumn(
            "__s", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
        )
    else:
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        scored = tf.join(F.broadcast(df_stats), "term").withColumn(
            "__s",
            idf
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )

    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("__s"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def build_inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Materializable inverted index: (term, doc_id, tf) postings and a
    (doc_id, dl) doc-length table.

    Index-once/query-many is the reference's whole product shape (bulk
    load then search, ``BulkProcessImpl.java:82-157``); writing the
    postings partitioned/bucketed by ``term`` means a query scans only
    its terms' buckets at 100 TB.
    """
    toks = tokenize(docs, text_col)
    postings = (
        toks.select(F.col(id_col), F.explode("tokens").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    doclen = toks.select(F.col(id_col), F.size("tokens").cast("double").alias("dl"))
    return postings, doclen


def corpus_stats(doclen: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — the two corpus constants BM25 needs; persisted next
    to the index at build time so queries never rescan the corpus."""
    row = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    return int(row["n"]), float(row["avgdl"])


def search_topk_indexed(
    postings: DataFrame,
    doclen: DataFrame,
    query: str,
    k: int = 10,
    *,
    n_docs: int,
    avgdl: float,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """BM25 top-k over a *materialized* inverted index — the
    index-once/query-many path (the reference's product shape: bulk
    load, then serve queries, ``BulkProcessImpl.java:82-157``).

    Unlike :func:`search_topk`, no tokenization runs at query time: the
    plan is a filter on ``term`` (pruned to the query terms' buckets
    when the postings table is bucketed by term), a broadcast of the
    per-term document frequencies, and one hash-agg per doc. Scores are
    bit-identical to the direct path (same formula, same rounding).
    """
    terms = analyze_query(query)
    if not terms:
        return postings.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)

    tf = postings.filter(F.col("term").isin(terms))
    df_stats = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(F.broadcast(df_stats), "term")
        .join(doclen, id_col)
        .withColumn(
            "__s",
            idf
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("__s"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def keyword_match_indexed(
    postings: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    mode: str = "any",
) -> DataFrame:
    """Boolean keyword match answered from the materialized inverted
    index: one filter on ``term`` (bucket-pruned when the postings
    table is bucketed by term) + one distinct-count per doc. Returns
    matching doc ids; semantics identical to :func:`keyword_match`
    (OR for ``mode='any'``, AND for ``'all'``)."""
    if mode not in ("any", "all"):
        raise ValueError(f"unknown mode: {mode!r} (use 'any' or 'all')")
    terms = analyze_query(query)
    if not terms:
        return postings.select(id_col).limit(0)
    hits = (
        postings.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col)
        .agg(F.countDistinct("term").alias("__nterms"))
    )
    if mode == "all":
        hits = hits.filter(F.col("__nterms") == len(set(terms)))
    return hits.select(id_col)


def phrase_match(
    docs: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``match_phrase`` semantics: documents containing the phrase's
    analyzer tokens CONSECUTIVELY, in order. Returns matching doc ids.

    Plan shape: positions explode once, filter to the phrase's terms
    (tiny literal set, pruned before any shuffle), then k-1 equi joins
    on (doc, aligned-position) — each join input is only the matching
    term's postings, so cost tracks the phrase terms' document
    frequency, not corpus size. The same construction runs against a
    materialized positional index at scale.
    """
    terms = analyze_query(phrase)
    if not terms:
        return docs.select(id_col).limit(0)
    toked = tokenize(docs, text_col)
    positions = toked.select(
        F.col(id_col), F.posexplode("tokens").alias("pos", "term")
    ).filter(F.col("term").isin(list(terms)))
    aligned = None
    for i, term in enumerate(terms):
        side = positions.filter(F.col("term") == term).select(
            F.col(id_col), (F.col("pos") - F.lit(i)).alias("base")
        )
        aligned = side if aligned is None else aligned.join(side, [id_col, "base"])
    return aligned.select(id_col).distinct()


def prefix_match(
    docs: DataFrame,
    prefix: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``prefix``/trailing-wildcard query shape: documents with any
    analyzer token starting with ``prefix`` (lowercased). Narrow
    explode + startswith filter + distinct ids.

    Index note: hash-bucketed postings can't prune a prefix — the
    indexed form wants the postings SORTED by term (write_bucketed's
    sortBy) so the scan range-skips to the prefix run.
    """
    p = prefix.lower()
    if not p:
        return docs.select(id_col).limit(0)
    return (
        tokenize(docs, text_col)
        .select(F.col(id_col), F.explode("tokens").alias("term"))
        .filter(F.col("term").startswith(p))
        .select(id_col)
        .distinct()
    )


def fuzzy_match(
    docs: DataFrame,
    term: str,
    *,
    max_edits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``fuzzy`` query shape: documents containing a token within
    ``max_edits`` Levenshtein distance of ``term``.

    Plan: distinct (doc, token) pairs, then a codegen'd levenshtein
    against the literal — with the bounded form (Spark >= 3.5 threshold
    argument) the scan prunes early per row. The indexed path runs the
    same filter over the postings vocabulary (|vocab| << corpus)."""
    t = term.lower()
    toks = (
        tokenize(docs, text_col)
        .select(F.col(id_col), F.explode("tokens").alias("term"))
    )
    return (
        toks.filter(F.levenshtein(F.col("term"), F.lit(t)) <= max_edits)
        .select(id_col)
        .distinct()
    )


def regex_match(
    docs: DataFrame,
    pattern: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``regexp`` query shape: documents containing a token matching
    the (full-token-anchored) pattern."""
    toks = (
        tokenize(docs, text_col)
        .select(F.col(id_col), F.explode("tokens").alias("term"))
    )
    return (
        toks.filter(F.col("term").rlike(f"^(?:{pattern})$"))
        .select(id_col)
        .distinct()
    )


def bool_query(
    docs: DataFrame,
    *,
    must: Sequence[str] = (),
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    minimum_should_match: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``bool`` query (filter context): must AND-matches, must_not
    excludes, should requires >= ``minimum_should_match`` distinct hits.

    One tokenize + one per-doc aggregate over the union of all clause
    terms (filtered before the shuffle, so the exchange carries only
    (doc_id, term) for query terms); verdicts are left-joined back so a
    document with zero query-term hits is still judged (it matches when
    ``must`` is empty, ``minimum_should_match`` is 0, and it has no
    must_not term — trivially true with no hits). Re-homes the [ES]
    delegated surface (indexView.html:13-19) natively.
    """
    must_t = sorted({t for q in must for t in analyze_query(q)})
    should_t = sorted({t for q in should for t in analyze_query(q)})
    not_t = sorted({t for q in must_not for t in analyze_query(q)})
    all_t = sorted({*must_t, *should_t, *not_t})
    if not all_t:
        return docs
    from bigdatasearchpro_spark.sources.files import fan_out

    toks = tokenize(fan_out(docs), text_col).select(
        F.col(id_col), F.explode("tokens").alias("term")
    )
    verdicts = (
        toks.filter(F.col("term").isin(all_t))
        .groupBy(id_col)
        .agg(
            F.count_distinct(
                F.when(F.col("term").isin(must_t or ["\x00"]), F.col("term"))
            ).alias("__n_must"),
            F.count_distinct(
                F.when(F.col("term").isin(should_t or ["\x00"]), F.col("term"))
            ).alias("__n_should"),
            F.max(
                F.when(F.col("term").isin(not_t or ["\x00"]), 1).otherwise(0)
            ).alias("__has_not"),
        )
    )
    # No broadcast hint: verdicts is one row per doc containing ANY query
    # term, which can approach |docs| for common terms — AQE picks the
    # strategy from the measured size.
    joined = docs.join(verdicts, id_col, "left")
    return (
        joined.filter(
            (F.coalesce(F.col("__n_must"), F.lit(0)) == len(must_t))
            & (F.coalesce(F.col("__has_not"), F.lit(0)) == 0)
            & (F.coalesce(F.col("__n_should"), F.lit(0)) >= minimum_should_match)
        )
        .drop("__n_must", "__n_should", "__has_not")
    )
