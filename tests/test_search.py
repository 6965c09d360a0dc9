"""Search ring (SURVEY.md L3 + T1): boolean match, TF-IDF/BM25 scoring
properties, top-k determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import search

QUERY = "spark join window"


def test_match_all_subset_of_any(docs):
    any_ids = {r["doc_id"] for r in search.keyword_match(docs, QUERY, mode="any").collect()}
    all_ids = {r["doc_id"] for r in search.keyword_match(docs, QUERY, mode="all").collect()}
    assert all_ids <= any_ids
    assert len(any_ids) > 0


def test_match_empty_query_returns_nothing(docs):
    assert search.keyword_match(docs, "", mode="any").count() == 0


def test_topk_scores_positive_sorted_deterministic(docs):
    for scoring in ("tfidf", "bm25"):
        top = search.search_topk(docs, QUERY, 10, scoring=scoring).collect()
        assert len(top) == 10
        scores = [r["score"] for r in top]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        again = search.search_topk(docs, QUERY, 10, scoring=scoring).collect()
        assert [r["doc_id"] for r in top] == [r["doc_id"] for r in again]


def test_topk_hits_match_boolean_semantics(docs):
    any_ids = {r["doc_id"] for r in search.keyword_match(docs, QUERY, mode="any").collect()}
    top = search.search_topk(docs, QUERY, 10, scoring="bm25").collect()
    assert {r["doc_id"] for r in top} <= any_ids


def test_idf_rare_term_scores_above_common(spark):
    # 1 doc with "uniqterm", all docs with "common": a doc matching the
    # rare term must outrank a doc matching only the common term.
    rows = [(0, "uniqterm common")] + [(i, "common filler") for i in range(1, 50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = search.search_topk(docs, "uniqterm common", 5, scoring="bm25").collect()
    assert top[0]["doc_id"] == 0


def test_inverted_index_consistent_with_direct(docs):
    postings, doclen = search.build_inverted_index(docs)
    terms = search.analyze_query(QUERY)
    direct = (
        search.tokenize(docs)
        .select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    via_index = postings.filter(F.col("term").isin(terms)).select("doc_id", "term", "tf")
    assert direct.exceptAll(via_index).count() == 0
    assert via_index.exceptAll(direct).count() == 0


def test_indexed_search_matches_direct(spark, docs):
    """The materialized-index path must return bit-identical scores to
    query-time tokenization — the index is an access path, not a
    semantics change."""
    from bigdatasearchpro_spark.operators import search

    q = "spark join window"
    postings, doclen = search.build_inverted_index(docs)
    n_docs, avgdl = search.corpus_stats(doclen)
    direct = search.search_topk(docs, q, 10, scoring="bm25").collect()
    indexed = search.search_topk_indexed(
        postings, doclen, q, 10, n_docs=n_docs, avgdl=avgdl
    ).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_indexed_keyword_match_matches_direct(spark, docs):
    from bigdatasearchpro_spark.operators import search

    q = "spark join window"
    postings, _ = search.build_inverted_index(docs)
    for mode in ("any", "all"):
        direct = {
            r.doc_id
            for r in search.keyword_match(docs, q, mode=mode).select("doc_id").collect()
        }
        indexed = {
            r.doc_id for r in search.keyword_match_indexed(postings, q, mode=mode).collect()
        }
        assert direct == indexed, mode


def test_phrase_match_requires_consecutive_order(spark):
    from bigdatasearchpro_spark.operators import search

    df = spark.createDataFrame(
        [
            (1, "big data search engine"),
            (2, "search big data tools"),     # phrase order broken
            (3, "big DATA, search!"),         # punctuation/case analyzed away
            (4, "big and data search"),       # not consecutive
            (5, "prefix big data search suffix"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in search.phrase_match(df, "Big Data Search").collect()}
    assert got == {1, 3, 5}
