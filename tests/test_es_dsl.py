"""ES query-DSL extensions: significant_terms / composite aggregations,
more_like_this, rescore, term + completion suggesters.

Deeper invariants than the DuckDB oracles: pagination covers the full
bucket space exactly once, rescore only ever promotes phrase hits,
MLT's seed is its own best match, suggesters respect their caps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import aggs, search, suggest


# ---------------------------------------------------------------- composite


def test_composite_pages_partition_full_bucket_space(docs):
    """Walking composite pages with after-keys enumerates every
    (lang, source) bucket exactly once, in key order, with the same
    counts a single group-by produces."""
    truth = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    seen: dict[tuple, int] = {}
    after = None
    while True:
        page = aggs.composite_agg(docs, ["lang", "source"], size=3, after=after).collect()
        if not page:
            break
        keys = [(r["lang"], r["source"]) for r in page]
        assert keys == sorted(keys)  # in-page key order
        for r in page:
            k = (r["lang"], r["source"])
            assert k not in seen  # no bucket twice across pages
            seen[k] = r["doc_count"]
        after = keys[-1]
        if len(page) < 3:
            break
    assert seen == truth


def test_composite_after_key_arity_checked(docs):
    with pytest.raises(ValueError):
        aggs.composite_agg(docs, ["lang", "source"], after=("en",))


# ------------------------------------------------------- significant terms


def test_significant_terms_lift_is_positive_and_ranked(docs):
    m = search.keyword_match(docs, "spark", mode="any")
    out = aggs.significant_terms_agg(m, docs, size=10).collect()
    assert out
    n_fg = m.count()
    n_bg = docs.count()
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        # every reported term IS lifted: fg% strictly above bg%
        assert r["doc_count"] / n_fg > r["bg_count"] / n_bg
        assert r["score"] > 0
    # the query term itself is maximally lifted (fg% = 100%): present
    assert "spark" in {r["key"] for r in out}


# ------------------------------------------------------------ more_like_this


def test_more_like_this_excludes_seed_and_finds_duplicates(spark, sf_dir, docs):
    hits = search.more_like_this(docs, 0, k=10, max_query_terms=5).collect()
    assert 0 < len(hits) <= 10
    assert all(r["doc_id"] != 0 for r in hits)
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_more_like_this_empty_seed_terms(spark, docs):
    # min_term_freq high enough that no term qualifies -> empty result
    out = search.more_like_this(docs, 0, min_term_freq=10**6)
    assert out.count() == 0


# ------------------------------------------------------------------- rescore


def test_rescore_only_promotes_phrase_hits(docs):
    base = {
        r["doc_id"]: r["score"]
        for r in search.search_topk(docs, "spark join window", 50).collect()
    }
    rescored = search.rescore_topk(
        docs, "spark join window", "spark join",
        window_size=50, k=50, query_weight=1.0, rescore_weight=2.0,
    ).collect()
    assert len(rescored) == len(base)
    phrase_hits = 0
    for r in rescored:
        delta = round(r["score"] - base[r["doc_id"]], 4)
        assert delta in (0.0, 2.0)  # bonus is exactly 0 or rescore_weight
        phrase_hits += delta == 2.0
    # the phrase does occur somewhere in the window (fixture sanity)
    assert phrase_hits > 0


def test_rescore_zero_weight_is_identity_ranking(docs):
    base = search.search_topk(docs, "spark join window", 10).collect()
    same = search.rescore_topk(
        docs, "spark join window", "spark join",
        window_size=50, k=10, query_weight=1.0, rescore_weight=0.0,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in base] == [
        (r["doc_id"], r["score"]) for r in same
    ]


# ---------------------------------------------------------------- suggesters


def test_term_suggester_never_echoes_input_and_orders_properly(docs):
    out = suggest.term_suggester(docs, "par", size=10, max_edits=2).collect()
    assert out
    assert all(r["suggestion"] != "par" for r in out)
    keys = [(r["distance"], -r["doc_freq"], r["suggestion"]) for r in out]
    assert keys == sorted(keys)
    assert {r["suggestion"] for r in out} >= {"part"}  # 1-edit neighbor found


def test_term_suggester_rejects_empty_input(docs):
    with pytest.raises(ValueError):
        suggest.term_suggester(docs, "  ")


def test_phrase_suggester_did_you_mean(docs):
    """The ES phrase suggester: a two-typo phrase must be corrected to
    the corpus-fluent phrase, ranked first by observed-bigram evidence;
    the unchanged input never appears (a suggestion IS a correction)."""
    out = suggest.phrase_suggester(docs, "sprak joni window", size=5).collect()
    assert out
    assert out[0]["suggestion"] == "spark join window"
    assert out[0]["hits"] == 2 and out[0]["bigram_sum"] > 0
    assert all(r["suggestion"] != "sprak joni window" for r in out)
    keys = [(-r["hits"], -r["bigram_sum"]) for r in out]
    assert keys == sorted(keys)
    # score is pure-integer (cross-engine exact by construction)
    assert all(
        isinstance(r["hits"], int) and isinstance(r["bigram_sum"], int)
        for r in out
    )


def test_phrase_suggester_input_guards(docs):
    with pytest.raises(ValueError):
        suggest.phrase_suggester(docs, "   ")
    with pytest.raises(ValueError):
        suggest.phrase_suggester(docs, "a b c d e f g h i")


def test_completion_suggester_prefix_and_cap(docs):
    out = suggest.completion_suggester(docs, "s", size=3).collect()
    assert 0 < len(out) <= 3
    assert all(r["suggestion"].startswith("s") for r in out)
    freqs = [r["doc_freq"] for r in out]
    assert freqs == sorted(freqs, reverse=True)
    # widening the cap never changes the head of the ranking
    wide = suggest.completion_suggester(docs, "s", size=10).collect()
    assert [r["suggestion"] for r in wide[: len(out)]] == [
        r["suggestion"] for r in out
    ]


# --------------------------------------------------------- phrase prefix


def test_phrase_prefix_multi_token_head(spark):
    """3-token query: the 2-token head must run consecutively and the
    tail prefix-matches the NEXT token only."""
    from bigdatasearchpro_spark.operators.search import phrase_prefix_match

    rows = [
        (1, "alpha spark join window beta"),     # hit: head run + 'wi' prefix
        (2, "spark join beta window"),           # miss: 'wi' not adjacent
        (3, "spark beta join window"),           # miss: head not consecutive
        (4, "spark join wildcard"),              # hit: different 'wi' word
        (5, "spark join"),                       # miss: nothing after head
        (6, "prefix spark join winter suffix"),  # hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"] for r in phrase_prefix_match(df, "spark join wi").collect()}
    assert got == {1, 4, 6}


def test_phrase_prefix_single_term_is_prefix_query(spark):
    from bigdatasearchpro_spark.operators.search import phrase_prefix_match

    df = spark.createDataFrame(
        [(1, "windows are here"), (2, "no match"), (3, "rewind time")],
        "doc_id long, text string",
    )
    # single (incomplete) term: plain prefix semantics, not substring
    got = {r["doc_id"] for r in phrase_prefix_match(df, "wind").collect()}
    assert got == {1}


def test_termvectors_per_doc_and_corpus_stats(spark):
    """_termvectors: per-doc term_freq plus corpus doc_freq/ttf
    (term_statistics=true); _mtermvectors is the same call with many
    ids in one scan."""
    from bigdatasearchpro_spark import api

    docs = spark.createDataFrame(
        [(1, "spark join spark"), (2, "join window"), (3, "spark")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["term"]): (r["term_freq"], r["doc_freq"], r["ttf"])
        for r in api.termvectors(docs, [1, 2]).collect()
    }
    assert out[(1, "spark")] == (2, 2, 3)
    assert out[(1, "join")] == (1, 2, 2)
    assert out[(2, "window")] == (1, 1, 1)
    assert (3, "spark") not in out  # id 3 not requested
    lite = api.termvectors(docs, [1], term_statistics=False)
    assert set(lite.columns) == {"doc_id", "term", "term_freq"}
    with pytest.raises(ValueError):
        api.termvectors(docs, [])


def test_cosine_range_search_matches_float_radius(spark):
    """Range search returns exactly the vectors whose int8-quantized
    cosine clears the threshold — verified against a float replay of
    the same quantized decision."""
    import numpy as np

    from bigdatasearchpro_spark.operators import similarity
    from bigdatasearchpro_spark.registry_ext import _RANGE_QUERY_INTS
    from bigdatasearchpro_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {
        r["vec_id"]: r["dot"]
        for r in similarity.cosine_range_search_int8(
            emb, _RANGE_QUERY_INTS, thr_num=225, thr_den=10000
        ).collect()
    }
    q = np.asarray(_RANGE_QUERY_INTS, dtype=np.int64)
    rows = emb.collect()
    expect = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        amax = np.abs(v).max()
        scale = amax / 127.0 if amax > 0 else 1.0
        qi = np.clip(np.floor(v / scale + 0.5), -127, 127).astype(np.int64)
        dot = int(qi @ q)
        if dot > 0 and 10000 * dot * dot >= 225 * int(qi @ qi) * int(q @ q):
            expect[r["vec_id"]] = dot
    assert got == expect and len(got) > 0


def test_phrase_suggester_highlights_changed_tokens(docs):
    """highlight=True wraps exactly the CORRECTED tokens in tags (the
    ES phrase-suggester highlight option); unchanged tokens stay
    bare."""
    out = suggest.phrase_suggester(
        docs, "sprak joni window", size=2, highlight=True
    ).collect()
    top = out[0]
    assert top["suggestion"] == "spark join window"
    assert top["highlighted"] == "<em>spark</em> <em>join</em> window"
    # without the flag the column is absent
    bare = suggest.phrase_suggester(docs, "sprak joni window", size=1)
    assert "highlighted" not in bare.columns


def test_phrase_suggester_single_token_input(docs):
    """One-token input: no bigrams exist, so candidates rank by the
    secondary keys (doc_freq, distance) — still corrections only."""
    out = suggest.phrase_suggester(docs, "sprak", size=3).collect()
    assert out
    assert all(r["hits"] == 0 and r["bigram_sum"] == 0 for r in out)
    assert "spark" in {r["suggestion"] for r in out}
    assert all(r["suggestion"] != "sprak" for r in out)
