"""ES 6.x query-string parser + the round-2 search shapes: multi-field,
range, wildcard, pagination/highlighting."""

from __future__ import annotations

import pytest

from bigdatasearchpro_spark.operators import search
from bigdatasearchpro_spark.operators.querystring import (
    And,
    Not,
    Or,
    Phrase,
    Range,
    Term,
    Wildcard,
    parse_query_string,
    query_string_filter,
)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_precedence_not_and_or():
    # NOT > AND > OR; adjacency == OR (ES default operator)
    ast = parse_query_string("a b OR c AND NOT d")
    assert ast == Or(
        (
            Term(None, "a"),
            Term(None, "b"),
            And((Term(None, "c"), Not(Term(None, "d")))),
        )
    )


def test_parse_field_scoping_and_shapes():
    ast = parse_query_string('lang:en source:src1 title:"big data" f:[a TO b]')
    assert ast == Or(
        (
            Term("lang", "en"),
            Term("source", "src1"),
            Phrase("title", "big data"),
            Range("f", "a", "b", True, True),
        )
    )


def test_parse_range_variants():
    assert parse_query_string("f:{0 TO 9}") == Range("f", "0", "9", False, False)
    assert parse_query_string("f:[2020 TO *]") == Range("f", "2020", None, True, True)
    assert parse_query_string("[aa TO bb]") == Range(None, "aa", "bb", True, True)


def test_parse_negation_forms():
    assert parse_query_string("-x") == Not(Term(None, "x"))
    assert parse_query_string("!x") == Not(Term(None, "x"))
    assert parse_query_string("NOT x") == Not(Term(None, "x"))
    assert parse_query_string("+x") == Term(None, "x")


def test_parse_wildcards():
    ast = parse_query_string("dat* f?o *oo*")
    assert ast == Or(
        (Wildcard(None, "dat*"), Wildcard(None, "f?o"), Wildcard(None, "*oo*"))
    )


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_query_string("(a OR b")  # unbalanced
    with pytest.raises(ValueError):
        parse_query_string("field: x :y")  # malformed field clause


# ---------------------------------------------------------------------------
# compiled semantics
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mini(spark):
    return spark.createDataFrame(
        [
            (1, "big data search engine", "en", "web"),
            (2, "the spark engine joins data", "en", "crawl"),
            (3, "datum and database notes", "de", "web"),
            (4, "unrelated text entirely", "fr", "book"),
        ],
        "doc_id long, text string, lang string, source string",
    )


def test_query_string_field_scope_and_bool(mini):
    got = {
        r.doc_id
        for r in query_string_filter(mini, "lang:en AND data").collect()
    }
    assert got == {1, 2}


def test_query_string_phrase_and_not(mini):
    got = {
        r.doc_id
        for r in query_string_filter(mini, '"big data" OR (database AND NOT lang:en)').collect()
    }
    assert got == {1, 3}


def test_query_string_wildcard_and_range(mini):
    # dat* matches data/datum/database; range [dat TO dave] the same set
    w = {r.doc_id for r in query_string_filter(mini, "dat*").collect()}
    r = {r.doc_id for r in query_string_filter(mini, "[dat TO dave]").collect()}
    assert w == {1, 2, 3}
    assert r == {1, 2, 3}


def test_query_string_default_field_is_all_columns(mini):
    # 'web' appears only in the source column; unscoped term still hits
    got = {r.doc_id for r in query_string_filter(mini, "web").collect()}
    assert got == {1, 3}


def test_query_string_unknown_field_raises(mini):
    with pytest.raises(ValueError, match="unknown field"):
        query_string_filter(mini, "nope:x").collect()


def test_multifield_keyword_match(mini):
    got = {
        r.doc_id
        for r in search.keyword_match(
            mini, "en web", text_col=["text", "lang", "source"], mode="all"
        ).collect()
    }
    assert got == {1}


def test_range_query_bounds(mini):
    incl = {r.doc_id for r in search.range_query(mini, "data", "datum").collect()}
    excl = {
        r.doc_id
        for r in search.range_query(
            mini, "data", "datum", include_lo=False, include_hi=False
        ).collect()
    }
    assert incl == {1, 2, 3}       # data, database, datum
    assert excl == {3}             # only 'database' strictly inside


def test_wildcard_match_shapes(mini):
    mid = {r.doc_id for r in search.wildcard_match(mini, "d*base").collect()}
    q = {r.doc_id for r in search.wildcard_match(mini, "engin?").collect()}
    assert mid == {3}
    assert q == {1, 2}


# ---------------------------------------------------------------------------
# pagination + highlighting
# ---------------------------------------------------------------------------

def test_paged_continuation_and_ranks(docs):
    q = "spark join window"
    top20 = search.search_topk(docs, q, 20).collect()
    p1 = search.search_paged(docs, q, size=10, from_=0, highlight=False).collect()
    p2 = search.search_paged(docs, q, size=10, from_=10, highlight=False).collect()
    assert [r.doc_id for r in p1] + [r.doc_id for r in p2] == [
        r.doc_id for r in top20
    ]
    assert [r.rank for r in p1] == list(range(1, 11))
    assert [r.rank for r in p2] == list(range(11, 21))


def test_paged_highlight_wraps_query_terms(docs):
    out = search.search_paged(docs, "spark join window", size=5, from_=0).collect()
    assert len(out) == 5
    for r in out:
        assert "<em>" in r.highlight
        inner = [
            s.split("</em>")[0].lower()
            for s in r.highlight.split("<em>")[1:]
        ]
        assert set(inner) <= {"spark", "join", "window"}


# ---------------------------------------------------------------------------
# round-3 grammar: boosts (^N), fuzzy (~N), proximity ("..."~N)
# ---------------------------------------------------------------------------

def test_parse_boost_fuzzy_proximity():
    assert parse_query_string("engine^2") == Term(None, "engine", None, 2.0)
    assert parse_query_string("enginn~1") == Term(None, "enginn", 1)
    assert parse_query_string("enginn~") == Term(None, "enginn", 2)  # ES AUTO
    assert parse_query_string("enginn~1^0.5") == Term(None, "enginn", 1, 0.5)
    assert parse_query_string('"big engine"~2') == Phrase(None, "big engine", 2)
    assert parse_query_string('"big engine"~2^3') == Phrase(None, "big engine", 2, 3.0)
    assert parse_query_string("dat*^4") == Wildcard(None, "dat*", 4.0)
    assert parse_query_string("f:val~1") == Term("f", "val", 1)
    # tilde mid-word is literal text, not fuzziness
    assert parse_query_string("a~b") == Term(None, "a~b")


def test_parse_fuzzy_wildcard_combo_rejected():
    with pytest.raises(ValueError):
        parse_query_string("dat*~1")


def test_fuzzy_clause_matches_vocab_variants(mini):
    # levenshtein(datum, data) = 2 (sub u->a + del m): ~2 reaches 'data'
    got = {r.doc_id for r in query_string_filter(mini, "datum~2").collect()}
    assert got >= {1, 2, 3}
    got1 = {r.doc_id for r in query_string_filter(mini, "datum~1").collect()}
    assert got1 == {3}
    # exact term for contrast
    exact = {r.doc_id for r in query_string_filter(mini, "datum").collect()}
    assert exact == {3}


def test_proximity_clause_window(mini):
    # doc 2: "the spark engine joins data" — spark..joins are 2 apart
    assert {
        r.doc_id for r in query_string_filter(mini, '"spark joins"~1').collect()
    } == {2}
    # slop 0 via quoted phrase (exact adjacency) does not match
    assert query_string_filter(mini, '"spark joins"').count() == 0
    # order still required: reversed terms never match in ordered-window slop
    assert query_string_filter(mini, '"joins spark"~3').count() == 0


def test_proximity_three_terms(spark):
    df = spark.createDataFrame(
        [(1, "a x b y c"), (2, "a b c"), (3, "c b a"), (4, "a x x x b c")],
        "doc_id long, text string",
    )
    # window = k-1+slop positions between first and last
    assert {
        r.doc_id for r in query_string_filter(df, '"a b c"~2').collect()
    } == {1, 2}
    assert {
        r.doc_id for r in query_string_filter(df, '"a b c"~3').collect()
    } == {1, 2, 4}


def test_boost_reorders_ranking(mini):
    from bigdatasearchpro_spark.operators.querystring import (
        parse_query_string as p,
        weighted_terms,
    )

    assert weighted_terms(p("engine^3 OR data")) == [("engine", 3.0), ("data", 1.0)]
    # max-boost wins for a term reachable twice
    assert weighted_terms(p("x^2 OR x")) == [("x", 2.0)]
    top = search.search_topk(
        mini, "database spark", 4, term_weights=[5.0, 1.0]
    ).collect()
    # doc 3 holds 'database'; with 5x boost it must outrank the spark doc
    assert top[0].doc_id == 3


def test_minimum_should_match_top_level_or(mini):
    # 4 OR'd terms; doc 2 "the spark engine joins data" hits spark+joins+data... tokens
    all_docs = {r.doc_id for r in query_string_filter(mini, "data engine search notes").collect()}
    assert all_docs == {1, 2, 3}
    two = {
        r.doc_id
        for r in query_string_filter(
            mini, "data engine search notes", minimum_should_match=2
        ).collect()
    }
    # doc1: data+engine+search (3), doc2: data+engine (2), doc3: notes (1)
    assert two == {1, 2}
    three = {
        r.doc_id
        for r in query_string_filter(
            mini, "data engine search notes", minimum_should_match=3
        ).collect()
    }
    assert three == {1}
    # m=1 degenerates to plain OR
    one = {
        r.doc_id
        for r in query_string_filter(
            mini, "data engine search notes", minimum_should_match=1
        ).collect()
    }
    assert one == all_docs


# ---------------------------------------------------------------------------
# Nested dotted-path field scoping (dotted_path_resolver)
# ---------------------------------------------------------------------------


def test_nested_field_json_string(spark):
    from bigdatasearchpro_spark.operators.querystring import query_string_filter

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "alpha"}'),
            (2, '{"k": 65, "tag": "beta"}'),
            (3, '{"k": 68, "tag": "alpha"}'),
        ],
        ["id", "props"],
    )
    got = sorted(
        r["id"]
        for r in query_string_filter(df, "props.k:[60 TO 69]").collect()
    )
    assert got == [2, 3]
    got = sorted(
        r["id"] for r in query_string_filter(df, "props.tag:alpha").collect()
    )
    assert got == [1, 3]


def test_nested_field_struct_and_map(spark):
    from pyspark.sql import Row

    from bigdatasearchpro_spark.operators.querystring import query_string_filter

    df = spark.createDataFrame(
        [
            Row(id=1, meta=Row(author=Row(name="ada"), lang="en"), m={"x": "one"}),
            Row(id=2, meta=Row(author=Row(name="bob"), lang="de"), m={"x": "two"}),
        ]
    )
    assert [
        r["id"] for r in query_string_filter(df, "meta.author.name:ada").collect()
    ] == [1]
    assert [
        r["id"]
        for r in query_string_filter(df, "meta.lang:de AND m.x:two").collect()
    ] == [2]
    # struct member access must PRUNE the scan to the leaf, and an
    # unknown dotted path still errors like an unknown field
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown field"):
        query_string_filter(df, "meta.nope.deep:x").collect()


def test_nested_field_phrase_and_bool(spark):
    from bigdatasearchpro_spark.operators.querystring import query_string_filter

    df = spark.createDataFrame(
        [
            (1, '{"title": "fast spark engine"}'),
            (2, '{"title": "slow spark engine"}'),
        ],
        ["id", "doc"],
    )
    got = [
        r["id"]
        for r in query_string_filter(
            df, 'doc.title:"fast spark" AND NOT doc.title:slow'
        ).collect()
    ]
    assert got == [1]


def test_exists_query(spark):
    from bigdatasearchpro_spark.operators.querystring import query_string_filter

    df = spark.createDataFrame(
        [
            (1, "x", '{"k": 1}'),
            (2, None, "{}"),
            (3, "y", '{"k": 3}'),
        ],
        "id long, tag string, props string",
    )
    got = lambda q: sorted(
        r["id"] for r in query_string_filter(df, q).collect()
    )
    assert got("_exists_:tag") == [1, 3]
    assert got("NOT _exists_:tag") == [2]
    # nested path: absent JSON key is NULL, like ES object fields
    assert got("_exists_:props.k") == [1, 3]
    assert got("_exists_:props.k AND tag:y") == [3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown field"):
        query_string_filter(df, "_exists_:nope").collect()


# ---------------------------------------------------------------------------
# simple_query_string
# ---------------------------------------------------------------------------

def test_simple_qs_parser_shapes():
    from bigdatasearchpro_spark.operators.querystring import (
        And, Not, Or, Phrase, Term, Wildcard, parse_simple_query_string as p,
    )

    n = p('"the spark" join -window | group*', default_operator="and")
    assert isinstance(n, Or) and len(n.children) == 2
    left, right = n.children
    assert isinstance(left, And) and isinstance(right, Wildcard)
    assert isinstance(left.children[0], Phrase)
    assert isinstance(left.children[2], Not)
    # AND binds tighter than OR under default 'and'
    n2 = p("x | y z", default_operator="and")
    assert isinstance(n2, Or) and isinstance(n2.children[1], And)
    # default 'or' flattens adjacency with '|'
    n3 = p("a b | c")
    assert isinstance(n3, Or) and len(n3.children) == 3
    # fuzzy suffix
    n4 = p("foo~1")
    assert isinstance(n4, Term) and n4.fuzzy == 1


def test_simple_qs_is_lenient_never_throws():
    from bigdatasearchpro_spark.operators.querystring import (
        Or, parse_simple_query_string as p,
    )

    for junk in ["", "-", "|", "+", "((", "))", '"unterminated',
                 "a ) b (", "-|+ ("]:
        node = p(junk)  # must not raise
        assert node is not None
    assert p(")a(").__class__.__name__ == "Term"
    assert p("|||") == Or(())


def test_simple_qs_filter_matches_full_grammar(docs):
    from bigdatasearchpro_spark.operators.querystring import (
        query_string_filter,
        simple_query_string_filter,
    )

    simple = simple_query_string_filter(
        docs, "spark +join -window", default_operator="and",
        default_field="text",
    )
    full = query_string_filter(docs, "spark AND join AND NOT window",
                               default_field="text")
    a = sorted(r.doc_id for r in simple.select("doc_id").collect())
    b = sorted(r.doc_id for r in full.select("doc_id").collect())
    assert a == b and a
