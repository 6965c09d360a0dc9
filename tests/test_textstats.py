"""Text analysis (SURVEY.md L5): quality stats ranges, language ID,
fingerprint determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import textstats


def test_quality_stats_ranges(docs):
    out = textstats.quality_stats(docs)
    bad = out.filter(
        (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
        | (F.col("n_words") < 0) | (F.col("n_tokens") < F.col("n_words"))
        | (F.col("n_chars") < 0)
    )
    assert bad.count() == 0
    assert out.count() == docs.count()


def test_quality_stats_known_values(spark):
    d = spark.createDataFrame([(1, "The cat, the hat!")], "doc_id long, text string")
    r = textstats.quality_stats(d).first()
    assert r["n_chars"] == 17
    assert r["n_words"] == 4
    assert r["n_tokens"] == 6  # the cat , the hat !
    assert abs(r["punct_ratio"] - 2 / 17) < 1e-3
    assert abs(r["stopword_ratio"] - 0.5) < 1e-9  # the, the of 4 tokens


def test_lang_id_english_markers(spark):
    d = spark.createDataFrame(
        [(1, "the cat and the dog is with us"), (2, "der hund und die katze mit")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(d).collect()}
    assert got == {1: "en", 2: "de"}


def test_fingerprint_deterministic_and_content_sensitive(spark):
    d = spark.createDataFrame(
        [(1, "identical content here"), (2, "identical content here"), (3, "different")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["fp_min"], r["fp_max"], r["fp_xor"])
            for r in textstats.fingerprint(d).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_redact_pii_masks_and_preserves(spark):
    from bigdatasearchpro_spark.operators.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at a.b+c@d-e.org today"),
            (1, "call +1 (555) 010-1234 now"),
            (2, "digits 12345 stay, year 2024 stays"),
            (3, "both x@y.io and 555-010-9999 go"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> now"
    assert got[2] == "digits 12345 stay, year 2024 stays"
    assert got[3] == "both <EMAIL> and <PHONE> go"


def test_dataset_split_invariants(docs):
    from bigdatasearchpro_spark.operators.textstats import dataset_split

    a = dataset_split(docs.select("doc_id"))
    b = dataset_split(docs.select("doc_id").repartition(7))
    ma = {r.doc_id: r.split for r in a.collect()}
    mb = {r.doc_id: r.split for r in b.collect()}
    assert ma == mb  # stable across partitioning/reruns
    n = len(ma)
    from collections import Counter

    c = Counter(ma.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] > c["val"] > 0 and c["test"] > 0  # all splits populated
    assert abs(c["val"] / n - 0.10) < 0.05 and abs(c["test"] / n - 0.10) < 0.05
    # portable (md5) family: same invariants, same stability
    p1 = dataset_split(docs.select("doc_id"), hash_fn="portable")
    p2 = dataset_split(docs.select("doc_id").repartition(7), hash_fn="portable")
    mp = {r.doc_id: r.split for r in p1.collect()}
    assert mp == {r.doc_id: r.split for r in p2.collect()}
    cp = Counter(mp.values())
    assert set(cp) <= {"train", "val", "test"} and len(mp) == n
    assert abs(cp["val"] / n - 0.10) < 0.05 and abs(cp["test"] / n - 0.10) < 0.05
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dataset_split(docs.select("doc_id"), hash_fn="sha1")


def test_chunk_documents_covers_and_overlaps(spark):
    from bigdatasearchpro_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 450), (2, "b" * 150), (3, "c" * 151), (4, "short")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # ceil(len/stride) chunks per doc, min 1
    assert {d: len(v) for d, v in by_doc.items()} == {1: 3, 2: 1, 3: 2, 4: 1}
    # consecutive chunks overlap by size - stride chars; concatenation
    # of stride-prefixes + last chunk reconstructs the document
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        full = "".join(r.chunk_text[:150] for r in rows[:-1]) + rows[-1].chunk_text
        src = dict((r.doc_id, r.text) for r in df.collect())[d]
        assert full == src
        for a, b in zip(rows, rows[1:]):
            assert a.chunk_text[150:] == b.chunk_text[: len(a.chunk_text) - 150]
    assert all(r.chunk_len == len(r.chunk_text) for r in out)


def test_stratified_sample_deterministic_and_capped(docs):
    from bigdatasearchpro_spark.operators.textstats import stratified_sample

    rates = {"en": 25, "zh": 60}
    a = {r.doc_id for r in stratified_sample(docs, rates, default_pct=100).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(13), rates, default_pct=100).collect()
    }
    assert a == b  # identical kept set under repartitioning
    full = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    by_lang_total = {}
    by_lang_kept = {}
    for d, lang in full.items():
        by_lang_total[lang] = by_lang_total.get(lang, 0) + 1
        if d in a:
            by_lang_kept[lang] = by_lang_kept.get(lang, 0) + 1
    # uncapped strata keep everything; capped strata keep ~their rate
    for lang, total in by_lang_total.items():
        kept = by_lang_kept.get(lang, 0)
        if lang not in rates:
            assert kept == total
        else:
            assert kept < total
            assert abs(kept / total - rates[lang] / 100) < 0.15


def test_vocab_topk_and_cms_bounds(docs):
    from bigdatasearchpro_spark.operators.textstats import (
        cms_estimate_counts,
        vocab_topk,
    )

    top = vocab_topk(docs, 10).collect()
    assert len(top) == 10
    ns = [r.n for r in top]
    assert ns == sorted(ns, reverse=True)
    # count-min never undercounts, and overcounts by at most eps * N
    # (with prob >= confidence; eps chosen generously for a small corpus)
    exact = {r.term: r.n for r in top}
    est = cms_estimate_counts(docs, list(exact) + ["zz_absent_term"], width=2048, depth=5)
    total = sum(r.n for r in vocab_topk(docs, 10**9).collect())
    for term, n in exact.items():
        assert est[term] >= n  # CMS never undercounts
        # e/width overcount bound, generous 4x slack for a small corpus
        assert est[term] <= n + (2.72 / 2048) * total * 4
    assert est["zz_absent_term"] <= (2.72 / 2048) * total * 4


def test_bigram_lm_scores_properties(spark):
    from bigdatasearchpro_spark.operators.textstats import bigram_lm_scores

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),  # fluent: repeats corpus patterns
            (3, "mat the on sat cat the"),  # same words, scrambled
            (4, "x"),                        # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert 4 not in rows  # <2 tokens -> no bigram rows
    assert rows[1].n_bigrams == 5
    # log-probs are always <= 0, and the repeated fluent docs outscore
    # the scrambled one (its bigrams are mostly singletons)
    for r in rows.values():
        assert r.avg_logprob <= 0.0
    assert rows[1].avg_logprob == rows[2].avg_logprob
    assert rows[1].avg_logprob > rows[3].avg_logprob


def test_ngram_repetition_signals(spark):
    from bigdatasearchpro_spark.operators.textstats import (
        ngram_repetition_signals,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # heavy 2-gram repetition
            (2, "u v w x y z"),          # all n-grams unique
            (3, "q"),                    # too short for any n: drops out
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_repetition_signals(df).collect()}
    assert set(rows) == {1, 2}
    # doc 1 bigrams: [ab, ba, ab, ba, ab] -> 5 total, 2 distinct
    assert rows[1]["dup_2gram_frac"] == round(1 - 2 / 5, 4)
    assert rows[1]["top_2gram_frac"] == round(3 / 5, 4)
    # doc 2: everything distinct
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[2]["dup_3gram_frac"] == 0.0
    # doc 1 trigrams: [aba, bab, aba, bab] -> 4 total, 2 distinct
    assert rows[1]["dup_3gram_frac"] == 0.5
    assert rows[1]["top_3gram_frac"] == 0.5


def test_script_profile_counts_and_dominance(spark):
    from bigdatasearchpro_spark.operators.textstats import script_profile

    rows = [
        (1, "hello мир 42"),
        (2, "中文字符 ab"),
        (3, "москва и слово"),
        (4, "12345"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert (got[1]["n_latin"], got[1]["n_cyrillic"], got[1]["n_digit"]) == (5, 3, 2)
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["n_cjk"] == 4 and got[2]["dominant_script"] == "cjk"
    assert got[3]["dominant_script"] == "cyrillic" and got[3]["n_cyrillic"] == 12
    assert got[4]["dominant_script"] == "digit"
    assert got[5]["dominant_script"] == "none"
