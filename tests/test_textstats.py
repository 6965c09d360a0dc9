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
