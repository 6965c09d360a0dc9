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
