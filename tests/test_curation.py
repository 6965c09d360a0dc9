"""Corpus-curation operators (operators/curation.py): duplicated-
segment removal, benchmark decontamination, sequence packing —
invariants beyond the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import curation


def _mini_corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = " ".join(f"b{i}" for i in range(20))  # one exact 20-token segment


def test_segment_dedup_cuts_boilerplate_keeps_unique(spark):
    """A shared 20-token header is removed from every doc; each doc's
    unique remainder survives verbatim and in order."""
    uniq = {i: " ".join(f"u{i}x{j}" for j in range(40)) for i in range(4)}
    rows = [(i, f"{BOILER} {uniq[i]}") for i in range(4)]
    rows.append((99, " ".join(f"solo{j}" for j in range(10))))
    out = {
        r["doc_id"]: r
        for r in curation.segment_dedup(
            _mini_corpus(spark, rows), seg_tokens=20
        ).collect()
    }
    for i in range(4):
        assert out[i]["n_segments"] == 3  # header + 2 unique segments
        assert out[i]["n_removed"] == 1
        assert out[i]["clean_text"] == uniq[i]
    assert out[99]["n_removed"] == 0
    assert out[99]["clean_text"] == " ".join(f"solo{j}" for j in range(10))


def test_segment_dedup_doc_reduced_to_nothing(spark):
    """A document that is ONLY boilerplate keeps its row with an empty
    clean_text (the doc survives as an empty shell, not a lost row)."""
    rows = [(1, BOILER), (2, BOILER), (3, "alpha beta gamma")]
    out = {
        r["doc_id"]: r
        for r in curation.segment_dedup(
            _mini_corpus(spark, rows), seg_tokens=20
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
    assert out[3]["clean_text"] == "alpha beta gamma"


def test_segment_dedup_threshold(spark):
    """max_doc_frequency=2 keeps a segment shared by exactly 2 docs."""
    rows = [(1, BOILER), (2, BOILER)]
    out = curation.segment_dedup(
        _mini_corpus(spark, rows), seg_tokens=20, max_doc_frequency=2
    ).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_decontaminate_flags_quoting_docs_only(spark):
    """Docs quoting a benchmark span are flagged; unrelated docs are
    not; a shingle match shorter than n does not count."""
    span = " ".join(f"q{i}" for i in range(8))
    rows = [
        (1, f"intro words here {span} outro words"),   # quotes the span
        (2, "totally unrelated content of some length"),
        (3, f"partial {' '.join(f'q{i}' for i in range(7))} only"),  # 7 < n
    ]
    bench = _mini_corpus(spark, [(100, span)]).select("text")
    out = {
        r["doc_id"]: r["matched_ngrams"]
        for r in curation.decontaminate(
            _mini_corpus(spark, rows), bench, n=8
        ).collect()
    }
    assert out == {1: 1}


def test_decontaminate_counts_distinct_overlaps(spark):
    span = " ".join(f"q{i}" for i in range(10))  # 3 distinct 8-grams
    rows = [(1, span)]
    bench = _mini_corpus(spark, [(100, span)]).select("text")
    out = curation.decontaminate(_mini_corpus(spark, rows), bench, n=8).collect()
    assert out[0]["matched_ngrams"] == 3


def test_pack_sequences_offsets_are_contiguous_per_shard(docs):
    """Within a shard, each doc starts exactly one EOS after the
    previous doc's last token; chunk ids follow from the offsets."""
    packed = curation.pack_sequences(docs, max_len=512, shard_col="lang").collect()
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rows:
            assert r["start_offset"] == expect
            assert r["first_chunk"] == r["start_offset"] // 512
            last_tok = r["start_offset"] + max(r["n_tokens"] - 1, 0)
            assert r["last_chunk"] == last_tok // 512
            assert r["first_chunk"] <= r["last_chunk"]
            expect = r["start_offset"] + r["n_tokens"] + 1


def test_pack_sequences_straddles_boundaries(spark):
    """With a tiny max_len, docs straddle chunk boundaries and the
    first/last chunk ids reflect it."""
    rows = [(1, " ".join(f"a{i}" for i in range(6))),
            (2, " ".join(f"b{i}" for i in range(6)))]
    df = _mini_corpus(spark, rows).withColumn("lang", F.lit("en"))
    out = {r["doc_id"]: r for r in
           curation.pack_sequences(df, max_len=4, shard_col="lang").collect()}
    assert out[1]["start_offset"] == 0
    assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 1)
    assert out[2]["start_offset"] == 7
    assert (out[2]["first_chunk"], out[2]["last_chunk"]) == (1, 3)


def test_segment_dedup_is_idempotent(spark):
    """Running segment_dedup on an already-cleaned corpus removes
    nothing further (the boilerplate is gone; remainders are unique)."""
    uniq = {i: " ".join(f"u{i}x{j}" for j in range(40)) for i in range(4)}
    rows = [(i, f"{BOILER} {uniq[i]}") for i in range(4)]
    once = curation.segment_dedup(_mini_corpus(spark, rows), seg_tokens=20)
    again = curation.segment_dedup(
        once.select(F.col("doc_id"), F.col("clean_text").alias("text")),
        seg_tokens=20,
    ).collect()
    assert all(r["n_removed"] == 0 for r in again)


def test_pack_sequences_property_random_corpus(spark):
    """Property: for any corpus, per-shard offsets are a contiguous
    EOS-separated layout and chunk ids are floor-div of offsets."""
    import random

    rng = random.Random(42)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", (F.col("doc_id") % 3).cast("string")
    )
    out = curation.pack_sequences(df, max_len=64, shard_col="lang").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 200
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rows_:
            assert r["start_offset"] == expect
            assert r["first_chunk"] == r["start_offset"] // 64
            last_tok = r["start_offset"] + max(r["n_tokens"] - 1, 0)
            assert r["last_chunk"] == last_tok // 64
            expect += r["n_tokens"] + 1
