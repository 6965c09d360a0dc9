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


def test_fuzzy_decontaminate_thresholds_and_exact_copy(spark):
    """Jaccard-ratio decontamination: an exact copy hits ratio 1.0, a
    disjoint doc never flags, and a partial overlap flags only when it
    clears the threshold."""
    from bigdatasearchpro_spark.operators.curation import fuzzy_decontaminate

    base = "a b c d e f g h i j k l m n o p"  # 16 tokens -> 9 8-shingles
    docs = spark.createDataFrame(
        [
            (1, base),                                # exact copy of bench
            (2, "z y x w v u t s r q p2 o2 n2 m2"),   # disjoint
            (3, base + " q r s t u v w x y z aa bb"), # superset: partial ratio
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    hits = {
        (r["doc_id"], r["bench_id"]): (r["inter"], r["n_doc"], r["n_bench"])
        for r in fuzzy_decontaminate(docs, bench, n=8, thr_num=1, thr_den=10).collect()
    }
    assert (1, 100) in hits and hits[(1, 100)][0] == hits[(1, 100)][2]  # full overlap
    assert not any(d == 2 for d, _ in hits)
    assert (3, 100) in hits  # 9 shared of (21+9-9)=21 union -> 0.43 >= 0.1
    # tighter threshold drops the partial overlap but keeps the copy
    tight = {
        r["doc_id"]
        for r in fuzzy_decontaminate(docs, bench, n=8, thr_num=9, thr_den=10).collect()
    }
    assert tight == {1}


def test_quality_deciles_partition_and_order(spark, sf_dir):
    from bigdatasearchpro_spark.operators.curation import quality_deciles
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    import pytest

    with pytest.raises(ValueError):
        quality_deciles(docs)  # global sort requires explicit opt-in
    out = quality_deciles(docs, exact_global=True).collect()
    n = len(out)
    assert n > 0
    per = {}
    for r in out:
        assert 1 <= r["decile"] <= 10
        per.setdefault(r["decile"], []).append(r["logit_scaled"])
    # deciles are contiguous score ranges and near-equal sized
    sizes = [len(per[d]) for d in sorted(per)]
    assert max(sizes) - min(sizes) <= 1
    for d in range(1, 10):
        if d in per and d + 1 in per:
            assert max(per[d]) <= min(per[d + 1])


def test_domain_mixture_quotas_and_determinism(spark, sf_dir):
    from bigdatasearchpro_spark.operators.curation import domain_mixture
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    quotas = {"src0": 7, "src1": 3}
    out = domain_mixture(docs, quotas).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], set()).add(r["doc_id"])
    assert set(by_dom) == {"src0", "src1"}  # unlisted domains dropped
    assert len(by_dom["src0"]) == 7 and len(by_dom["src1"]) == 3
    # deterministic under repartitioning
    again = domain_mixture(docs.repartition(13, "lang"), quotas).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    import pytest

    with pytest.raises(ValueError):
        domain_mixture(docs, {})


def test_quality_deciles_approx_matches_exact_off_boundaries(spark, sf_dir):
    """The approx (no-global-sort) path agrees with the exact ntile
    assignment except at cutpoint boundaries, and its plan has no
    unpartitioned window."""
    from bigdatasearchpro_spark.operators.curation import quality_deciles
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]: r["decile"]
        for r in quality_deciles(docs, exact_global=True).collect()
    }
    approx_df = quality_deciles(docs, approx=True, relative_error=0.001)
    approx = {r["doc_id"]: r["decile"] for r in approx_df.collect()}
    assert set(exact) == set(approx)
    off = sum(1 for d in exact if exact[d] != approx[d])
    # boundary ties only: a small fraction, never a bucket away > 1
    assert off <= max(2, len(exact) // 20)
    assert all(abs(exact[d] - approx[d]) <= 1 for d in exact)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan


def test_domain_token_budget_admission_rule(spark):
    """Budgets are targets: docs admit while the pre-doc running total
    is under budget, so the crossing doc still lands; zero-budget /
    unlisted domains yield nothing; deterministic under repartition."""
    from bigdatasearchpro_spark.operators.curation import domain_token_budget

    rows = [(i, "s0" if i < 8 else "s1", "tok " * 10) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_token_budget(df, {"s0": 25, "s1": 0}).collect()
    doms = {r["domain"] for r in out}
    assert doms == {"s0"}  # s1 budget 0 -> nothing
    # each doc is 10 tokens; budget 25 -> docs admitted while cum-10 < 25
    # => cum 10, 20, 30 admitted (third crosses), 40 not
    cums = sorted(r["cum_tokens"] for r in out)
    assert cums == [10, 20, 30]
    again = domain_token_budget(
        df.repartition(7, "text"), {"s0": 25, "s1": 0}
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    import pytest

    with pytest.raises(ValueError):
        domain_token_budget(df, {})


def test_url_parts_edges(spark):
    """No path, trailing slash, deep paths, and bare two-label hosts."""
    from bigdatasearchpro_spark.operators.transform import url_parts

    df = spark.createDataFrame(
        [
            (1, "https://example.com"),
            (2, "https://a.b.example.org/x/y/z?q=1"),
            (3, "http://just.net/"),
        ],
        "id long, url string",
    )
    got = {r["id"]: r["u"].asDict() for r in df.select("id", url_parts("url").alias("u")).collect()}
    assert got[1]["domain"] == "example.com" and got[1]["depth"] == 0
    assert got[2]["host"] == "a.b.example.org"
    assert got[2]["domain"] == "example.org" and got[2]["depth"] == 3
    assert got[3]["domain"] == "just.net" and got[3]["depth"] == 0


def test_bpe_encode_hand_computable():
    """The BPE merge algorithm on hand-traceable words: merges apply
    by RANK over the current symbol string, not left-to-right."""
    from bigdatasearchpro_spark.functions.bpe import (
        DEFAULT_MERGES,
        _validate,
        bpe_count_text,
        bpe_encode_word,
    )

    # tiny custom table: rank order decides ('ab' before 'bc')
    ranks = _validate((("a", "b"), ("b", "c"), ("ab", "c")))
    assert bpe_encode_word("abc", ranks) == ["abc"]     # ab then ab+c
    assert bpe_encode_word("bc", ranks) == ["bc"]
    assert bpe_encode_word("cab", ranks) == ["c", "ab"]
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]  # no merges

    # default table: documented single-token words
    assert bpe_encode_word("the") == ["the"]
    assert bpe_encode_word("spark") == ["spark"]
    assert bpe_encode_word("filter") == ["filter"]
    # counts: sum over whitespace-split words; empty/None = 0
    assert bpe_count_text("the the") == 2
    assert bpe_count_text("") == 0 and bpe_count_text(None) == 0
    # non-ASCII falls back to UTF-8 bytes (2 bytes per cyrillic char)
    assert bpe_count_text("Привет") == len("Привет".encode("utf-8"))

    # validator rejects underivable multi-char sides
    import pytest

    with pytest.raises(ValueError):
        _validate((("th", "e"),))
    # the shipped table passes its own validation
    assert _validate(DEFAULT_MERGES)


def test_bpe_token_count_udf_matches_python_twin(spark, sf_dir):
    """The Arrow pandas_udf count equals the Python twin on real
    fixture text."""
    from bigdatasearchpro_spark.functions.bpe import (
        bpe_count_text,
        bpe_token_count,
    )
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    rows = docs.select(
        "doc_id", "text", bpe_token_count("text").alias("n")
    ).collect()
    assert rows
    for r in rows:
        assert r["n"] == bpe_count_text(r["text"]), r["doc_id"]


def test_domain_token_budget_bpe_tokenizer_invariant(spark, sf_dir):
    """tokenizer='bpe' meters the budget in BPE tokens: recomputing
    the admission rule driver-side over the BPE counts reproduces the
    admitted set exactly; an unknown tokenizer raises."""
    import hashlib

    import pytest

    from bigdatasearchpro_spark.functions.bpe import bpe_count_text
    from bigdatasearchpro_spark.operators.curation import domain_token_budget
    from bigdatasearchpro_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    budgets = {"src0": 1200, "src1": 500}
    out = domain_token_budget(docs, budgets, tokenizer="bpe").collect()
    assert out, "budget fixture admitted nothing"

    # driver-side replay: md5(id) order within domain, admit while the
    # PRE-doc cumulative total is under budget
    by_dom = {}
    for r in docs.select("doc_id", "source", "text").collect():
        by_dom.setdefault(r["source"], []).append(
            (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"],
             bpe_count_text(r["text"]))
        )
    expect = {}
    for dom, rows in by_dom.items():
        if dom not in budgets:
            continue
        cum = 0
        for _, did, n in sorted(rows):
            if cum < budgets[dom]:
                expect[did] = (dom, n, cum + n)
            cum += n
    got = {r["doc_id"]: (r["domain"], r["n_tokens"], r["cum_tokens"])
           for r in out}
    assert got == expect

    with pytest.raises(ValueError):
        domain_token_budget(docs, budgets, tokenizer="nope")


def test_pack_sequences_bpe_tokenizer(spark):
    """tokenizer='bpe' packs by BPE counts: offsets replay from the
    Python twin; analyzer path is unchanged by the parameter."""
    import pytest

    from bigdatasearchpro_spark.functions.bpe import bpe_count_text
    from bigdatasearchpro_spark.operators.curation import pack_sequences

    rows = [(1, "the spark filtering"), (2, "question of tables"),
            (3, "qqq zzz")]
    df = _mini_corpus(spark, rows).withColumn("lang", F.lit("en"))
    out = {r["doc_id"]: r for r in
           pack_sequences(df, max_len=4, shard_col="lang",
                          tokenizer="bpe").collect()}
    expect_offset = 0
    for did, text in rows:
        n = bpe_count_text(text)
        assert out[did]["n_tokens"] == n
        assert out[did]["start_offset"] == expect_offset
        expect_offset += n + 1
    with pytest.raises(ValueError):
        pack_sequences(df, tokenizer="nope")
    with pytest.raises(ValueError):
        pack_sequences(df, tokenizer="bpe", text_col=["text", "text"])


def test_temperature_quotas_upsample_small_domains(spark):
    from bigdatasearchpro_spark.operators import curation

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    q = curation.temperature_quotas(docs, target_total=100, alpha=0.5)
    # natural shares are 90%/10%; sqrt temper pulls toward 75%/25%
    assert q["small"] > 10 and q["big"] < 90
    assert sum(q.values()) <= 100
    # alpha=1.0 reproduces (floored) natural proportions
    q1 = curation.temperature_quotas(docs, target_total=100, alpha=1.0)
    assert q1["big"] == 90 and q1["small"] == 10
    # the drawn sample respects the quotas exactly
    got = curation.domain_mixture(docs, q).groupBy("domain").count().collect()
    by = {r["domain"]: r["count"] for r in got}
    assert by == {d: n for d, n in q.items() if n > 0}
    import pytest as pt

    with pt.raises(ValueError):
        curation.temperature_quotas(docs, target_total=-1)
    with pt.raises(ValueError):
        curation.temperature_quotas(docs, target_total=10, alpha=0)


def test_gopher_rules_hand_fixture(spark):
    """Each Gopher gate verified against hand-computed values on a
    fixture exercising every rule, at the published defaults."""
    from bigdatasearchpro_spark.operators.curation import gopher_rules

    fifty = " ".join(["the", "of"] + ["word"] * 48)       # 50 words, 2 stops
    rows = [
        (1, fifty),                                        # passes all
        (2, "the of " + "word " * 10),                     # too short
        (3, " ".join(["the", "of"] + ["#"] * 10 + ["word"] * 40)),  # symbols
        (4, " ".join(["the", "of"] + ["12345"] * 48)),     # non-alpha words
        (5, " ".join(["word"] * 50)),                      # no stopwords
        (6, " ".join(["the", "of"] + ["ab"] * 48)),        # mean wl < 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=50).collect()}

    assert got[1]["keep"]
    assert not got[2]["r_word_count"] and not got[2]["keep"]
    # doc 3: 12 symbol words of 52 -> 100*12 > 10*52 -> symbol rule fails
    assert not got[3]["r_symbol"] and got[3]["r_word_count"]
    # doc 4: 2 alpha of 50 -> alpha rule fails
    assert not got[4]["r_alpha"]
    assert not got[5]["r_stopwords"] and got[5]["r_alpha"]
    # doc 6: sum_wl = 3+2+2*48 = 101 < 3*50 -> mean-wl rule fails
    assert not got[6]["r_mean_word_len"]
    # integer cross-multiplication boundary: exactly 80% alpha passes
    b = spark.createDataFrame(
        [(7, " ".join(["the", "of"] + ["word"] * 6 + ["123"] * 2))],
        "doc_id long, text string",
    )
    r7 = gopher_rules(b, min_words=1).collect()[0]
    assert r7["r_alpha"] and r7["keep"]


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing the target's vocabulary must out-weigh docs that
    do not; n_tokens counts multiplicity; empty docs drop."""
    from bigdatasearchpro_spark.operators.curation import dsir_log_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "gamma delta gamma delta"),
            (3, "alpha beta"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id = 1")
    out = {r["doc_id"]: r for r in dsir_log_weights(docs, target).collect()}
    assert 4 not in out and out[1]["n_tokens"] == 3
    # per-token average importance: target-vocab docs above off-vocab
    avg = {d: out[d]["log_w"] / out[d]["n_tokens"] for d in out}
    assert avg[3] > avg[2] and avg[1] > avg[2]


def test_substring_dedup_sliding_alignment(spark):
    from bigdatasearchpro_spark.operators.curation import substring_dedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "x alpha beta gamma delta epsilon y"),  # shifted alignment
        (3, "unique words only here nothing shared"),
        (4, ""),
        (5, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           substring_dedup(df, window_tokens=5, min_count=2).collect()}
    # the duplicated 5-token run is removed from BOTH alignments
    assert out[1].clean_text == "zeta" and out[1].n_removed == 5
    assert out[2].clean_text == "x y" and out[2].n_removed == 5
    # untouched / empty / below-window docs survive whole
    assert out[3].n_removed == 0
    assert (out[4].n_tokens, out[4].n_removed, out[4].clean_text) == (0, 0, "")
    assert out[5].clean_text == "short doc"

    # within-doc repetition also counts as duplication
    rep = spark.createDataFrame(
        [(1, "a b c d e pad pad pad a b c d e",)],
        "doc_id long, text string",
    )
    r = substring_dedup(rep, window_tokens=5, min_count=2).first()
    assert r.n_removed == 10 and r.clean_text == "pad pad pad"

    # hashed-window scale path gives the same answer
    hashed = {r.doc_id: (r.n_removed, r.clean_text) for r in
              substring_dedup(df, window_tokens=5, min_count=2,
                              hash_windows=True).collect()}
    assert hashed == {k: (v.n_removed, v.clean_text)
                      for k, v in out.items()}

    import pytest as pt

    with pt.raises(ValueError):
        substring_dedup(df, window_tokens=1)
    with pt.raises(ValueError):
        substring_dedup(df, min_count=1)


def test_ccnet_buckets_thirds_per_language(spark):
    from bigdatasearchpro_spark.operators.curation import ccnet_buckets

    # 6 'en' docs of varying fluency + one unscorable fragment + 3 'de'
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat", "en"),
        (3, "the cat sat on the mat", "en"),
        (4, "mat the on sat cat zz", "en"),
        (5, "qq ww ee rr tt yy", "en"),
        (6, "x", "en"),                      # < 2 tokens: unscorable
        (7, "guten tag welt", "de"),
        (8, "guten tag welt", "de"),
        (9, "zz yy xx", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in ccnet_buckets(df).collect()}
    assert len(out) == 9
    # per-language thirds: en has 6 docs -> 2 per bucket
    en = [out[i].bucket for i in range(1, 7)]
    assert en.count("head") == 2 and en.count("middle") == 2 \
        and en.count("tail") == 2
    # the unscorable fragment lands in the tail
    assert out[6].bucket == "tail" and out[6].avg_logprob is None
    # de has 3 docs -> one per bucket; repeated fluent docs rank first
    assert {out[7].bucket, out[8].bucket, out[9].bucket} == {
        "head", "middle", "tail"}
    assert out[9].bucket == "tail"


def test_leakage_safe_split_keeps_clusters_together(spark):
    from bigdatasearchpro_spark.operators.curation import leakage_safe_split

    # 40 docs in 10 exact-dup clusters of 4
    rows = [(c * 4 + i, f"cluster text {c}") for c in range(10)
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).collect()
    assert len(out) == 40
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    # every cluster lives in exactly one split, anchored at min id
    assert all(len(s) == 1 for s in by_group.values())
    assert set(by_group) == {c * 4 for c in range(10)}

    # explicit cluster table (the near-dup form): merge two clusters
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(8)] + [(i, i) for i in range(8, 40)],
        "doc_id long, group_id long",
    )
    merged = leakage_safe_split(df, clusters).collect()
    g0 = {r.split for r in merged if r.group_id == 0}
    assert len(g0) == 1 and sum(r.group_id == 0 for r in merged) == 8

    # a doc with no cluster row is its own group (left-join coalesce)
    partial = spark.createDataFrame([(0, 0)], "doc_id long, group_id long")
    solo = {r.doc_id: r.group_id
            for r in leakage_safe_split(df.limit(3), partial).collect()}
    assert solo[0] == 0 and solo[1] == 1 and solo[2] == 2


def test_length_bucketed_batches_minimize_padding(spark):
    from bigdatasearchpro_spark.operators.curation import (
        length_bucketed_batches,
    )

    # 8 docs of wildly mixed lengths in one shard, batch_size 4:
    # sorted batching puts the 4 short and 4 long together
    rows = [(i, " ".join(["w"] * n), "en")
            for i, n in enumerate([1, 2, 100, 3, 110, 4, 120, 130])]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.batch_id: r for r in
           length_bucketed_batches(df, batch_size=4).collect()}
    assert set(out) == {0, 1}
    assert out[0].max_tokens == 4 and out[0].n_docs == 4
    assert out[1].max_tokens == 130
    # bucketed padding beats any layout that mixes short+long
    total_padded = sum(r.padded_tokens for r in out.values())
    assert total_padded == 4 * 4 + 4 * 130
    assert all(r.sum_tokens <= r.padded_tokens for r in out.values())
    import pytest as pt

    with pt.raises(ValueError):
        length_bucketed_batches(df, batch_size=0)


def test_weighted_token_budget_discounts_duplicates(spark, sf_dir):
    from bigdatasearchpro_spark.operators import curation, dedup
    from bigdatasearchpro_spark.sources.files import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    weighted = dedup.soft_dedup_weights(corpus, "text")
    budgets = {"src0": 600}
    plain = curation.domain_token_budget(weighted, budgets)
    soft = curation.domain_token_budget(
        weighted, budgets, weight_ppm_col="weight_ppm"
    )
    # discounted tokens are never larger, so the same budget admits at
    # least as many documents (strictly more here: src0 has dup copies)
    assert soft.count() >= plain.count()
    # per-row: weighted n_tokens == floor(raw * ppm / 1e6)
    raw = curation.domain_token_budget(
        weighted, {"src0": 10**9}
    ).select("doc_id", F.col("n_tokens").alias("raw"))
    both = soft.join(raw, "doc_id").select(
        "n_tokens", "raw", "weight_ppm"
    )
    bad = both.filter(
        F.col("n_tokens")
        != F.floor(F.col("raw") * F.col("weight_ppm") / F.lit(1_000_000))
    )
    assert bad.count() == 0


def test_curriculum_order_phases_and_within_phase_shuffle(spark):
    """Phase 1 holds the top-quality quartile per language; the seq
    column is 1..n per group and phase-monotonic (all phase-1 docs
    precede all phase-2 docs in training order)."""
    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "fr"
        # longer, wordier docs score a higher quality logit
        n = 60 + (i % 10) * 20
        rows.append((i, lang, " ".join(f"w{j} the be to of" for j in range(n // 5))))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curation.curriculum_order(docs, per_col="lang", phases=4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "fr"}
    for lang, grp in by_lang.items():
        grp.sort(key=lambda r: r["seq_in_lang"])
        assert [r["seq_in_lang"] for r in grp] == list(range(1, len(grp) + 1))
        # training order never goes back to an earlier phase
        phases = [r["phase"] for r in grp]
        assert phases == sorted(phases)
        # phase 1 logits dominate phase 4 logits
        p1 = [r["logit_scaled"] for r in grp if r["phase"] == 1]
        p4 = [r["logit_scaled"] for r in grp if r["phase"] == 4]
        assert min(p1) >= max(p4)


def test_shuffle_shards_deterministic_and_growth_stable(spark):
    """Same id -> same shard on every run; adding new documents never
    moves an existing document's shard (md5, not arrival order)."""
    rows = [(i, f"tok{i} alpha beta") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["shard"] for r in curation.shuffle_shards(docs, 16).collect()}
    assert set(a.values()) <= set(range(16))
    grown = spark.createDataFrame(
        rows + [(1000 + i, f"new{i}") for i in range(50)],
        "doc_id long, text string",
    )
    b = {r["doc_id"]: r["shard"] for r in curation.shuffle_shards(grown, 16).collect()}
    assert all(b[i] == a[i] for i in a)
    # token counts are whitespace words
    tok = {r["doc_id"]: r["n_tokens"] for r in curation.shuffle_shards(docs, 16).collect()}
    assert tok[0] == 3


def test_intra_doc_dedup_keeps_first_occurrence(spark):
    """'a b a b' at seg_tokens=2 is two identical segments -> one kept;
    misaligned repetition is untouched; unique docs pass through."""
    rows = [
        (1, "a b a b"),            # segs: [a b][a b] -> 1 removed
        (2, "x a b a"),            # segs: [x a][b a] -> distinct, kept
        (3, "q r s"),              # segs: [q r][s]   -> unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in curation.intra_doc_dedup(docs, seg_tokens=2).collect()
    }
    assert (out[1]["n_segments"], out[1]["n_removed"]) == (2, 1)
    assert out[1]["clean_text"] == "a b"
    assert (out[2]["n_segments"], out[2]["n_removed"]) == (2, 0)
    assert out[2]["clean_text"] == "x a b a"
    assert (out[3]["n_segments"], out[3]["n_removed"]) == (2, 0)
    assert out[3]["clean_text"] == "q r s"


def test_tokenizer_fertility_python_twin(spark):
    """The per-group sums equal the pure-Python BPE twin computed
    row-by-row; the ratios are the single divisions of those sums."""
    from bigdatasearchpro_spark.functions.bpe import bpe_count_text

    rows = [
        (1, "en", "the quick brown fox"),
        (2, "en", "jumps over the lazy dog"),
        (3, "de", "der schnelle braune fuchs"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["lang"]: r
        for r in curation.tokenizer_fertility(docs, group_col="lang").collect()
    }
    for lang in ("en", "de"):
        texts = [t for (_, lg, t) in rows if lg == lang]
        bpe = sum(bpe_count_text(t) for t in texts)
        words = sum(len(t.split()) for t in texts)
        nbytes = sum(len(t.encode("utf-8")) for t in texts)
        r = out[lang]
        assert (r["n_docs"], r["bpe_tokens"], r["ws_words"], r["n_bytes"]) == (
            len(texts), bpe, words, nbytes,
        )
        assert r["fertility"] == bpe / words
        assert r["bytes_per_token"] == nbytes / bpe


def test_canonical_url_normalization_rules(spark):
    """Case, default ports, query, fragment, and trailing slash all
    collapse; distinct paths stay distinct."""
    from bigdatasearchpro_spark.operators import transform

    rows = [
        (1, "https://Sub.Example.net/A/b?utm=1#frag"),
        (2, "http://sub.example.net:80/A/b/"),
        (3, "https://sub.example.net:443/A/b?q=2"),
        (4, "https://sub.example.net/A/c"),
        (5, "https://other.net:8080/A/b"),   # any port is transparent
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", transform.canonical_url("url").alias("c")).collect()}
    assert got[1] == got[2] == got[3] == "sub.example.net/A/b"
    assert got[4] == "sub.example.net/A/c"
    assert got[5] == "other.net/A/b"
    assert got[5] != got[1]  # distinct host still distinct
