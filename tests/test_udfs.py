"""§2.11 UDF surface + IVF/embedding-neardup operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.functions import udfs
from bigdatasearchpro_spark.operators import similarity
from bigdatasearchpro_spark.sources.files import load_table


def test_pandas_token_count_matches_builtin(docs):
    both = docs.select(
        udfs.pandas_token_count("text").alias("udf_n"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("builtin_n"),
    )
    assert both.filter(F.col("udf_n") != F.col("builtin_n")).count() == 0


def test_weighted_mean_matches_expr(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    udf_side = (
        li.groupBy("l_returnflag")
        .agg(F.round(udfs.weighted_mean_udaf("l_extendedprice", "l_quantity"), 4).alias("w"))
    )
    expr_side = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"),
                4,
            ).alias("w")
        )
    )
    assert sorted(udf_side.collect()) == sorted(expr_side.collect())


def test_zscore_mean_zero_per_group(spark, sf_dir):
    z = udfs.group_zscore(load_table(spark, sf_dir, "orders"))
    stats = z.groupBy("o_orderpriority").agg(
        F.round(F.avg("zscore"), 3).alias("mu"),
        F.round(F.stddev_pop("zscore"), 2).alias("sd"),
    )
    for r in stats.collect():
        assert abs(r["mu"]) < 0.01
        assert abs(r["sd"] - 1.0) < 0.02


def test_quality_filter_threshold(docs):
    out = udfs.batch_quality_filter(docs, min_words=30)
    assert out.filter(F.col("n_words") < 30).count() == 0
    manual = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 30).count()
    assert out.count() == manual


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, qv, 10).collect()}
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(emb, qv, 10, n_cells=8, nprobe=4).collect()
    }
    # probing half the cells must recover at least half the true top-10
    assert len(exact & approx) >= 5
    # the query vector itself (cosine 1.0) is always found
    assert 7 in approx


def test_embedding_cosine_neardup_recall(spark, sf_dir):
    from bigdatasearchpro_spark.registry_ext import _with_synthetic_near_vectors

    emb = _with_synthetic_near_vectors(load_table(spark, sf_dir, "embeddings"))
    pairs = similarity.cosine_similarity_join(emb, emb, 0.99, n_planes=4)
    found = {(r["left_id"], r["right_id"]) for r in pairs.collect()}
    planted = {
        (r["vec_id"], r["vec_id"] + 100000)
        for r in emb.filter(F.col("vec_id") % 10 == 0)
        .filter(F.col("vec_id") < 100000)
        .select("vec_id")
        .collect()
    }
    # LSH at 4 planes: same-bucket probability for ~identical vectors is
    # high; require >= 70% recall of the planted pairs
    assert len(found & planted) >= 0.7 * len(planted)


def test_bpe_train_matches_python_reference(spark):
    """The distributed trainer must learn the identical merge table to
    a sequential pure-python Sennrich trainer on the same corpus."""
    from collections import Counter

    from bigdatasearchpro_spark.functions.bpe import bpe_train

    texts = [
        "the then there other thing",
        "this the that the other",
        "low lower lowest the slow",
    ]

    def python_bpe(texts, n_merges):
        words = Counter()
        for t in texts:
            import re

            for w in re.split(r"[^a-z0-9]+", t.lower()):
                if w:
                    words[w] += 1
        vocab = {tuple(w): n for w, n in words.items()}
        out = []
        for rank in range(n_merges):
            pairs = Counter()
            for sym, n in vocab.items():
                for i in range(len(sym) - 1):
                    pairs[(sym[i], sym[i + 1])] += n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), c = best
            if c < 2:
                break
            out.append((rank, a, b, c))
            new_vocab = {}
            for sym, n in vocab.items():
                s, new, i = list(sym), [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(s[i])
                        i += 1
                new_vocab[tuple(new)] = new_vocab.get(tuple(new), 0) + n
            vocab = new_vocab
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=6)
    want = python_bpe(texts, 6)
    assert got == want

    import pytest as pt

    with pt.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


def test_trained_merges_feed_the_counter(spark):
    """The learned table plugs into the counting half: counting with
    trained ranks compresses vs raw characters, and the ranks dict is
    exactly the (left, right) -> rank shape the encoder consumes."""
    from bigdatasearchpro_spark.functions.bpe import (
        bpe_count_text,
        bpe_train,
    )

    texts = ["the then there the", "the other thing the then"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=4)
    assert merges and merges[0][1:3] == ("t", "h")
    ranks = {(l, r): k for k, l, r, _ in merges}
    probe = "the then there"
    assert bpe_count_text(probe, ranks) < bpe_count_text(probe, {})
    # chars-only baseline: 3+4+5 characters
    assert bpe_count_text(probe, {}) == 12
