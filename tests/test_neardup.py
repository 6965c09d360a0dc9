"""Near-duplicate detection (SURVEY.md L2): recall on planted
near-dups, precision of verification, signature determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import neardup


def _planted(docs):
    """Append a lightly-mutated copy of every 10th doc (id+100000)."""
    mutated = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzmutation")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(mutated)


def test_minhash_lsh_finds_planted_pairs(docs):
    data = _planted(docs)
    n_planted = data.filter(F.col("doc_id") >= 100000).count()
    pairs = neardup.minhash_lsh_pairs(
        data, n_perms=32, bands=8, shingle_k=5, jaccard_threshold=0.5
    ).collect()
    found = {(r["left_id"], r["right_id"]) for r in pairs}
    planted_ids = [r["doc_id"] for r in
                   data.filter(F.col("doc_id") >= 100000).select("doc_id").collect()]
    planted = {(d - 100000, d) for d in planted_ids}
    recall = len(found & planted) / max(len(planted), 1)
    assert recall >= 0.9, f"recall {recall}: {len(found & planted)}/{len(planted)}"
    # verification: every returned pair really has Jaccard >= threshold
    assert all(r["jaccard_sim"] >= 0.5 for r in pairs)
    assert all(r["left_id"] < r["right_id"] for r in pairs)


def test_minhash_signatures_deterministic(docs):
    a = neardup.minhash_signatures(docs.limit(50)).collect()
    b = neardup.minhash_signatures(docs.limit(50)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_planted_pairs_low_hamming(docs):
    data = _planted(docs)
    pairs = neardup.simhash_pairs(data, max_hamming=8, n_chunks=9).collect()
    found = {(r["left_id"], r["right_id"]) for r in pairs}
    planted_ids = [r["doc_id"] for r in data.filter(F.col("doc_id") >= 100000).collect()]
    planted = {(d - 100000, d) for d in planted_ids}
    recall = len(found & planted) / max(len(planted), 1)
    assert recall >= 0.9, f"simhash recall {recall}"
    assert all(0 <= r["hamming"] <= 8 for r in pairs)


def test_registry_simhash_entry_capped_recall(spark, sf_dir):
    """Twin for the CAPPED l2_simhash_pairs registry entry (rows-only
    at the driver): the per-doc cap must not cost planted-pair recall
    — a mutated twin differs by one appended token, so it ranks among
    its base doc's nearest — and no left doc may exceed the cap."""
    from collections import Counter

    from bigdatasearchpro_spark.registry import QUERIES

    rows = QUERIES["l2_simhash_pairs"](spark, sf_dir).collect()
    pairs = {(r["left_id"], r["right_id"]) for r in rows}
    per_left = Counter(left for left, _ in pairs)
    assert max(per_left.values()) <= 10
    planted_found = sum(1 for l, r in pairs if r == l + 100000)
    # the corpus plants one mutant per 10th doc; recall over that set
    import duckdb
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    n_planted = duckdb.sql(
        f"SELECT count(*) FROM '{src}' WHERE doc_id % 10 = 0"
    ).fetchone()[0]
    assert planted_found / n_planted >= 0.9


def test_ngram_prefix_filter_equals_exhaustive(docs):
    """The AllPairs prefix-filter candidate step must be EXACT: output
    identical to the exhaustive quadratic form on the planted corpus
    (same pairs, same rounded scores), with and without a blocking
    column — the rarest-common-gram lemma in practice."""
    data = _planted(docs).withColumn(
        "src", (F.col("doc_id") % 3).cast("string")
    )
    for kwargs in ({}, {"block_col": "src"}):
        fast = {
            (r["left_id"], r["right_id"], r["jaccard_sim"])
            for r in neardup.ngram_jaccard_pairs(
                data, n=3, threshold=0.5, prefilter="prefix", **kwargs
            ).collect()
        }
        slow = {
            (r["left_id"], r["right_id"], r["jaccard_sim"])
            for r in neardup.ngram_jaccard_pairs(
                data, n=3, threshold=0.5, prefilter="none", **kwargs
            ).collect()
        }
        assert fast == slow
        assert fast, "planted corpus must produce pairs"


def test_simhash_per_doc_cap_keeps_exact_nearest(docs):
    """per_doc_cap must return EXACTLY each canonical-left doc's k
    nearest pairs of the uncapped output under (hamming asc, right_id
    asc) — the two-stage band-local + global pruning is an exact
    top-k, not an approximation (the band-local rank of a globally
    top-k pair can never exceed its global rank)."""
    data = _planted(docs)
    k = 3
    uncapped = neardup.simhash_pairs(data, max_hamming=7, n_chunks=8).collect()
    capped = neardup.simhash_pairs(
        data, max_hamming=7, n_chunks=8, per_doc_cap=k
    ).collect()

    by_left: dict = {}
    for r in uncapped:
        by_left.setdefault(r["left_id"], []).append(
            (r["hamming"], r["right_id"])
        )
    want = {
        (left, rid, h)
        for left, lst in by_left.items()
        for h, rid in sorted(lst)[:k]
    }
    got = {(r["left_id"], r["right_id"], r["hamming"]) for r in capped}
    assert got == want
    from collections import Counter

    per_left = Counter(r["left_id"] for r in capped)
    assert max(per_left.values()) <= k


def test_ngram_jaccard_exact_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different text about spark joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = neardup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    assert {(r["left_id"], r["right_id"]) for r in pairs} == {(1, 2)}


def test_resolve_duplicate_groups_components(spark):
    from bigdatasearchpro_spark.operators.neardup import resolve_duplicate_groups

    # components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (star on 21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "left_id long, right_id long",
    )
    got = {r.doc_id: r.group_id for r in resolve_duplicate_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_by_pairs_keeps_canonical_and_unpaired(spark, docs):
    from bigdatasearchpro_spark.operators import neardup

    mutated = docs.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(mutated)
    pairs = neardup.minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
    kept = neardup.dedup_by_pairs(corpus, pairs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # every mutated clone's pair resolved to the original (smaller id)
    found = {r.left_id for r in pairs.collect()} | {r.right_id for r in pairs.collect()}
    for r in pairs.collect():
        lo, hi = min(r.left_id, r.right_id), max(r.left_id, r.right_id)
        assert hi not in kept_ids or lo in kept_ids
    # unpaired docs all survive
    assert all(
        (r.doc_id in kept_ids) for r in corpus.collect() if r.doc_id not in found
    )


def test_simhash_rejects_hamming_beyond_pigeonhole(docs):
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        neardup.simhash_pairs(docs, max_hamming=8, n_chunks=4)


def test_minhash_estimate_tracks_exact_jaccard(docs):
    """Signature-agreement estimate vs exact shingle Jaccard on planted
    near-dup pairs: with 32 permutations (sigma ~= 0.09) the mean
    absolute error stays small. Deterministic — hashes are seeded."""
    data = _planted(docs.limit(100))
    sig = neardup.minhash_signatures(data, n_perms=32)
    sig_map = {r["doc_id"]: [r[f"mh{i}"] for i in range(32)] for r in sig.collect()}
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in neardup.exploded_shingles(data)
        .groupBy("doc_id")
        .agg(F.collect_set(F.xxhash64("__s")).alias("sh"))
        .collect()
    }
    pairs = [(d - 100000, d) for d in sig_map if d >= 100000 and d - 100000 in sig_map]
    assert pairs
    errs = []
    for a, b in pairs:
        est = sum(x == y for x, y in zip(sig_map[a], sig_map[b])) / 32.0
        exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        errs.append(abs(est - exact))
    assert sum(errs) / len(errs) < 0.12, f"mean abs err {sum(errs)/len(errs):.3f}"
    assert max(errs) < 0.40, f"max abs err {max(errs):.3f}"


def test_portable_minhash_finds_planted_pairs(docs):
    """The md5/modular-affine hash family must behave like xxhash64 on
    the planted near-dups (same recall target, verified pairs only)."""
    data = _planted(docs)
    pairs = neardup.minhash_lsh_pairs(
        data, n_perms=32, bands=8, shingle_k=5, jaccard_threshold=0.5,
        hash_fn="portable",
    ).collect()
    found = {(r["left_id"], r["right_id"]) for r in pairs}
    planted = {
        (d - 100000, d)
        for d in [r["doc_id"] for r in
                  data.filter(F.col("doc_id") >= 100000).select("doc_id").collect()]
    }
    recall = len(found & planted) / max(len(planted), 1)
    assert recall >= 0.9
    assert all(r["jaccard_sim"] >= 0.5 for r in pairs)


def test_portable_hash_matches_duckdb(spark):
    """The portable hash family is the oracle contract: base hash and
    affine permutations must be bit-equal in DuckDB."""
    import duckdb

    from bigdatasearchpro_spark.operators.neardup import (
        PORTABLE_PRIME,
        portable_hash_long,
        portable_perm_consts,
    )

    words = ["hello", "spark", "zzzmutation", "", "Ünïcode"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    (a0, b0), (a1, b1) = portable_perm_consts(2)
    got = {
        r["s"]: (r["h"], r["p0"], r["p1"])
        for r in df.select(
            "s",
            portable_hash_long(F.col("s")).alias("h"),
            ((F.lit(a0) * (portable_hash_long(F.col("s")) % PORTABLE_PRIME) + F.lit(b0))
             % PORTABLE_PRIME).alias("p0"),
            ((F.lit(a1) * (portable_hash_long(F.col("s")) % PORTABLE_PRIME) + F.lit(b1))
             % PORTABLE_PRIME).alias("p1"),
        ).collect()
    }
    con = duckdb.connect()
    for w in words:
        h, p0, p1 = con.execute(
            f"SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT AS h, "
            f"({a0} * (('0x' || substring(md5(?), 1, 15))::BIGINT % {PORTABLE_PRIME}) + {b0}) % {PORTABLE_PRIME}, "
            f"({a1} * (('0x' || substring(md5(?), 1, 15))::BIGINT % {PORTABLE_PRIME}) + {b1}) % {PORTABLE_PRIME}",
            [w, w, w],
        ).fetchone()
        assert got[w] == (h, p0, p1), w


def test_simhash_packed_equals_wide(docs):
    """The lane-packed vote accumulation must be BIT-identical to the
    original 64-column ±1 SUM formulation."""
    data = _planted(docs)
    packed = {
        (r["doc_id"], r["__sim"])
        for r in neardup.simhash_signatures(data, impl="packed").collect()
    }
    wide = {
        (r["doc_id"], r["__sim"])
        for r in neardup.simhash_signatures(data, impl="wide").collect()
    }
    assert packed == wide


def test_simhash_skew_guard_preserves_pairs(docs):
    """Forcing every bucket hot (max_bucket=0) must return the same
    verified pairs as the unguarded path — the secondary pigeonhole is
    recall-exact, not approximate."""
    data = _planted(docs).limit(400)
    plain = {
        (r["left_id"], r["right_id"], r["hamming"])
        for r in neardup.simhash_pairs(data, max_bucket=None).collect()
    }
    guarded = {
        (r["left_id"], r["right_id"], r["hamming"])
        for r in neardup.simhash_pairs(data, max_bucket=0).collect()
    }
    assert guarded == plain


def test_simhash_skew_guard_caps_bucket_fanout(spark):
    """Planted skew: many docs sharing low-16 signature bits. The guard
    re-bands hot buckets so no band's join fan-out stays quadratic."""
    from bigdatasearchpro_spark.operators.neardup import (
        _split_hot_buckets,
        simhash_signatures,
    )

    # identical short docs -> identical signatures -> one white-hot bucket
    rows = [(i, "hot bucket payload shared by all") for i in range(300)] + [
        (1000 + i, f"cool doc number {i} with words w{i} x{i*7%13}") for i in range(100)
    ]
    data = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_signatures(data)
    bounds = [0, 16, 32, 48, 64]
    chunked = sigs.select(
        "doc_id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__sim"), bounds[c])
                        .bitwiseAND(F.lit((1 << 16) - 1))
                        .alias("ch"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("__c"),
    ).select("doc_id", "__sim", "__c.chunk", "__c.ch")
    banded = _split_hot_buckets(chunked, bounds, max_hamming=3, max_bucket=50)
    sizes = (
        banded.groupBy("chunk", "ch", "sub", "subch")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # the hot identical-signature bucket CANNOT be split by signature
    # bits (all equal) — it stays one band per sub-chunk; but every
    # mixed bucket must respect the cap once re-banded. Assert the
    # guard fans hot buckets out into > 1 band overall and cold
    # buckets keep their single -1 band.
    assert any(r["sub"] >= 0 for r in sizes)  # hot path exercised
    assert any(r["sub"] == -1 for r in sizes)  # cold path intact
    # re-banded hot buckets: each original hot (chunk, ch) now appears
    # as max_hamming+1 sub-bands
    from collections import defaultdict

    subs = defaultdict(set)
    for r in sizes:
        if r["sub"] >= 0:
            subs[(r["chunk"], r["ch"])].add(r["sub"])
    assert all(s == {0, 1, 2, 3} for s in subs.values())


def test_ngram_per_doc_cap_keeps_exact_best(docs):
    """per_doc_cap must return EXACTLY each canonical-left doc's k best
    pairs of the uncapped output under (jaccard_sim desc, right_id asc)
    — the two-stage bucket-local + global pruning is an exact top-k:
    a pair's bucket-local rank never exceeds its global rank under the
    same total order, and the prefix recall lemma still guarantees
    every qualifying pair reaches some bucket."""
    data = _planted(docs).withColumn(
        "src", (F.col("doc_id") % 3).cast("string")
    )
    k = 2
    for kwargs in ({}, {"block_col": "src"}):
        uncapped = neardup.ngram_jaccard_pairs(
            data, n=3, threshold=0.3, **kwargs
        ).collect()
        capped = neardup.ngram_jaccard_pairs(
            data, n=3, threshold=0.3, per_doc_cap=k, **kwargs
        ).collect()
        by_left: dict = {}
        for r in uncapped:
            by_left.setdefault(r["left_id"], []).append(
                (-r["jaccard_sim"], r["right_id"])
            )
        want = {
            (left, rid, -negj)
            for left, lst in by_left.items()
            for negj, rid in sorted(lst)[:k]
        }
        got = {
            (r["left_id"], r["right_id"], r["jaccard_sim"]) for r in capped
        }
        assert got == want
        from collections import Counter

        per_left = Counter(r["left_id"] for r in capped)
        assert not per_left or max(per_left.values()) <= k
