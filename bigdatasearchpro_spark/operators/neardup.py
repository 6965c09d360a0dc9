"""Near-duplicate detection (SURVEY.md L2): MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design: the quadratic pair space is never materialized. Both
algorithms map each document to a small signature in one narrow pass
(xxhash64 over shingles — JVM-side, seeded, deterministic), then find
candidate pairs with an *equi join on band/chunk keys* (hash shuffle on
a short key), and only candidates get the exact verification. At 100 TB
the shuffle carries (key, doc_id, signature) triples, not documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of lowercased text."""
    t = F.lower(text)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i, k))
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (shingling unit for document-level dedup)."""
    toks = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)]),
        )
    )


def minhash_signature(shingles: Column, n_perms: int = 32) -> Column:
    """n_perms independent min-hashes: h_i = min over shingles of
    xxhash64(shingle, i). Equivalent to permutation MinHash up to hash
    quality; deterministic across runs/engines."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(n_perms)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perms: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    rows = bands of size n_perms/bands; candidate pairs share at least
    one band hash; verification computes true shingle-set Jaccard.
    Returns (left_id, right_id, jaccard_sim), left_id < right_id.
    """
    rows_per_band = n_perms // bands
    shingled = docs.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("__sh")
    )
    sig = shingled.withColumn("__sig", minhash_signature(F.col("__sh"), n_perms))

    # Candidate generation shuffles ONLY (band, band_hash, doc_id) — the
    # shingle arrays stay out of the self-join (at 100 TB they dominate
    # row width; candidates are a tiny fraction of the corpus).
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col("__sig")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    )
    left = banded.select(F.col(id_col).alias("left_id"), "bh")
    right = banded.select(F.col(id_col).alias("right_id"), "bh")
    candidates = (
        left.join(right, "bh")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )

    # Exact-Jaccard verification: join shingle sets back for candidate
    # pairs only.
    lsh = shingled.select(F.col(id_col).alias("left_id"), F.col("__sh").alias("__lsh"))
    rsh = shingled.select(F.col(id_col).alias("right_id"), F.col("__sh").alias("__rsh"))
    return (
        candidates.join(lsh, "left_id")
        .join(rsh, "right_id")
        .withColumn("jaccard_sim", F.round(jaccard(F.col("__lsh"), F.col("__rsh")), 4))
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("left_id", "right_id", "jaccard_sim")
    )


def simhash64(text: Column, *, token_re: str = "[^a-z0-9]+") -> Column:
    """64-bit SimHash: per-token xxhash64; each bit position accumulates
    +1/-1 by the token's bit; sign of the sum sets the output bit.

    Pure bit-arithmetic expressions (shiftright/bitwise-and) — codegen'd.
    """
    toks = F.filter(F.split(F.lower(text), token_re), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    out = F.lit(0).cast("long")
    for bit in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        out = out.bitwiseOR(
            F.when(votes > 0, F.lit(1 << bit if bit < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one of
    ``n_chunks`` 16-bit chunks (pigeonhole: any pair within
    ``n_chunks-1`` bit flips must collide on some chunk), verified by
    exact Hamming distance via bit_count(xor)."""
    sigs = docs.select(
        F.col(id_col), simhash64(F.col(text_col)).alias("__sim")
    )
    chunked = sigs.select(
        id_col,
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__sim"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ch"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("__c"),
    ).select(id_col, "__sim", "__c.chunk", "__c.ch")

    left = chunked.select(
        F.col(id_col).alias("left_id"), F.col("__sim").alias("__ls"), "chunk", "ch"
    )
    right = chunked.select(
        F.col(id_col).alias("right_id"), F.col("__sim").alias("__rs"), "chunk", "ch"
    )
    return (
        left.join(right, ["chunk", "ch"])
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("__ls").bitwiseXOR(F.col("__rs"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard join. Without ``block_col`` this is the
    exhaustive quadratic verification (bounded fixtures / final rescoring
    of candidates); with it, pairs are restricted to equal blocking keys
    — the scalable form."""
    grams = docs.select(
        F.col(id_col),
        word_ngrams(F.col(text_col), n).alias("__g"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    join_keys = [block_col] if block_col else []
    left = grams.select(
        F.col(id_col).alias("left_id"), F.col("__g").alias("__lg"), *join_keys
    )
    right = grams.select(
        F.col(id_col).alias("right_id"), F.col("__g").alias("__rg"), *join_keys
    )
    pairs = (
        left.join(right, join_keys) if join_keys else left.crossJoin(right)
    ).filter(F.col("left_id") < F.col("right_id"))
    return (
        pairs.withColumn("jaccard_sim", F.round(jaccard(F.col("__lg"), F.col("__rg")), 4))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("left_id", "right_id", "jaccard_sim")
    )
