"""Mergeable-sketch operators (Apache DataSketches via Spark built-ins).

THE 100 TB aggregation architecture: build a small, MERGEABLE sketch per
segment/partition once (map-side), store or shuffle sketches instead of
data, and answer queries by merging sketches — never by rescanning rows.
Spark 4 exposes the DataSketches library as native aggregates
(``hll_sketch_agg``, ``kll_sketch_agg_double``, ``theta_sketch_agg``),
so every operator here is a codegen'd JVM aggregate with map-side
partials; the sketch binaries are a few KB regardless of input size.

The reference has no analogue (its "counting" is ``SELECT count(1)``
run by hand, reference README.md:803-806); these are [EXT] operators
for the training-data-pipeline scale path, complementing the exact
forms (a4_count_distinct, a6_exact_quantiles, l5_vocab_topk) the
driver oracle-checks at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kll_quantiles_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: list[float],
    *,
    k: int = 800,
) -> DataFrame:
    """Approximate per-group quantiles from a KLL sketch — one pass,
    fixed memory per group, mergeable partials (vs the exact
    ``percentile``'s per-group sort, a6_exact_quantiles). Normalized
    rank error is ~1.65/sqrt(k) (k=800 -> ~0.6%), tested in
    tests/test_sketches.py. Output: (group, q, value) scalar rows."""
    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("__sk")
    )
    cols = [
        F.kll_sketch_get_quantile_double(F.col("__sk"), F.lit(p)).alias(f"q{i}")
        for i, p in enumerate(probs)
    ]
    wide = sk.select(group_col, *cols)
    out = wide.select(
        group_col,
        F.posexplode(F.array(*[F.col(f"q{i}") for i in range(len(probs))])).alias(
            "qi", "value"
        ),
    )
    prob_map = F.array(*[F.lit(p) for p in probs])
    return out.select(
        group_col,
        prob_map[F.col("qi")].alias("q"),
        F.round("value", 4).alias("value"),
    )


def hll_segment_distinct(
    df: DataFrame,
    col: str,
    segment_col: str,
    *,
    lgk: int = 12,
) -> tuple[DataFrame, int]:
    """The segment-sketch pattern: one HLL sketch per segment (the
    artifact a 100 TB table would PERSIST next to each partition), plus
    the query-time answer — the global distinct estimate from merging
    the per-segment sketches with ``hll_union_agg``, touching only
    |segments| x ~KB of sketch bytes, zero row rescan.

    Returns (per-segment estimates DataFrame, merged global estimate).
    Standard HLL relative error ~1.04/sqrt(2^lgk) (lgk=12 -> ~1.6%)."""
    sketches = df.groupBy(segment_col).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("__sk")
    )
    per_segment = sketches.select(
        segment_col, F.hll_sketch_estimate("__sk").alias("n_distinct_est")
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"))).alias("est")
    ).first()["est"]
    return per_segment, int(merged)


def hll_overlap_estimate(
    df: DataFrame,
    col: str,
    cond_a,
    cond_b,
    *,
    lgk: int = 14,
) -> dict:
    """Distinct-overlap estimate by inclusion-exclusion over HLL
    sketches: |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B), with the union
    estimated by merging the two sketches (``hll_union``) — one corpus
    pass builds both sketches simultaneously (conditional aggregates),
    no join, no second scan. Returns {'a':, 'b':, 'union':, 'overlap':}.
    """
    row = (
        df.agg(
            F.hll_sketch_agg(F.when(cond_a, F.col(col)), F.lit(lgk)).alias("ska"),
            F.hll_sketch_agg(F.when(cond_b, F.col(col)), F.lit(lgk)).alias("skb"),
        )
        .select(
            F.hll_sketch_estimate("ska").alias("a"),
            F.hll_sketch_estimate("skb").alias("b"),
            F.hll_sketch_estimate(F.hll_union("ska", "skb")).alias("u"),
        )
        .first()
    )
    a, b, u = int(row["a"]), int(row["b"]), int(row["u"])
    return {"a": a, "b": b, "union": u, "overlap": max(a + b - u, 0)}
