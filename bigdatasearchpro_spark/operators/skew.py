"""Skew-mitigated joins (SURVEY.md §4 scale notes).

A shuffled equi-join hashes rows to reducers by key; one hot key (a
celebrity user, an empty-string default, a null-ish sentinel) lands its
entire row population on ONE reducer and the stage runs as long as that
task. Two remedies, composable:

- **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
  our session defaults): splits oversized partitions at runtime using
  map-output statistics. Zero code, but only kicks in for sort-merge
  joins on batch stats.
- **Explicit salting** (this module): deterministic pre-split of hot
  keys. Works for any join the optimizer picks, for streaming joins
  (no runtime stats), and when you *know* the hot keys up front.

Mechanics: the fact side gets a salt in ``[0, n_salts)``; the dim side
is exploded ``n_salts``× so every (key, salt) bucket has its match.
Join on (key, salt) → the hot key fans out over ``n_salts`` reducers.
Cost: dim side shuffles ``n_salts``× its size — use ``hot_keys`` to
restrict the explosion to the keys that need it (everything else joins
with salt 0 and pays nothing).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join ``left`` (large/skewed) with ``right`` (the replicated
    side) on ``on``, spreading each key over ``n_salts`` reducers.

    Deterministic: the left salt is ``xxhash64(whole row) mod n_salts``
    — stable under task retries (``rand()`` is not: a retried map task
    would re-roll salts and double/drop rows against a committed
    shuffle output).

    With ``hot_keys`` (a 1-column DataFrame of the skewed key values,
    e.g. from a pre-pass ``groupBy(key).count().filter(...)``), only
    hot rows are salted and only hot dim rows are replicated; the cold
    remainder joins unsalted. The hot-key set is broadcast (it is tiny
    by construction — skew means FEW keys are hot).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")

    def _salt_left(df: DataFrame) -> DataFrame:
        # xxhash64 skips null inputs, so rows differing only in which
        # column is null salt identically — harmless HERE: the salt is
        # load-balancing only, never a correctness key (contrast
        # dedup.py, where the fingerprint must be null-position-aware).
        return df.withColumn(
            SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        )

    def _explode_right(df: DataFrame) -> DataFrame:
        return df.withColumn(
            SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )

    if hot_keys is None:
        l_s = _salt_left(left)
        r_s = _explode_right(right)
        return l_s.join(r_s, keys + [SALT], how).drop(SALT)

    # split both sides on hot-key membership; salt only the hot slice
    hk = F.broadcast(hot_keys.toDF(*keys[:1]).dropDuplicates())
    l_hot = left.join(hk, keys[:1], "left_semi")
    l_cold = left.join(hk, keys[:1], "left_anti")
    r_hot = right.join(hk, keys[:1], "left_semi")
    r_cold = right.join(hk, keys[:1], "left_anti")
    hot = _salt_left(l_hot).join(_explode_right(r_hot), keys + [SALT], how).drop(SALT)
    cold = l_cold.join(r_cold, keys, how)
    return hot.unionByName(cold)


def top_keys(df: DataFrame, key: str, *, min_count: int) -> DataFrame:
    """Pre-pass hot-key detector: keys whose row count exceeds
    ``min_count`` (one cheap count-by-key aggregation — at 100 TB run
    it on a sample: ``df.sample(0.01)`` with ``min_count`` scaled)."""
    return (
        df.groupBy(key).agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select(key)
    )
