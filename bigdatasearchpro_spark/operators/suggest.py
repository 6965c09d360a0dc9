"""ES suggesters — the ``suggest`` block of ``_search``.

The reference's search box posts raw user text to ES URI search
(``indexView.html:13-19``); the public ES 6.x API that backs
as-you-type UX on that surface is the ``suggest`` family:

- ``term`` suggester  — spell corrections: vocabulary terms within a
  bounded edit distance of the (misspelled) input, ranked the ES way
  (closer first, then more frequent, then lexicographic);
- ``completion`` suggester — prefix completions ranked by weight
  (document frequency here, the natural corpus-derived weight).

Both are VOCABULARY-scale operators, not corpus-scale: the only
aggregation is the distinct (term -> doc_freq) map, built with one
map-side-partial hash agg over exploded distinct per-doc terms (the
same shape as ``fuzzy_match``'s vocabulary-first expansion,
operators/search.py). The edit-distance / prefix scan then runs over
|vocabulary| rows — millions at 100 TB, never billions — and returns a
``size``-row TakeOrdered page. The indexed form at scale materializes
the vocabulary table once (sorted by term, so prefix runs range-skip)
and shares it across suggest calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators.search import TextCols, tokens_expr

__all__ = ["vocab_doc_freq", "term_suggester", "completion_suggester"]


def vocab_doc_freq(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
) -> DataFrame:
    """The (term, doc_freq) vocabulary: how many documents contain each
    analyzer term (a term counts once per document — ES doc_freq).
    One explode of per-row DISTINCT tokens + one hash agg; the shuffle
    carries (term) rows, never text."""
    from bigdatasearchpro_spark.sources.files import fan_out

    return (
        fan_out(docs)
        .select(F.explode(F.array_distinct(tokens_expr(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
    )


def term_suggester(
    docs: DataFrame,
    text: str,
    *,
    size: int = 5,
    max_edits: int = 2,
    min_doc_freq: int = 1,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
) -> DataFrame:
    """ES ``term`` suggester for a single input token: corpus
    vocabulary terms within ``max_edits`` Levenshtein distance of the
    input (the input itself excluded — a suggestion IS a correction),
    ranked distance asc, doc_freq desc, term asc (the ES sort: score
    first — score is edit-distance-dominated — then frequency), top
    ``size``.

    Output: ``(suggestion, distance, doc_freq)``."""
    t = (text or "").lower().strip()
    if not t:
        raise ValueError("term_suggester needs a non-empty input term")
    vocab = vocab_doc_freq(docs, id_col=id_col, text_col=text_col)
    d = F.levenshtein(F.col("term"), F.lit(t), max_edits)
    return (
        vocab.withColumn("distance", d)
        .filter(
            (F.col("distance") > 0)
            & (F.col("distance") <= max_edits)
            & (F.col("doc_freq") >= min_doc_freq)
        )
        .select(
            F.col("term").alias("suggestion"),
            F.col("distance").cast("long").alias("distance"),
            "doc_freq",
        )
        .orderBy(F.asc("distance"), F.desc("doc_freq"), F.asc("suggestion"))
        .limit(size)
    )


def completion_suggester(
    docs: DataFrame,
    prefix: str,
    *,
    size: int = 5,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
) -> DataFrame:
    """ES ``completion`` suggester shape: vocabulary terms starting
    with ``prefix`` (lowercased), ranked by weight — document frequency
    — desc, term asc, top ``size``. (ES serves this from an in-memory
    FST built at index time; the materialized form here is the sorted
    vocabulary table, which range-skips to the prefix run.)

    Output: ``(suggestion, doc_freq)``."""
    p = (prefix or "").lower().strip()
    if not p:
        raise ValueError("completion_suggester needs a non-empty prefix")
    vocab = vocab_doc_freq(docs, id_col=id_col, text_col=text_col)
    return (
        vocab.filter(F.col("term").startswith(p))
        .select(F.col("term").alias("suggestion"), "doc_freq")
        .orderBy(F.desc("doc_freq"), F.asc("suggestion"))
        .limit(size)
    )
