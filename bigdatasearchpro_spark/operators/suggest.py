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

__all__ = [
    "vocab_doc_freq",
    "term_suggester",
    "completion_suggester",
    "corpus_bigram_counts",
    "phrase_suggester",
]


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


def corpus_bigram_counts(
    docs: DataFrame,
    *,
    text_col: TextCols = "text",
    analyzer: str = "standard",
) -> DataFrame:
    """Corpus (a, b, n2) adjacent-token bigram counts — the MLE bigram
    model the phrase suggester reranks with (same adjacency as
    textstats.bigram_lm_scores). One explode + one hash agg with
    map-side partials; the shuffle carries (a, b) pairs, never text."""
    toked = docs.select(tokens_expr(text_col, analyzer).alias("__t"))
    pairs = toked.select(
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - F.lit(2)),
                    lambda i: F.struct(
                        F.col("__t")[i].alias("a"), F.col("__t")[i + 1].alias("b")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("__g")
    ).select("__g.a", "__g.b")
    return pairs.groupBy("a", "b").agg(F.count("*").alias("n2"))


def phrase_suggester(
    docs: DataFrame,
    text: str,
    *,
    size: int = 5,
    max_edits: int = 2,
    per_token: int = 3,
    max_errors: int = 2,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
    analyzer: str = "standard",
    highlight: bool = False,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """ES ``phrase`` suggester — whole-phrase did-you-mean: per-token
    candidate corrections (term-suggester style, vocabulary terms
    within ``max_edits``, top ``per_token`` per position) combined
    into full candidate phrases (at least one and at most
    ``max_errors`` tokens changed), reranked by the corpus's own
    bigram language model.

    Scoring is deliberately INTEGER-EXACT (no float LM probabilities,
    so a SQL oracle replays it bit-for-bit): phrases rank by
    (``hits`` = how many adjacent bigrams exist in the corpus, desc;
    ``bigram_sum`` = total corpus count of those bigrams, desc; summed
    candidate doc_freq desc; summed edit distance asc; phrase asc).
    Under the corpus MLE bigram model this is monotone in observed-
    bigram evidence — the rerank ES's laplace-smoothed real-valued
    score performs, on an exact integer grid.

    Scale shape: candidate generation is VOCABULARY-scale (one
    bounded-levenshtein scan of the (term, doc_freq) table against
    |tokens| broadcast literals, per-position top-k window over the
    tiny filtered set); the bigram model is ONE corpus pass (hash agg,
    map-side partials); the phrase-combination product is
    driver-side and bounded by (per_token+1)^|tokens| with
    |tokens| <= 8 enforced. Nothing corpus-sized is collected.

    Output: ``(suggestion, hits, bigram_sum)``, top ``size``; with
    ``highlight=True`` (the ES phrase-suggester highlight option) a
    ``highlighted`` column wraps each CHANGED token in
    ``pre_tag``/``post_tag``."""
    from bigdatasearchpro_spark.operators.search import analyze_query

    toks = analyze_query(text, analyzer)
    if not toks:
        raise ValueError("phrase_suggester needs a non-empty input phrase")
    if len(toks) > 8:
        raise ValueError("phrase_suggester input capped at 8 tokens")
    spark = docs.sparkSession
    # vocab feeds TWO driver-side actions (the correction join's
    # collect and the original-token doc_freq lookup) — unpersisted,
    # each action re-ran the corpus tokenize+explode+agg.  Both
    # consumers collect inside this function, so the cache releases
    # right after (no checkpoint needed).
    vocab = vocab_doc_freq(docs, id_col=id_col, text_col=text_col).persist()
    pos_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "pos int, tok string"
    )
    dist = F.levenshtein(F.col("term"), F.col("tok"), max_edits)
    from pyspark.sql.window import Window

    corr = (
        vocab.join(F.broadcast(pos_df), dist >= 1)
        .select(
            "pos", "term", dist.cast("long").alias("dist"), "doc_freq"
        )
        # the filtered candidate set is tiny (a few hundred vocabulary
        # rows at most); the per-position window is over that, never
        # the vocabulary
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("pos").orderBy(
                    F.asc("dist"), F.desc("doc_freq"), F.asc("term")
                )
            ),
        )
        .filter(F.col("rn") <= per_token)
    )
    orig_freq = {
        r["term"]: r["doc_freq"]
        for r in vocab.filter(
            F.col("term").isin(list(set(toks)))
        ).collect()
    }
    options: list[list[tuple[str, int, int, int]]] = []
    for i, t in enumerate(toks):
        options.append([(t, 0, 0, int(orig_freq.get(t, 0)))])
    for r in sorted(
        corr.collect(), key=lambda r: (r["pos"], r["rn"])
    ):  # bounded: len(toks) * per_token rows
        options[r["pos"]].append(
            (r["term"], 1, int(r["dist"]), int(r["doc_freq"]))
        )
    vocab.unpersist()  # both vocabulary consumers have collected
    import itertools

    phrases = []
    for combo in itertools.product(*options):
        n_edits = sum(c[1] for c in combo)
        if not (1 <= n_edits <= max_errors):
            continue
        phrases.append(
            (
                " ".join(c[0] for c in combo),
                [c[0] for c in combo],
                sum(c[2] for c in combo),
                sum(c[3] for c in combo),
                " ".join(
                    (pre_tag + c[0] + post_tag) if c[1] else c[0]
                    for c in combo
                ),
            )
        )
    if not phrases:
        empty = "suggestion string, hits bigint, bigram_sum bigint"
        if highlight:
            empty += ", highlighted string"
        return spark.createDataFrame([], empty)
    phr = spark.createDataFrame(
        [(p, sd, sf, hl) for p, _, sd, sf, hl in phrases],
        "suggestion string, sum_dist long, sum_freq long, highlighted string",
    )
    bi_rows = [
        (p, ts[i], ts[i + 1])
        for p, ts, _, _, _ in phrases
        for i in range(len(ts) - 1)
    ]
    c2 = corpus_bigram_counts(docs, text_col=text_col, analyzer=analyzer)
    if bi_rows:
        cand_bi = spark.createDataFrame(
            bi_rows, "suggestion string, a string, b string"
        )
        scores = (
            c2.join(F.broadcast(cand_bi), ["a", "b"])
            .groupBy("suggestion")
            .agg(
                F.count("*").alias("hits"),
                F.sum("n2").alias("bigram_sum"),
            )
        )
        # both sides are candidate-phrase-sized (tens of rows);
        # without the hint the planner sort-merge-joined them
        scored = phr.join(F.broadcast(scores), "suggestion", "left")
    else:  # single-token phrase: no bigrams to rerank with
        scored = phr.withColumn("hits", F.lit(None)).withColumn(
            "bigram_sum", F.lit(None)
        )
    return (
        scored.select(
            "suggestion",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.coalesce(F.col("bigram_sum"), F.lit(0))
            .cast("long")
            .alias("bigram_sum"),
            "sum_freq",
            "sum_dist",
            "highlighted",
        )
        .orderBy(
            F.desc("hits"),
            F.desc("bigram_sum"),
            F.desc("sum_freq"),
            F.asc("sum_dist"),
            F.asc("suggestion"),
        )
        .limit(size)
        .select(
            "suggestion", "hits", "bigram_sum",
            *(["highlighted"] if highlight else []),
        )
    )


def completion_suggester_context(
    docs: DataFrame,
    prefix: str,
    contexts: "dict[str, str]",
    *,
    size: int = 5,
    id_col: str = "doc_id",
    text_col: TextCols = "text",
) -> DataFrame:
    """ES ``completion`` suggester with CONTEXTS (the category-filtered
    FST): suggestions restricted to documents matching every context
    ``{column: value}``, weights (doc frequency) computed WITHIN the
    context slice — how ES context suggesters keep, say, per-language
    keyboards suggesting only that language's vocabulary.

    Plan: the context predicate pushes into the scan BEFORE the
    vocabulary explode, so the term agg runs over the slice only.
    Output: ``(suggestion, doc_freq)``."""
    p = (prefix or "").lower().strip()
    if not p:
        raise ValueError("completion_suggester_context needs a prefix")
    if not contexts:
        raise ValueError("use completion_suggester without contexts")
    sliced = docs
    for col, val in sorted(contexts.items()):
        sliced = sliced.filter(F.col(col) == F.lit(val))
    vocab = vocab_doc_freq(sliced, id_col=id_col, text_col=text_col)
    return (
        vocab.filter(F.col("term").startswith(p))
        .select(F.col("term").alias("suggestion"), "doc_freq")
        .orderBy(F.desc("doc_freq"), F.asc("suggestion"))
        .limit(size)
    )
