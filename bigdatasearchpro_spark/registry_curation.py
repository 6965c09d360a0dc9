"""Registry part 5: corpus-curation operators for LLM training data
(``operators/curation.py``) — duplicated-segment removal, benchmark
decontamination, sequence packing. Imported by ``registry_aggs`` so it
joins the same ``QUERIES``/``ORACLES`` maps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import curation
from bigdatasearchpro_spark.registry import register
from bigdatasearchpro_spark.sources.files import load_table

_T_CTE = """
t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
             '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
)
"""


@register(
    "l5_segment_dedup",
    f"""
    WITH {_T_CTE},
    seglist AS (
      SELECT doc_id,
             [array_to_string(toks[(i*20+1):(i*20+20)], ' ')
              FOR i IN generate_series(0,
                  CAST(ceil(len(toks) / 20.0) AS INT) - 1)] AS segs
      FROM t
    ),
    seg AS (
      SELECT doc_id, unnest(generate_series(0, len(segs) - 1)) AS pos,
             unnest(segs) AS seg
      FROM seglist
    ),
    freq AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY seg)
    SELECT s.doc_id,
           count(*) AS n_segments,
           count(*) FILTER (WHERE f.nd > 1) AS n_removed,
           coalesce(string_agg(s.seg, ' ' ORDER BY s.pos)
                    FILTER (WHERE f.nd <= 1), '') AS clean_text
    FROM seg s JOIN freq f USING (seg)
    GROUP BY s.doc_id
    """,
)
def l5_segment_dedup(spark, sf_dir):
    """L5 [training data]: duplicated-segment removal (RefinedWeb /
    CCNet line-dedup, on fixed 20-token segments): any segment present
    in more than one document (boilerplate) is cut from EVERY document;
    the unique remainder survives, in order. One explode + one
    frequency hash agg + one join against the (rare) duplicated-segment
    set + one group-back (operators/curation.py segment_dedup). The
    oracle recomputes segmentation, frequency, and reassembly, so the
    whole transform — clean_text included — is hash-verified."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.segment_dedup(docs, seg_tokens=20, max_doc_frequency=1)


@register(
    "l5_decontaminate",
    f"""
    WITH {_T_CTE},
    bt AS (
      SELECT array_to_string(toks[5:20], ' ') AS btext
      FROM t WHERE doc_id % 101 = 0 AND len(toks) >= 20
    ),
    b AS (
      SELECT DISTINCT unnest([array_to_string(
                 list_filter(string_split_regex(lower(btext),
                     '[^a-z0-9]+'), x -> x <> '')[i:(i+7)], ' ')
             FOR i IN generate_series(1, greatest(
                 len(list_filter(string_split_regex(lower(btext),
                     '[^a-z0-9]+'), x -> x <> '')) - 7, 0))]) AS sha
      FROM bt
    ),
    d AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:(i+7)], ' ')
                 FOR i IN generate_series(1,
                     greatest(len(toks) - 7, 0))])) AS sha
      FROM t
    )
    SELECT d.doc_id, count(*) AS matched_ngrams
    FROM d JOIN b USING (sha)
    GROUP BY d.doc_id
    """,
)
def l5_decontaminate(spark, sf_dir):
    """L5 [training data]: benchmark decontamination (the GPT-3
    appendix-C / Dolma rule): training documents sharing any 8-token
    shingle with a held-out benchmark set are flagged with their
    distinct-overlap count. The fixture benchmark is a 16-token
    excerpt of every 101st document (the realistic leak: benchmark
    items quote corpus spans), so the excerpts' source docs — and any
    near-copies — MUST be flagged. Shingle sides join on the shingle
    key; the benchmark side is benchmark-sized and broadcasts at scale
    (operators/curation.py decontaminate)."""
    docs = load_table(spark, sf_dir, "documents")
    from bigdatasearchpro_spark.operators.search import tokens_expr

    bench = (
        docs.filter((F.col("doc_id") % 101 == 0))
        .select(tokens_expr("text").alias("__toks"))
        .filter(F.size("__toks") >= 20)
        .select(F.array_join(F.slice("__toks", 5, 16), " ").alias("text"))
    )
    return curation.decontaminate(docs, bench, n=8)


@register(
    "l5_pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, lang AS shard,
             len(list_filter(string_split_regex(lower(text),
                 '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens + 1) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS e
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           (e - n_tokens - 1)::BIGINT AS start_offset,
           CAST(floor((e - n_tokens - 1) / 512.0) AS BIGINT) AS first_chunk,
           CAST(floor(greatest(e - 2, e - n_tokens - 1) / 512.0) AS BIGINT)
             AS last_chunk
    FROM c
    """,
)
def l5_pack_sequences(spark, sf_dir):
    """L5 [training data]: concat-and-chunk sequence packing — within
    each shard (lang), documents concatenate in id order with one EOS
    between them and the stream cuts into 512-token windows; each doc
    reports its start offset and first/last chunk. ONE window cumsum
    partitioned by the shard column: shards pack independently, the
    way a multi-node tensor writer lays out data — no global sort, no
    driver state (operators/curation.py pack_sequences)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(docs, max_len=512, shard_col="lang")
