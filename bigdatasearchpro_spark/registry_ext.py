"""Registry part 3: §2.11 UDF surface, L6 multimodal ring, L2
embedding-cosine near-dup, L4 IVF ANN. Imported by ``registry_text``
(which is imported by ``registry``, the owner of ``register``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark.functions import udfs
from bigdatasearchpro_spark.multimodal import assets as mm
from bigdatasearchpro_spark.operators import similarity
from bigdatasearchpro_spark.registry import register
from bigdatasearchpro_spark.sources.files import load_table

# ---------------------------------------------------------------------------
# §2.11 — UDF/UDAF/UDTF surface (Arrow-batched pandas; oracles verify the
# plumbing because the arithmetic is intentionally SQL-expressible)
# ---------------------------------------------------------------------------


@register(
    "u1_pandas_udf_token_count",
    """
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))::INTEGER
             AS n_tokens
    FROM documents
    """,
)
def u1_pandas_udf_token_count(spark, sf_dir):
    """§2.11: scalar pandas UDF (Arrow batch in/out) — whitespace token
    count; semantics identical to the SQL split so DuckDB checks the
    Arrow round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", udfs.pandas_token_count("text").alias("n_tokens"))


@register(
    "u2_udaf_weighted_mean",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_mean_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def u2_udaf_weighted_mean(spark, sf_dir):
    """§2.11: grouped-aggregate pandas UDF — quantity-weighted mean
    price per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(udfs.weighted_mean_udaf("l_extendedprice", "l_quantity").alias("w"))
        .select("l_returnflag", F.round("w", 4).alias("w_mean_price"))
    )


@register(
    "u3_apply_in_pandas_zscore",
    """
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
                 / stddev_pop(o_totalprice) OVER (PARTITION BY o_orderpriority), 4)
             AS zscore
    FROM orders
    """,
)
def u3_apply_in_pandas_zscore(spark, sf_dir):
    """§2.11: grouped-map applyInPandas — z-score within order priority
    (pandas ddof=0 == SQL stddev_pop)."""
    return udfs.group_zscore(load_table(spark, sf_dir, "orders"))


@register(
    "u4_map_in_pandas_quality_filter",
    """
    WITH n AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))::INTEGER
               AS n_words,
             lang
      FROM documents
    )
    SELECT doc_id, n_words, lang FROM n WHERE n_words >= 30
    """,
)
def u4_map_in_pandas_quality_filter(spark, sf_dir):
    """§2.11: UDTF-ish mapInPandas — streaming batch filter (0..n rows
    out per row in), the shape a model-based quality gate runs in."""
    return udfs.batch_quality_filter(load_table(spark, sf_dir, "documents"), min_words=30)


# ---------------------------------------------------------------------------
# §2.10 L6 — multimodal columns (payload plumbing real; codec stubbed)
# ---------------------------------------------------------------------------


@register(
    "l6_asset_metadata",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 8 + 1) * 64)::INTEGER END AS width,
           CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 6 + 1) * 64)::INTEGER END AS height,
           CASE WHEN doc_id % 3 = 1 THEN 16000::INTEGER END AS sample_rate,
           CASE WHEN doc_id % 3 = 2 THEN (doc_id % 120 + 30)::INTEGER END AS n_frames,
           'fake/' || CASE WHEN doc_id % 3 = 0 THEN 'image'
                           WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS fmt
    FROM documents
    """,
)
def l6_asset_metadata(spark, sf_dir):
    """L6: typed binary-asset table — binary payload + metadata struct.
    Oracle checks the schema/typing plumbing (payload length + flattened
    meta); payload bytes themselves are rows-only territory."""
    a = mm.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return a.select(
        "asset_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.fmt").alias("fmt"),
    )


@register("l6_decode_features")  # rows-only: decoder is a deterministic fake
def l6_decode_features(spark, sf_dir):
    """L6: mapInPandas decode -> L2-normalized feature vectors (codec
    stubbed; Arrow batch plumbing real — see multimodal/assets.py)."""
    a = mm.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return mm.extract_features(a)


@register(
    "l6_resize_plan",
    """
    WITH img AS (
      SELECT doc_id AS asset_id,
             ((doc_id % 8 + 1) * 64)::INTEGER AS src_w,
             ((doc_id % 6 + 1) * 64)::INTEGER AS src_h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT asset_id, src_w, src_h,
           floor(src_w * least(224.0 / src_w, 224.0 / src_h))::INTEGER AS out_w,
           floor(src_h * least(224.0 / src_w, 224.0 / src_h))::INTEGER AS out_h,
           round(least(224.0 / src_w, 224.0 / src_h), 4) AS scale
    FROM img
    """,
)
def l6_resize_plan(spark, sf_dir):
    """L6: aspect-preserving resize planning for image assets (fit in
    224x224); pixel resample lives behind the codec stub."""
    a = mm.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return mm.resize_plan(a, 224, 224)


@register(
    "l6_frame_sample",
    """
    SELECT doc_id AS asset_id,
           unnest(range(0, (doc_id % 120 + 30)::INTEGER, 10))::INTEGER AS frame_idx,
           (doc_id % 120 + 30)::INTEGER AS n_frames
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def l6_frame_sample(spark, sf_dir):
    """L6: video frame sampling — every-10th frame index per video asset
    (row-expanding sequence+explode, JVM-side)."""
    a = mm.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(a, every_n=10).withColumn(
        "frame_idx", F.col("frame_idx").cast("int")
    )


# ---------------------------------------------------------------------------
# §2.10 L2/L4 — embedding-cosine near-dup + IVF ANN
# ---------------------------------------------------------------------------


def _with_synthetic_near_vectors(emb):
    """Fixture vectors are random (no near-dups exist); append perturbed
    copies (vec_id+100000, +0.02 on one component) so the cosine
    near-dup join has true positives — mirrors the documents-table
    mutation strategy in registry_text."""
    bumped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == 0, x + F.lit(0.02)).otherwise(x),
    )
    mutated = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        bumped.cast("array<float>").alias("embedding"),
        "label",
    )
    return emb.unionByName(mutated)


@register("l2_embedding_cosine_pairs")  # rows-only: LSH bucketing
def l2_embedding_cosine_pairs(spark, sf_dir):
    """L2: embedding-cosine near-duplicate pairs — LSH-bucketed cosine
    self-join at 0.99; synthetic perturbed vectors guarantee recall
    targets (tests assert (v, v+100000) pairs are found)."""
    emb = _with_synthetic_near_vectors(load_table(spark, sf_dir, "embeddings"))
    return similarity.cosine_similarity_join(emb, emb, 0.99, n_planes=4)


@register("l4_ann_ivf_topk")  # rows-only: IVF cell assignment is engine-specific
def l4_ann_ivf_topk(spark, sf_dir):
    """L4 scale path #2: IVF-Flat approximate top-10 (k-means-lite
    coarse quantizer, nprobe=3 of 8 cells; recall vs brute force
    asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk(emb, qv, 10, n_cells=8, nprobe=3)
