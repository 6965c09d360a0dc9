"""Embedding similarity (SURVEY.md L4/J5): exactness of brute force,
ANN recall, join precision."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.operators import similarity
from bigdatasearchpro_spark.sources.files import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _qvec(emb, vid=0):
    return [float(x) for x in emb.filter(F.col("vec_id") == vid).first()["embedding"]]


def test_cosine_topk_self_is_top1(emb):
    q = _qvec(emb)
    top = similarity.cosine_topk(emb, q, 5).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["score"] - 1.0) < 1e-3
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_cosine_topk_matches_numpy(emb):
    q = np.asarray(_qvec(emb), dtype="float64")
    rows = emb.select("vec_id", "embedding").collect()
    mat = np.asarray([[float(x) for x in r["embedding"]] for r in rows], dtype="float64")
    ids = np.asarray([r["vec_id"] for r in rows])
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-300)
    order = np.lexsort((ids, -np.round(sims, 4)))
    expect = list(ids[order][:10])
    got = [r["vec_id"] for r in similarity.cosine_topk(emb, list(q), 10).collect()]
    assert got == expect


def test_ann_lsh_recall_vs_bruteforce(emb):
    q = _qvec(emb)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, 10).collect()}
    approx = {
        r["vec_id"]
        for r in similarity.ann_topk_lsh(
            emb, q, 10, n_planes=8, multiprobe_hamming=2
        ).collect()
    }
    assert len(exact & approx) / 10 >= 0.5  # multi-probe LSH recall floor


def test_similarity_join_precision(emb):
    out = similarity.cosine_similarity_join(emb, emb, 0.8, n_planes=4).collect()
    assert all(r["score"] >= 0.8 for r in out)
    assert all(r["left_id"] < r["right_id"] for r in out)


def test_ivf_indexed_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """Materialized IVF index returns the same rows as the inline IVF
    with identical centroids, and the probe scan is partition-pruned."""
    from bigdatasearchpro_spark.operators import similarity
    from bigdatasearchpro_spark.plans import partition_filters
    from bigdatasearchpro_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    path = str(tmp_path / "ivf")
    cents = similarity.build_ivf_index(emb, path, n_cells=4)

    indexed = similarity.ivf_topk_indexed(spark, path, qv, 10, nprobe=2)
    inline = similarity.ivf_topk(emb, qv, 10, n_cells=4, nprobe=2, centroids=cents)
    assert [tuple(r) for r in indexed.collect()] == [tuple(r) for r in inline.collect()]

    pf = " ".join(partition_filters(indexed))
    assert "cell" in pf  # probe filter reached the partition layer


def test_exact_similarity_join_is_lsh_ground_truth(spark, emb):
    """Exact blocked cosine join must (a) superset the LSH join's pairs
    within blocks and (b) return only pairs >= threshold."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.operators import similarity

    bumped = F.transform(
        F.col("embedding"), lambda x, i: F.when(i == 0, x + F.lit(0.02)).otherwise(x)
    )
    mutated = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        bumped.cast("array<float>").alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(mutated)
    exact = {
        (r.left_id, r.right_id)
        for r in similarity.cosine_similarity_join_exact(
            corpus, 0.9, block_col="label"
        ).collect()
    }
    planted = {(d, d + 100000) for d in
               [r.vec_id for r in emb.filter(F.col("vec_id") % 10 == 0).collect()]}
    assert planted <= exact  # every planted near-pair found
    labels = {r.vec_id: r.label for r in corpus.select("vec_id", "label").collect()}
    lsh = {
        (r.left_id, r.right_id)
        for r in similarity.cosine_similarity_join(corpus, corpus, 0.9, n_planes=4).collect()
    }
    same_label_lsh = {p for p in lsh if labels[p[0]] == labels[p[1]]}
    # within a block, LSH can only miss pairs, never invent them
    assert same_label_lsh <= exact


def test_quantize_int8_roundtrip_fidelity(spark, sf_dir):
    """Dequantized vectors must stay nearly collinear with the
    originals: cosine(orig, dequant) > 0.999 for every vector."""
    from bigdatasearchpro_spark.operators.similarity import dequantize, quantize_int8
    from bigdatasearchpro_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    deq = dequantize(quantize_int8(emb)).withColumnRenamed("embedding", "deq")
    j = emb.join(deq, "vec_id")
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    b = F.transform(F.col("deq"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    cos = dot / (na * nb)
    bad = j.filter(cos < 0.999).count()
    assert bad == 0
    # quantized values bounded and int
    q = quantize_int8(emb)
    assert q.filter(
        F.exists(F.col("q"), lambda x: (x > 127) | (x < -127))
    ).count() == 0
