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
