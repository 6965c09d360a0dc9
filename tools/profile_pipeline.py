"""Stage-level wall-clock attribution for l5_pipeline_end_to_end.

Times each composed stage separately (cold per stage — each timing
includes its upstream lineage unless noted), so the output reads as a
cumulative profile. Run on a quiet host; REPS via
SPARK_GRAFT_PROFILE_REPS (default 1 — stages share lineage, min-of-N
would re-run the expensive trunk N times).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatasearchpro_spark.operators import neardup  # noqa: E402
from bigdatasearchpro_spark.registry_text import _neardup_corpus  # noqa: E402
from bigdatasearchpro_spark.session import get_spark  # noqa: E402
from bigdatasearchpro_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:40s} {dt:8.3f}s  -> {out}", flush=True)
    return out


def main() -> None:
    spark = get_spark("profile-pipeline")
    load_table(spark, SF_DIR, "nation").count()

    base = load_table(spark, SF_DIR, "documents")
    corpus0 = (
        _neardup_corpus(spark, SF_DIR)
        .select("doc_id", "text")
        .unionByName(
            base.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    n_words = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    )
    q = corpus0.filter(n_words >= 30)
    timed("corpus0+quality count", lambda: q.count())
    exmin = (
        q.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    ex = q.join(exmin, "doc_id", "left_semi").persist()
    timed("exact-dedup materialize (ex.count)", lambda: ex.count())

    sig = neardup.minhash_signatures(
        ex, n_perms=32, shingle_k=5, hash_fn="portable"
    ).persist()
    timed("minhash signatures (portable)", lambda: sig.count())

    # full pairs op (re-runs signatures internally on the persisted ex)
    t0 = time.time()
    pairs = neardup.minhash_lsh_pairs(
        ex, n_perms=32, bands=8, shingle_k=5, jaccard_threshold=0.5,
        hash_fn="portable",
    )
    print(f"{'minhash_lsh_pairs total':40s} {time.time()-t0:8.3f}s  -> {pairs.count()}",
          flush=True)

    kept = ex.join(
        pairs.select(F.col("right_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    lab = kept.withColumn(
        "split",
        F.when(bucket < 10, "val").when(bucket < 20, "test").otherwise("train"),
    )
    out = lab.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
    timed("final anti-join + split agg", lambda: out.count())
    sig.unpersist()
    ex.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
