"""Stage-by-stage wall profile of the ngram_jaccard_topk kernel at sf0.1.

Times each phase of ngram_jaccard_pairs(prefilter='prefix', per_doc_cap=10)
with the noop sink (guide §1.4) on a warm session, reusing intermediates
so each phase's *incremental* cost is visible.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from bigdatasearchpro_spark.operators import neardup  # noqa: E402
from bigdatasearchpro_spark.registry_text import _neardup_corpus  # noqa: E402
from bigdatasearchpro_spark.session import get_spark  # noqa: E402
from bigdatasearchpro_spark.sources.files import fan_out  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df, label):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:40s} {dt:8.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def main():
    spark = get_spark("profile_ngram")
    docs = _neardup_corpus(spark, SF_DIR)
    noop(docs, "corpus materialize (persisted)")

    t_all0 = time.time()
    docs2 = fan_out(docs)
    id_col, text_col, n, threshold, block_col = "doc_id", "text", 3, 0.5, "source"
    toked = docs2.select(
        F.col(id_col), neardup.tokenize_words(F.col(text_col)).alias("__t"),
        F.col(block_col),
    )
    grams = toked.select(
        F.col(id_col), neardup.word_ngrams(F.col("__t"), n).alias("__g"),
        F.col(block_col),
    )
    noop(grams, "tokenize+ngrams")

    exploded = grams.select(
        F.col(id_col), F.size("__g").alias("__sz"),
        F.explode("__g").alias("__gram"), block_col,
    )
    noop(exploded, "exploded grams")

    freq = exploded.groupBy("__gram").agg(F.count("*").alias("__df"))
    noop(freq, "freq agg")
    freq = freq.withColumn(
        "__gid",
        F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("__df", "__gram")),
    )
    noop(freq, "freq + global gid window")

    ranked = exploded.join(freq, "__gram")
    noop(ranked, "ranked = exploded join freq")

    plen = (
        F.col("__sz") - F.ceil(F.col("__sz") * F.lit(0.5) - F.lit(1e-9)) + F.lit(1)
    )
    w = Window.partitionBy(id_col).orderBy("__df", "__gram")
    prefix = (
        ranked.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= plen)
        .select(id_col, "__gram", block_col)
    ).persist()
    noop(prefix, "prefix (persist fill)")

    idsets = ranked.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.col("__gid").cast("int"))).alias("__ids")
    ).persist()
    noop(idsets, "idsets (persist fill)")

    cand = (
        prefix.select(F.col(id_col).alias("left_id"), "__gram", block_col)
        .join(
            prefix.select(F.col(id_col).alias("right_id"), "__gram", block_col),
            ["__gram", block_col],
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    noop(cand, "candidate join + dedup")

    lg = idsets.select(F.col(id_col).alias("left_id"), F.col("__ids").alias("__lg"))
    rg = idsets.select(F.col(id_col).alias("right_id"), F.col("__ids").alias("__rg"))
    scored = (
        cand.join(lg, "left_id").join(rg, "right_id")
        .withColumn("__j", neardup.jaccard(F.col("__lg"), F.col("__rg")))
        .filter(F.col("__j") >= 0.5)
        .select("left_id", "right_id", F.round(F.col("__j"), 4).alias("jaccard_sim"))
    )
    noop(scored, "verify (join idsets + jaccard)")

    wg = Window.partitionBy("left_id").orderBy(F.desc("jaccard_sim"), F.asc("right_id"))
    capped = (
        scored.withColumn("__rk", F.row_number().over(wg))
        .filter(F.col("__rk") <= 10)
        .select("left_id", "right_id", "jaccard_sim")
    )
    noop(capped, "cap window")

    t0 = time.time()
    result = capped.localCheckpoint(eager=True)
    print(f"{'localCheckpoint':40s} {time.time()-t0:8.2f}s", flush=True)
    print(f"{'TOTAL (incremental, cached)':40s} {time.time()-t_all0:8.2f}s")
    print("rows:", result.count())

    # cold end-to-end for comparison (what the bench times)
    for cached in (prefix, idsets):
        cached.unpersist()
    from bigdatasearchpro_spark.registry import QUERIES
    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        df = QUERIES["l2_ngram_jaccard_topk"](spark, SF_DIR)
        nrows = df.count()
        print(f"cold end-to-end rep{rep}: {time.time()-t0:8.2f}s rows={nrows}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
