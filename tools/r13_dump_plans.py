"""Dump .explain('formatted') for r13-touched queries.

localCheckpoint / collect-materialization are patched to identity so
the INTERNAL lazy plan is captured instead of an ExistingRDD stub
(r12 verdict nit #6).  Usage:

    python tools/r13_dump_plans.py <outdir> <suffix> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES_DEFAULT = [
    "l2_minhash_lsh_pairs",
    "l1_dedup_last_write_wins",
    "l5_dsir_weights",
    "l4_linear_retriever",
    "l2_ngram_jaccard_topk",
    # l5_pipeline_end_to_end / l2_dedup_resolution execute EAGERLY
    # inside their entries (collect / the CC convergence loop, which
    # without checkpoints re-executes its whole lineage per round) —
    # their changed region is minhash_lsh_pairs; the portable-family
    # operator plan below stands in for both:
    "minhash_portable_op",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or QUERIES_DEFAULT
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import DataFrame

    # identity-patch the materializers so the lazy graph survives to
    # the explain (plan SHAPE is what the dump documents; the eager
    # form executes the same graph stage by stage).  Spark 4 splits the
    # API: pyspark.sql.DataFrame is the abstract base and the classic
    # implementation subclass overrides localCheckpoint — patch BOTH.
    if not os.environ.get("R13_DUMP_NO_PATCH"):
        DataFrame.localCheckpoint = (  # type: ignore
            lambda self, eager=True: self)
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _CDF

            _CDF.localCheckpoint = (  # type: ignore
                lambda self, eager=True: self)
        except ImportError:
            pass

    from bigdatasearchpro_spark.registry import QUERIES
    from bigdatasearchpro_spark.session import get_spark

    spark = get_spark("r13_plans", cpus=8)

    def build(name):
        if name == "minhash_portable_op":
            from bigdatasearchpro_spark.operators import neardup
            from bigdatasearchpro_spark.registry_text import _neardup_corpus

            return neardup.minhash_lsh_pairs(
                _neardup_corpus(spark, SF_DIR), n_perms=32, bands=8,
                shingle_k=5, jaccard_threshold=0.5, hash_fn="portable",
            )
        return QUERIES[name](spark, SF_DIR)

    for name in names:
        try:
            df = build(name)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w",
                  encoding="utf-8") as f:
            f.write(plan)
        print(f"dumped {name}_{suffix}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
