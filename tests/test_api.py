"""End-to-end facade test: the reference's six service operations as one
lifecycle — load a table into an index, list it, count it, query it,
drop it (reference ElasticController.java:31-72, BulkProcessImpl.java
main() flow :44-60)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasearchpro_spark import api
from bigdatasearchpro_spark.sources.files import load_table


def test_full_service_lifecycle(spark, sf_dir, docs):
    idx = "API_Lifecycle_Docs"  # mixed case: must normalize

    # bulk load (the /bulk/{index} path) — stringify + LWW by doc_id
    res = api.bulk_data_to_index(spark, docs, idx, id_col="doc_id")
    assert res["index"] == idx.lower()
    assert res["rows"] == docs.count()  # count reconciliation
    assert res["seconds"] >= 0

    try:
        # catalog (the /getAllIndex path)
        assert idx.lower() in api.get_all_index(spark)

        # count (declared-null in the reference; real here)
        assert api.get_index_data_count(spark, idx) == docs.count()

        # search (the ?q= path; docs were stringified -> text col intact)
        hits = api.query_data(spark, "spark join window", idx, k=5)
        rows = hits.collect()
        assert 0 < len(rows) <= 5
        assert rows == sorted(rows, key=lambda r: (-r["score"], int(r["doc_id"])))
    finally:
        api.delete_index(spark, idx)
    assert idx.lower() not in api.get_all_index(spark)
