"""Service facade: the reference's API surface, endpoint for endpoint.

The reference exposes six operations across its controller/service layer
(``ElasticController.java``, ``ElasticService.java``). This module maps
each to the engine, so a caller of the reference can switch 1:1:

| Reference operation | Site | Here |
|---|---|---|
| ``bulkData2Es(tableName)``   | ``ElasticController.java:46-54`` → ``ElasticServiceImpl.java:117-124`` | :func:`bulk_data_to_index` |
| ``createIndex(indexName)``   | ``ElasticController.java:31-39`` → ``ElasticServiceImpl.java:35-61``  | :func:`create_index` |
| ``deleteIndex(indexName)``   | ``ElasticController.java:56-63`` → ``ElasticServiceImpl.java:64-87``  | :func:`delete_index` |
| ``getAllIndex()``            | ``ElasticController.java:65-72`` → ``ElasticServiceImpl.java:90-114`` | :func:`get_all_index` |
| ``queryData(query, index)``  | declared, returns null — ``ElasticServiceImpl.java:127-131``; real path is the form posting to ES ``indexView.html:13-19`` | :func:`query_data` (implemented for real) |
| ``getIndexDataCount(index)`` | declared, returns null — ``ElasticServiceImpl.java:133-136`` | :func:`get_index_data_count` (implemented for real) |

The two null-returning stubs in the reference are fully functional here:
``query_data`` runs the BM25 top-k the reference delegated to
Elasticsearch's URI search, and ``get_index_data_count`` is the doc-count
reconciliation the reference did by hand in MySQL/Kibana
(``README.md:803-806``).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from bigdatasearchpro_spark.operators import search, transform
from bigdatasearchpro_spark.sinks import ddl
from bigdatasearchpro_spark.sinks.bulk import bulk_index_table


def bulk_data_to_index(
    spark: SparkSession,
    source: DataFrame,
    index_name: str,
    *,
    id_col: str | None = None,
    order_by: list[str] | None = None,
) -> dict:
    """The ``/bulk/{indexName}`` pipeline: scan → stringify →
    last-write-wins by id → batched write, with the wall-clock timing
    the reference logs (``ElasticServiceImpl.java:118-122``) and the
    loaded-count reconciliation it performed manually. Returns
    ``{"index": ..., "rows": ..., "seconds": ...}``."""
    t0 = time.time()
    doc = transform.stringify_all(source)
    name = index_name.lower()
    rows = bulk_index_table(doc, name, id_col=id_col, order_by=order_by)
    return {"index": name, "rows": rows, "seconds": round(time.time() - t0, 3)}


def create_index(spark: SparkSession, index_name: str) -> str:
    """``/createIndex/{indexName}`` — lowercased, idempotent."""
    return ddl.create_index(spark, index_name)


def delete_index(spark: SparkSession, index_name: str) -> None:
    """``/deleteIndex/{indexName}``."""
    ddl.delete_index(spark, index_name)


def get_all_index(spark: SparkSession) -> list[str]:
    """``/getAllIndex`` — all indices, system (dot-prefixed) filtered
    out, plus the reference's UI sentinel omitted (that was view-layer,
    ``HtmlController.java:27``)."""
    return [r["index_name"] for r in ddl.list_indices(spark).collect()]


def query_data(
    spark: SparkSession,
    query: str,
    index_name: str,
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The search path (``?q=`` semantics: OR match, BM25, top-k by
    score): declared-but-null in the reference, real here."""
    docs = spark.table(index_name.lower())
    return search.search_topk(docs, query, k, id_col=id_col, text_col=text_col)


def get_index_data_count(spark: SparkSession, index_name: str) -> int:
    """Doc count per index: declared-but-null in the reference."""
    return spark.table(index_name.lower()).count()
