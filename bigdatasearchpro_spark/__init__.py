"""bigdatasearchpro_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-implementation of the capabilities of
``darren-da/BigdataSearchPro`` (reference: a MySQL -> Elasticsearch bulk
ETL + delegated keyword-search app), widened into a complete analytics
engine per SURVEY.md:

- [REF] core ETL ring: scans, stringify projection, keyed idempotent
  bulk sink, index DDL, count reconciliation.
- [ES]  search ring: tokenize / keyword match / TF-IDF + BM25 scoring /
  top-k — the semantics the reference delegated to Elasticsearch 6.x.
- [EXT] relational completeness (joins/aggs/windows/set-ops/scalars),
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) and Structured Streaming.

Everything is expressed with the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join strategy and AQE; Python UDFs appear only where
built-ins genuinely cannot express the semantics (Arrow-batched).
"""

__version__ = "0.1.0"

from bigdatasearchpro_spark.session import get_spark  # noqa: F401
