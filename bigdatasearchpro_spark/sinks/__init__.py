"""Sinks (SURVEY.md §2.1 S3-S6): bulk idempotent writes + index DDL."""

from bigdatasearchpro_spark.sinks.bulk import (  # noqa: F401
    bulk_index_parquet,
    bulk_index_table,
    es_bulk_sink_conf,
)
from bigdatasearchpro_spark.sinks.ddl import (  # noqa: F401
    create_index,
    delete_index,
    list_indices,
)
