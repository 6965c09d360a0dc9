"""§2.11 UDF/UDAF/UDTF surface (SURVEY.md) — Arrow-batched pandas UDFs.

The reference has no user-extensible functions (its hard-coded per-row
Java loop, BulkProcessImpl.java:110-131, is the closest analogue); this
package provides the [EXT] extensibility surface: scalar pandas UDFs,
grouped-aggregate pandas UDFs, grouped-map ``applyInPandas`` and the
UDTF-ish ``mapInPandas`` — always Arrow-batched, never row-at-a-time
Python (the 10-100x rule from the design brief).
"""

from bigdatasearchpro_spark.functions.udfs import (  # noqa: F401
    batch_quality_filter,
    group_zscore,
    pandas_token_count,
    weighted_mean_udaf,
)
