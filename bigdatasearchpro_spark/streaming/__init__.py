"""Structured Streaming ring (SURVEY.md §2.9)."""

from bigdatasearchpro_spark.streaming.pipelines import (  # noqa: F401
    events_stream,
    foreach_batch_bulk_sink,
    run_to_completion,
    session_agg,
    windowed_distinct_users,
    sliding_agg,
    stream_dedup,
    stream_static_enriched_agg,
    tumbling_agg,
)
