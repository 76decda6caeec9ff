"""Structured Streaming twins of the batch event analytics.

Out-of-reference extension (SURVEY.md §2.10: the reference is
strictly batch); the streaming layer re-expresses the events
aggregations as incremental queries with watermarks, so the same
engine covers the continuous-ingest half of a production pipeline.
"""

from inside_vectordb_spark.streaming.events import (
    click_purchase_join_stream,
    distinct_content_stream,
    hourly_stream,
    read_events_stream,
    read_table_stream,
    run_to_memory,
    sessionized_stream,
)
from inside_vectordb_spark.streaming.stateful import running_user_totals

__all__ = [
    "click_purchase_join_stream",
    "distinct_content_stream",
    "hourly_stream",
    "read_events_stream",
    "read_table_stream",
    "run_to_memory",
    "running_user_totals",
    "sessionized_stream",
]
