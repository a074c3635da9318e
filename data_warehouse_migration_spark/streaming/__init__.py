"""Structured Streaming twins of the batch event operators.

The reference is pure batch (SURVEY.md §2.10); the streaming surface
exists because a 100 TB pipeline ingests continuously. Design rule:
every streaming op has a batch twin in ``operators/`` with identical
semantics, so correctness is oracle-checkable in batch and the
streaming path only adds watermarking/state handling.
"""

from data_warehouse_migration_spark.streaming.events import (
    read_event_stream,
    streaming_dedup,
    streaming_sessionize,
    streaming_tumbling_agg,
)

__all__ = [
    "read_event_stream",
    "streaming_tumbling_agg",
    "streaming_sessionize",
    "streaming_dedup",
]
